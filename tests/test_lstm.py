"""bi-LSTM reference: TF1 BasicLSTMCell/dynamic_rnn numerics (SURVEY.md section 4
items 1-2) checked against an independent numpy step-loop oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from fvta_memexqa_tpu.ops.lstm_ref import (
    LSTMParams,
    bilstm_ref,
    init_lstm_params,
    lstm_scan_ref,
)


def np_lstm_oracle(wx, wh, b, x, mask, forget_bias=1.0):
    """Straight-line numpy TF1 BasicLSTMCell + dynamic_rnn sequence_length semantics."""
    n, t, _ = x.shape
    h_dim = wh.shape[0]
    h = np.zeros((n, h_dim), np.float32)
    c = np.zeros((n, h_dim), np.float32)
    outs = np.zeros((n, t, h_dim), np.float32)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    for ti in range(t):
        gates = x[:, ti] @ wx + h @ wh + b
        i, j, f, o = np.split(gates, 4, axis=-1)
        nc = c * sig(f + forget_bias) + sig(i) * np.tanh(j)
        nh = np.tanh(nc) * sig(o)
        m = mask[:, ti : ti + 1].astype(np.float32)
        h = m * nh + (1 - m) * h
        c = m * nc + (1 - m) * c
        outs[:, ti] = (m * nh)[:, :]
    return outs, h


def make_case(n=3, t=7, d=5, h=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, t, d)).astype(np.float32)
    lengths = rng.integers(1, t + 1, n)
    lengths[0] = t  # one full-length row
    mask = np.arange(t)[None, :] < lengths[:, None]
    params = init_lstm_params(jax.random.key(seed), d, h)
    return x, mask, params


class TestLSTMScan:
    def test_matches_numpy_oracle(self):
        x, mask, p = make_case()
        out, fin = lstm_scan_ref(p, jnp.asarray(x), jnp.asarray(mask))
        o_out, o_fin = np_lstm_oracle(
            np.asarray(p.wx), np.asarray(p.wh), np.asarray(p.b), x, mask
        )
        np.testing.assert_allclose(np.asarray(out), o_out, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fin), o_fin, rtol=1e-5, atol=1e-5)

    def test_forget_bias_matters(self):
        x, mask, p = make_case()
        out1, _ = lstm_scan_ref(p, jnp.asarray(x), jnp.asarray(mask), forget_bias=1.0)
        out0, _ = lstm_scan_ref(p, jnp.asarray(x), jnp.asarray(mask), forget_bias=0.0)
        assert not np.allclose(np.asarray(out1), np.asarray(out0))

    def test_padded_outputs_zero_state_frozen(self):
        x, mask, p = make_case(seed=3)
        out, fin = lstm_scan_ref(p, jnp.asarray(x), jnp.asarray(mask))
        out = np.asarray(out)
        assert np.abs(out[~mask]).max() == 0.0
        # final state equals the state at the last valid step
        lengths = mask.sum(1)
        for i, ln in enumerate(lengths):
            if ln < mask.shape[1]:
                # run truncated input: same final state
                out2, fin2 = lstm_scan_ref(
                    p, jnp.asarray(x[i : i + 1, :ln]), jnp.asarray(mask[i : i + 1, :ln])
                )
                np.testing.assert_allclose(
                    np.asarray(fin)[i], np.asarray(fin2)[0], rtol=1e-5, atol=1e-6
                )

    def test_all_padded_row(self):
        x, mask, p = make_case(seed=4)
        mask = mask.copy()
        mask[1] = False
        out, fin = lstm_scan_ref(p, jnp.asarray(x), jnp.asarray(mask))
        assert np.abs(np.asarray(out)[1]).max() == 0.0
        assert np.abs(np.asarray(fin)[1]).max() == 0.0


class TestBiLSTM:
    def test_backward_equals_reversed_forward(self):
        """bw outputs on input == fw outputs on the length-aware reversed input."""
        x, mask, p_fw = make_case(n=4, t=6, seed=5)
        p_bw = init_lstm_params(jax.random.key(99), 5, 4)
        out, fin = bilstm_ref(p_fw, p_bw, jnp.asarray(x), jnp.asarray(mask))
        out = np.asarray(out)
        h = 4
        lengths = mask.sum(1)
        for i, ln in enumerate(lengths):
            x_rev = x[i : i + 1].copy()
            x_rev[0, :ln] = x[i, ln - 1 :: -1]
            o_rev, f_rev = lstm_scan_ref(p_bw, jnp.asarray(x_rev), jnp.asarray(mask[i : i + 1]))
            o_rev = np.asarray(o_rev)[0]
            # bw half of out, un-reversed
            for t_i in range(ln):
                np.testing.assert_allclose(
                    out[i, t_i, h:], o_rev[ln - 1 - t_i], rtol=1e-5, atol=1e-6
                )
            np.testing.assert_allclose(
                np.asarray(fin)[i, h:], np.asarray(f_rev)[0], rtol=1e-5, atol=1e-6
            )

    def test_output_shapes(self):
        x, mask, p_fw = make_case(n=2, t=5, seed=6)
        p_bw = init_lstm_params(jax.random.key(1), 5, 4)
        out, fin = bilstm_ref(p_fw, p_bw, jnp.asarray(x), jnp.asarray(mask))
        assert out.shape == (2, 5, 8) and fin.shape == (2, 8)

    def test_grads_flow_and_finite(self):
        x, mask, p_fw = make_case(seed=7)
        p_bw = init_lstm_params(jax.random.key(2), 5, 4)

        def loss(ps):
            out, fin = bilstm_ref(ps[0], ps[1], jnp.asarray(x), jnp.asarray(mask))
            return (out**2).sum() + (fin**2).sum()

        g = jax.grad(loss)((p_fw, p_bw))
        flat = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(v)).all() for v in flat)
        assert any(np.abs(np.asarray(v)).max() > 0 for v in flat)


def test_init_glorot_scale():
    p = init_lstm_params(jax.random.key(0), 100, 100)
    assert isinstance(p, LSTMParams)
    lim = np.sqrt(6.0 / (200 + 400))
    for w in (p.wx, p.wh):
        w = np.asarray(w)
        assert np.abs(w).max() <= lim + 1e-6
    assert np.asarray(p.b).sum() == 0.0


def test_holey_mask_equals_compacted_prefix():
    """Semantic justification for pack-time compaction (ADVICE round 1): running
    the reference scan on a mask with interior holes is equivalent to compacting
    the valid steps to the front — same final state, same per-valid-step outputs
    (dynamic_rnn carries state through masked steps without updating). Pack-time
    compaction therefore changes nothing semantically while guaranteeing the
    prefix-contiguous masks the Pallas kernel requires."""
    rng = np.random.default_rng(11)
    n, t, d, h = 3, 7, 5, 4
    x = rng.normal(0, 1, (n, t, d)).astype(np.float32)
    holey = np.array([
        [1, 0, 1, 1, 0, 1, 0],
        [1, 1, 0, 0, 1, 0, 0],
        [0, 1, 0, 1, 0, 0, 1],
    ], dtype=bool)
    p = init_lstm_params(jax.random.key(3), d, h)

    # compact valid steps to the front, preserving order
    x_c = np.zeros_like(x)
    pref = np.zeros_like(holey)
    for i in range(n):
        idx = np.where(holey[i])[0]
        x_c[i, : len(idx)] = x[i, idx]
        pref[i, : len(idx)] = True

    out_h, fin_h = lstm_scan_ref(p, jnp.asarray(x), jnp.asarray(holey))
    out_c, fin_c = lstm_scan_ref(p, jnp.asarray(x_c), jnp.asarray(pref))
    np.testing.assert_allclose(np.asarray(fin_h), np.asarray(fin_c), rtol=1e-6)
    for i in range(n):
        idx = np.where(holey[i])[0]
        np.testing.assert_allclose(
            np.asarray(out_h)[i, idx], np.asarray(out_c)[i, : len(idx)], rtol=1e-6)
