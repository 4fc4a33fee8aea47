"""Pallas fused LSTM scan: parity against the lax.scan reference (SURVEY.md
section 4 item 1) in interpreter mode on CPU; TPU-compiled parity is covered by the
bench/verify flow on the real chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvta_memexqa_tpu.ops.lstm_ref import bilstm_ref, init_lstm_params, lstm_scan_ref
from fvta_memexqa_tpu.ops.lstm_pallas import bilstm_pallas, lstm_scan_pallas


def make_case(n=5, t=7, d=6, h=4, seed=0, ragged=True):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, t, d)).astype(np.float32)
    if ragged:
        lengths = rng.integers(1, t + 1, n)
        lengths[0] = t
    else:
        lengths = np.full(n, t)
    mask = np.arange(t)[None, :] < lengths[:, None]
    p_fw = init_lstm_params(jax.random.key(seed), d, h)
    p_bw = init_lstm_params(jax.random.key(seed + 100), d, h)
    return jnp.asarray(x), jnp.asarray(mask), p_fw, p_bw


class TestPallasScanParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_unidirectional_matches_ref(self, seed):
        x, mask, p, _ = make_case(seed=seed)
        out_r, fin_r = lstm_scan_ref(p, x, mask)
        out_p, fin_p = lstm_scan_pallas(p, x, mask.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fin_p), np.asarray(fin_r),
                                   rtol=1e-5, atol=1e-5)

    def test_bidirectional_matches_ref(self):
        x, mask, p_fw, p_bw = make_case(n=6, t=9, seed=3)
        out_r, fin_r = bilstm_ref(p_fw, p_bw, x, mask)
        out_p, fin_p = bilstm_pallas(p_fw, p_bw, x, mask)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fin_p), np.asarray(fin_r),
                                   rtol=1e-5, atol=1e-5)

    def test_batch_not_multiple_of_block(self):
        """Pads batch internally; results for real rows must be unaffected."""
        x, mask, p, _ = make_case(n=5, seed=4)
        out_p, fin_p = lstm_scan_pallas(p, x, mask.astype(jnp.float32), 1.0, 4)
        out_r, fin_r = lstm_scan_ref(p, x, mask)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fin_p), np.asarray(fin_r),
                                   rtol=1e-5, atol=1e-5)

    def test_all_pad_row(self):
        x, mask, p, _ = make_case(n=4, seed=5)
        mask = np.asarray(mask).copy()
        mask[2] = False
        out_p, fin_p = lstm_scan_pallas(p, x, jnp.asarray(mask, jnp.float32))
        assert np.all(np.asarray(out_p)[2] == 0)
        assert np.all(np.asarray(fin_p)[2] == 0)

    def test_empty_and_single_step_seqs(self):
        x, _, p_fw, p_bw = make_case(n=3, t=4, seed=6, ragged=False)
        mask = jnp.asarray([[True, False, False, False],
                            [True, True, True, True],
                            [False, False, False, False]])
        out_r, fin_r = bilstm_ref(p_fw, p_bw, x, mask)
        out_p, fin_p = bilstm_pallas(p_fw, p_bw, x, mask)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fin_p), np.asarray(fin_r),
                                   rtol=1e-5, atol=1e-5)


class TestPallasScanGrad:
    def test_grads_match_ref(self):
        """custom_vjp routes bwd through the ref scan — grads must match the ref's."""
        x, mask, p_fw, p_bw = make_case(n=4, t=6, seed=7)

        def loss_ref(ps, xx):
            out, fin = bilstm_ref(ps[0], ps[1], xx, mask)
            return (out**2).sum() + (fin**2).sum()

        def loss_pal(ps, xx):
            out, fin = bilstm_pallas(ps[0], ps[1], xx, mask)
            return (out**2).sum() + (fin**2).sum()

        g_r = jax.grad(loss_ref, argnums=(0, 1))((p_fw, p_bw), x)
        g_p = jax.grad(loss_pal, argnums=(0, 1))((p_fw, p_bw), x)
        for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_p)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_model_trains_with_pallas_flag(self, packed_synth, small_config):
        """End-to-end: a few train steps with use_pallas=True stay finite and move."""
        from fvta_memexqa_tpu.data import Dataset, SharedTables
        from fvta_memexqa_tpu.data.device_prepro import device_put_batch
        from fvta_memexqa_tpu.models import FVTAModel
        from fvta_memexqa_tpu.train import init_state, make_train_step

        mc = small_config.model
        cfg = small_config.replace(
            model=mc.__class__(**{**mc.__dict__, "use_pallas": True, "attention": "fvta"})
        )
        shared = SharedTables.from_packed(packed_synth.shared)
        ds = Dataset(packed_synth, "train")
        batch = device_put_batch(next(iter(ds.get_batches(4))))
        model = FVTAModel(cfg=cfg)
        state = init_state(cfg, model, shared, batch)
        step = make_train_step(cfg, model)
        l0 = None
        for _ in range(2):  # interpret-mode steps are expensive; 2 suffice to
            state, m = step(state, shared, batch)  # show finite + moving loss
            assert np.isfinite(float(m["loss"]))
            l0 = float(m["loss"]) if l0 is None else l0
        assert float(m["loss"]) < l0
