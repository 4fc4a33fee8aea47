"""Parity of the v2 fused bi-LSTM (in-kernel x_proj + fused backward) vs the
TF1-exact lax.scan reference — forward, final-only, and full gradients.

Runs in interpret mode on CPU here; tests/test_slow_regression.py and the bench
exercise the compiled path on the real chip.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvta_memexqa_tpu.ops.lstm_fused import bilstm_fused, bilstm_fused_final
from fvta_memexqa_tpu.ops.lstm_ref import bilstm_ref, init_lstm_params


def make_case(n=12, t=7, d=10, h=5, seed=0, full_lengths=False):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, t, d)).astype(np.float32)
    if full_lengths:
        lens = np.full(n, t)
    else:
        lens = rng.integers(0, t + 1, n)
        lens[0], lens[1] = t, 0            # cover full and empty rows
    mask = np.arange(t)[None, :] < lens[:, None]
    p_fw = init_lstm_params(jax.random.key(seed), d, h)
    p_bw = init_lstm_params(jax.random.key(seed + 100), d, h)
    return jnp.asarray(x), jnp.asarray(mask), p_fw, p_bw


class TestFusedForward:
    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("shape", [(12, 7, 10, 5), (9, 3, 4, 3), (4, 11, 33, 7)])
    def test_matches_ref(self, seed, shape):
        n, t, d, h = shape
        x, mask, p_fw, p_bw = make_case(n, t, d, h, seed)
        out_r, fin_r = bilstm_ref(p_fw, p_bw, x, mask)
        out_f, fin_f = bilstm_fused(p_fw, p_bw, x, mask)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fin_f), np.asarray(fin_r),
                                   rtol=1e-5, atol=1e-6)

    def test_final_only_matches_ref(self):
        x, mask, p_fw, p_bw = make_case(seed=2)
        _, fin_r = bilstm_ref(p_fw, p_bw, x, mask)
        fin_f = bilstm_fused_final(p_fw, p_bw, x, mask)
        np.testing.assert_allclose(np.asarray(fin_f), np.asarray(fin_r),
                                   rtol=1e-5, atol=1e-6)

    def test_outputs_zero_past_length(self):
        x, mask, p_fw, p_bw = make_case(seed=3)
        out_f, _ = bilstm_fused(p_fw, p_bw, x, mask)
        assert not np.asarray(out_f)[~np.asarray(mask)].any()


class TestFusedBackward:
    def _grads(self, fn, p_fw, p_bw, x, mask, wo, wf):
        def loss(pf, pb, xx):
            res = fn(pf, pb, xx, mask)
            if isinstance(res, tuple):
                out, fin = res
                return (out * wo).sum() + (fin * wf).sum()
            return (res * wf).sum()

        return jax.grad(loss, argnums=(0, 1, 2))(p_fw, p_bw, x)

    @pytest.mark.parametrize("seed", [0, 4])
    def test_full_grads_match_ref(self, seed):
        x, mask, p_fw, p_bw = make_case(seed=seed)
        rng = np.random.default_rng(seed + 7)
        h2 = 2 * p_fw.wh.shape[0]
        wo = jnp.asarray(rng.normal(0, 1, x.shape[:2] + (h2,)).astype(np.float32))
        wf = jnp.asarray(rng.normal(0, 1, (x.shape[0], h2)).astype(np.float32))
        g_ref = self._grads(bilstm_ref, p_fw, p_bw, x, mask, wo, wf)
        g_fus = self._grads(bilstm_fused, p_fw, p_bw, x, mask, wo, wf)
        for gr, gf, name in zip(g_ref[:2], g_fus[:2], ("fw", "bw")):
            for field in ("wx", "wh", "b"):
                np.testing.assert_allclose(
                    np.asarray(getattr(gf, field)), np.asarray(getattr(gr, field)),
                    rtol=1e-4, atol=1e-5, err_msg=f"{name}.{field}")
        np.testing.assert_allclose(np.asarray(g_fus[2]), np.asarray(g_ref[2]),
                                   rtol=1e-4, atol=1e-5, err_msg="dx")

    def test_final_only_grads_match_ref(self):
        x, mask, p_fw, p_bw = make_case(seed=5)
        rng = np.random.default_rng(9)
        h2 = 2 * p_fw.wh.shape[0]
        wf = jnp.asarray(rng.normal(0, 1, (x.shape[0], h2)).astype(np.float32))

        def loss_ref(pf, pb, xx):
            return (bilstm_ref(pf, pb, xx, mask)[1] * wf).sum()

        def loss_fus(pf, pb, xx):
            return (bilstm_fused_final(pf, pb, xx, mask) * wf).sum()

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(p_fw, p_bw, x)
        g_fus = jax.grad(loss_fus, argnums=(0, 1, 2))(p_fw, p_bw, x)
        for gr, gf in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       rtol=1e-4, atol=1e-5)

    def test_grads_under_jit_and_vmap_free_shapes(self):
        """The step function jits cleanly with the vjp inside."""
        x, mask, p_fw, p_bw = make_case(n=16, t=5, d=8, h=4, seed=6)

        @jax.jit
        def loss(pf, pb, xx):
            out, fin = bilstm_fused(pf, pb, xx, mask)
            return (out ** 2).sum() + (fin ** 2).sum()

        g = jax.grad(loss)(p_fw, p_bw, x)
        assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))


class TestGrouped:
    def test_grouped_matches_individual(self):
        """K encoders (mixed T and D) in one launch == K separate references."""
        from fvta_memexqa_tpu.ops.lstm_fused import bilstm_fused_grouped

        rng = np.random.default_rng(3)
        n, h = 10, 4
        specs = [(6, 9), (3, 9), (6, 5)]      # (T_k, D_k): mixed time AND feature
        pairs, xs, masks = [], [], []
        for k, (t, d) in enumerate(specs):
            xs.append(jnp.asarray(rng.normal(0, 1, (n, t, d)).astype(np.float32)))
            lens = rng.integers(0, t + 1, n)
            lens[0] = t
            masks.append(jnp.asarray(np.arange(t)[None] < lens[:, None]))
            pairs.append((init_lstm_params(jax.random.key(k), d, h),
                          init_lstm_params(jax.random.key(k + 50), d, h)))

        res = bilstm_fused_grouped(tuple(pairs), tuple(xs), tuple(masks))
        for k in range(len(specs)):
            out_r, fin_r = bilstm_ref(pairs[k][0], pairs[k][1], xs[k], masks[k])
            np.testing.assert_allclose(np.asarray(res[k][0]), np.asarray(out_r),
                                       rtol=1e-5, atol=1e-6, err_msg=f"out k={k}")
            np.testing.assert_allclose(np.asarray(res[k][1]), np.asarray(fin_r),
                                       rtol=1e-5, atol=1e-6, err_msg=f"fin k={k}")

    def test_grouped_grads_match_individual(self):
        from fvta_memexqa_tpu.ops.lstm_fused import bilstm_fused_grouped

        rng = np.random.default_rng(8)
        n, h = 6, 3
        specs = [(5, 7), (4, 3)]
        pairs, xs, masks, wos, wfs = [], [], [], [], []
        for k, (t, d) in enumerate(specs):
            xs.append(jnp.asarray(rng.normal(0, 1, (n, t, d)).astype(np.float32)))
            lens = rng.integers(1, t + 1, n)
            masks.append(jnp.asarray(np.arange(t)[None] < lens[:, None]))
            pairs.append((init_lstm_params(jax.random.key(k + 7), d, h),
                          init_lstm_params(jax.random.key(k + 70), d, h)))
            wos.append(jnp.asarray(rng.normal(0, 1, (n, t, 2 * h)).astype(np.float32)))
            wfs.append(jnp.asarray(rng.normal(0, 1, (n, 2 * h)).astype(np.float32)))

        def loss_grouped(ps, xx):
            res = bilstm_fused_grouped(ps, xx, tuple(masks))
            return sum(((o * wo).sum() + (f * wf).sum())
                       for (o, f), wo, wf in zip(res, wos, wfs))

        def loss_ref(ps, xx):
            tot = 0.0
            for (pf, pb), x, mk, wo, wf in zip(ps, xx, masks, wos, wfs):
                o, f = bilstm_ref(pf, pb, x, mk)
                tot = tot + (o * wo).sum() + (f * wf).sum()
            return tot

        gp_g, gx_g = jax.grad(loss_grouped, argnums=(0, 1))(tuple(pairs), tuple(xs))
        gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(tuple(pairs), tuple(xs))
        for a, b in zip(jax.tree.leaves((gp_g, gx_g)), jax.tree.leaves((gp_r, gx_r))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_model_pallas_path_matches_ref_path(packed_synth, small_config):
    """Full flagship forward: use_pallas=True (grouped fused encoders, fin-only
    summaries) must match the XLA reference path on identical params."""
    from fvta_memexqa_tpu.data import Dataset, SharedTables, assemble
    from fvta_memexqa_tpu.data.device_prepro import device_put_batch
    from fvta_memexqa_tpu.models import FVTAModel

    shared = SharedTables.from_packed(packed_synth.shared)
    # batch of 2: this runs the fused kernels in INTERPRET mode on CPU (the
    # suite's single most expensive test); component-level parity runs at
    # larger shapes in the kernel tests above, this checks the composition.
    batch = device_put_batch(next(iter(Dataset(packed_synth, "train").get_batches(2))))
    mi = assemble(shared, batch)
    mc = small_config.model
    cfg_ref = small_config.replace(
        model=mc.__class__(**{**mc.__dict__, "use_pallas": False}))
    cfg_pal = small_config.replace(
        model=mc.__class__(**{**mc.__dict__, "use_pallas": True}))
    m_ref, m_pal = FVTAModel(cfg=cfg_ref), FVTAModel(cfg=cfg_pal)
    params = jax.jit(lambda k: m_ref.init(k, shared, mi, train=False))(
        jax.random.key(0))
    o_ref = jax.jit(lambda p: m_ref.apply(p, shared, mi, train=False))(params)
    o_pal = jax.jit(lambda p: m_pal.apply(p, shared, mi, train=False))(params)
    np.testing.assert_allclose(np.asarray(o_pal.logits), np.asarray(o_ref.logits),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not os.environ.get("FVTA_RUN_SLOW"),
                    reason="interpret-mode full-model backward ~70s on 1 core; "
                           "kernel-level grad parity runs unconditionally "
                           "(FVTA_RUN_SLOW=1 to include)")
def test_model_pallas_grad_composition_matches_ref(packed_synth, small_config):
    """Full-model GRADIENT composition through the fused path (the forward
    composition test above always runs; this is its backward half)."""
    from fvta_memexqa_tpu.data import Dataset, SharedTables, assemble
    from fvta_memexqa_tpu.data.device_prepro import device_put_batch
    from fvta_memexqa_tpu.models import FVTAModel

    shared = SharedTables.from_packed(packed_synth.shared)
    batch = device_put_batch(next(iter(Dataset(packed_synth, "train").get_batches(2))))
    mi = assemble(shared, batch)
    mc = small_config.model
    cfg_ref = small_config.replace(
        model=mc.__class__(**{**mc.__dict__, "use_pallas": False}))
    cfg_pal = small_config.replace(
        model=mc.__class__(**{**mc.__dict__, "use_pallas": True}))
    m_ref, m_pal = FVTAModel(cfg=cfg_ref), FVTAModel(cfg=cfg_pal)
    params = m_ref.init(jax.random.key(0), shared, mi, train=False)

    def loss(model, p):
        out = model.apply(p, shared, mi, train=False)
        lab = jax.nn.one_hot(mi.label, 4)
        return -jnp.mean(jnp.sum(lab * jax.nn.log_softmax(out.logits), -1))

    g_ref = jax.grad(lambda p: loss(m_ref, p))(params)
    g_pal = jax.grad(lambda p: loss(m_pal, p))(params)
    for (kr, vr), (kp, vp) in zip(jax.tree_util.tree_flatten_with_path(g_ref)[0],
                                  jax.tree_util.tree_flatten_with_path(g_pal)[0]):
        assert kr == kp
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vr),
                                   rtol=5e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(kr))


class TestTilingBudget:
    """The round-5 scoped-VMEM sizing model (`_tiling`): every production
    shape must price within the model budget with zero phantom rows at the
    measured row counts, and widths the model CANNOT fit must refuse loudly
    (the pre-guard code proceeded on a negative budget and reintroduced the
    compile-time OOM the model exists to prevent)."""

    def _price(self, bb, nb, widths, hp, const_bytes):
        from fvta_memexqa_tpu.ops.lstm_fused import _round_up

        wsum = sum(_round_up(w, 128) for w in widths)
        return 8 * wsum * bb + 8 * hp * nb * bb + 2 * const_bytes

    def test_production_shapes_fit_and_pad_zero(self):
        """MemexQA driver shapes (d=200 text fwd, d=2537-proj photo-title
        encoders at hp=128): budget respected, phantom rows zero."""
        from fvta_memexqa_tpu.ops.lstm_fused import _SCOPED_BUDGET, _tiling

        hp, g4 = 128, 512
        for n, d, nwin in [
            (2688, 200, 5),   # round-5 OOM shape: bwd, emit_out+cell
            (3072, 200, 5), (3360, 200, 3), (256, 200, 3), (64, 200, 3),
        ]:
            widths = [d, 1] + [hp] * (nwin - 2)
            const_bytes = 4 * (d * g4 + hp * g4 + 8 * g4)
            bb, nb, nseg, n_pad = _tiling(n, widths, hp, const_bytes)
            assert n_pad >= n and nseg * nb * bb == n_pad
            assert n_pad - n < 8, (n, n_pad)  # sub-tile padding only
            assert self._price(bb, nb, widths, hp, const_bytes) \
                <= _SCOPED_BUDGET

    def test_overwide_constants_refuse(self):
        """hidden ~512 with a wide input: doubled weight windows alone blow
        the budget -> ValueError naming the XLA fallback, not a silent
        unfittable launch."""
        import pytest

        from fvta_memexqa_tpu.ops.lstm_fused import _tiling

        hp, g4, d = 512, 2048, 512
        const_bytes = 4 * (d * g4 + hp * g4 + 8 * g4 + g4 * hp)
        with pytest.raises(ValueError, match="use_pallas=False"):
            _tiling(2048, [d, 1, hp, hp, hp], hp, const_bytes)
