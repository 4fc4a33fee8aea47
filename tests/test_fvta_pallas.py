"""Fused FVTA Pallas kernel: parity vs the einsum reference, blockwise (online
softmax) correctness, gradient parity, masked edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvta_memexqa_tpu.ops.fvta_ref import fvta_attention, similarity_tensor
from fvta_memexqa_tpu.ops.fvta_pallas import fvta_attention_pallas


def make_case(n=2, s=8, t=8, j=5, d=6, seed=0, ragged=True):
    # s defaults to 8: below that fvta_attention_pallas dispatches to the XLA path
    # (see kernel dispatch comment); s>=8 exercises the actual Pallas kernel.
    rng = np.random.default_rng(seed)
    h = rng.normal(0, 1, (n, s, t, d)).astype(np.float32)
    q = rng.normal(0, 1, (n, j, d)).astype(np.float32)
    if ragged:
        t_len = rng.integers(1, t + 1, (n, s))
        j_len = rng.integers(1, j + 1, n)
    else:
        t_len = np.full((n, s), t)
        j_len = np.full(n, j)
    cm = np.arange(t)[None, None, :] < t_len[..., None]
    qm = np.arange(j)[None, :] < j_len[:, None]
    h = h * cm[..., None]
    q = q * qm[..., None]
    params = {
        "w_x": jnp.asarray(rng.normal(0, 1, d).astype(np.float32)),
        "w_y": jnp.asarray(rng.normal(0, 1, d).astype(np.float32)),
        "w_xy": jnp.asarray(rng.normal(0, 1, d).astype(np.float32)),
    }
    return jnp.asarray(h), jnp.asarray(cm), jnp.asarray(q), jnp.asarray(qm), params


def ref_out(h, cm, q, qm, params, kind="trilinear"):
    c = similarity_tensor(h, q, kind, params)
    return fvta_attention(h, cm, q, qm, c)


def assert_close(a, b, rtol=1e-5, atol=1e-5):
    for x, y, name in zip(a, b, ("context", "question", "time_attn", "seq_attn")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol,
                                   err_msg=name)


class TestFVTAPallasParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_trilinear_matches_ref(self, seed):
        h, cm, q, qm, p = make_case(seed=seed)
        assert_close(fvta_attention_pallas(h, cm, q, qm, "trilinear", p),
                     ref_out(h, cm, q, qm, p))

    def test_dot_matches_ref(self):
        h, cm, q, qm, p = make_case(seed=3)
        assert_close(fvta_attention_pallas(h, cm, q, qm, "dot", {}),
                     ref_out(h, cm, q, qm, {}, kind="dot"))

    def test_bilinear_falls_back(self):
        h, cm, q, qm, _ = make_case(seed=4, d=6)
        rng = np.random.default_rng(9)
        p = {"w_bilinear": jnp.asarray(rng.normal(0, 1, (6, 6)).astype(np.float32))}
        assert_close(fvta_attention_pallas(h, cm, q, qm, "bilinear", p),
                     ref_out(h, cm, q, qm, p, kind="bilinear"))

    @pytest.mark.parametrize("tblock", [2, 4, 8])
    def test_blockwise_online_softmax(self, tblock):
        """Different time-block sizes must all reproduce the single-pass result."""
        h, cm, q, qm, p = make_case(t=8, seed=5)
        assert_close(fvta_attention_pallas(h, cm, q, qm, "trilinear", p, tblock=tblock),
                     ref_out(h, cm, q, qm, p))

    def test_dead_sequence_and_block(self):
        """A fully-masked sequence and a fully-masked time block stay harmless."""
        h, cm, q, qm, p = make_case(t=8, seed=6)
        cm = np.asarray(cm).copy()
        cm[:, 0, :] = False       # dead sequence
        cm[:, 1, 4:] = False      # dead second block (tblock=4)
        cm = jnp.asarray(cm)
        out = fvta_attention_pallas(h, cm, q, qm, "trilinear", p, tblock=4)
        ref = ref_out(h, cm, q, qm, p)
        assert np.isfinite(np.asarray(out.context)).all()
        assert_close(out, ref)

    def test_all_masked_question_matches_ref(self):
        """A row whose question is ENTIRELY masked (batch padding) must still
        reproduce the reference's finite-uniform attention maps — seq validity
        comes from the context mask, not from the absorbed score max."""
        h, cm, q, qm, p = make_case(t=8, seed=9)
        qm = np.asarray(qm).copy()
        qm[0, :] = False
        qm = jnp.asarray(qm)
        out = fvta_attention_pallas(h, cm, q, qm, "trilinear", p)
        ref = ref_out(h, cm, q, qm, p)
        assert np.asarray(ref.time_attn)[0].sum() > 0  # ref maps are uniform
        assert_close(out, ref)

    def test_larger_shapes(self):
        h, cm, q, qm, p = make_case(n=4, s=24, t=24, j=30, d=200, seed=7)
        assert_close(fvta_attention_pallas(h, cm, q, qm, "trilinear", p),
                     ref_out(h, cm, q, qm, p), rtol=1e-4, atol=1e-4)


class TestFVTAStatsPallas:
    """Stats mode (the CP per-shard engine): parity vs focal_local_stats,
    blockwise invariance, tiny-S padding path, gradient parity."""

    @staticmethod
    def _stats_ref(h, cm, q, qm, kind="trilinear", p=None):
        from fvta_memexqa_tpu.ops.fvta_ref import focal_local_stats

        return focal_local_stats(h, cm, q, qm, kind, p or {})

    def assert_stats_close(self, a, b, rtol=1e-5, atol=1e-5):
        for x, y, name in zip(a, b, ("m", "den", "v", "eq", "e")):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=rtol, atol=atol, err_msg=name)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_xla_stats(self, seed):
        from fvta_memexqa_tpu.ops.fvta_pallas import fvta_stats_pallas

        h, cm, q, qm, p = make_case(seed=seed)
        self.assert_stats_close(fvta_stats_pallas(h, cm, q, qm, "trilinear", p),
                                self._stats_ref(h, cm, q, qm, "trilinear", p))

    @pytest.mark.parametrize("tblock", [2, 4, 8])
    def test_blockwise_invariant(self, tblock):
        from fvta_memexqa_tpu.ops.fvta_pallas import fvta_stats_pallas

        h, cm, q, qm, p = make_case(t=8, seed=2)
        self.assert_stats_close(
            fvta_stats_pallas(h, cm, q, qm, "trilinear", p, tblock=tblock),
            self._stats_ref(h, cm, q, qm, "trilinear", p))

    def test_thin_s_padded_not_fallback(self):
        """TGIF-style thin S (< 8): stats mode pads to the sublane minimum and
        slices back — results identical to the XLA stats."""
        from fvta_memexqa_tpu.ops.fvta_pallas import fvta_stats_pallas

        h, cm, q, qm, p = make_case(s=2, t=16, seed=3)
        self.assert_stats_close(fvta_stats_pallas(h, cm, q, qm, "trilinear", p),
                                self._stats_ref(h, cm, q, qm, "trilinear", p))

    def test_dead_sequence(self):
        from fvta_memexqa_tpu.ops.fvta_pallas import fvta_stats_pallas

        h, cm, q, qm, p = make_case(t=8, seed=4)
        cm = np.asarray(cm).copy()
        cm[:, 0, :] = False
        cm = jnp.asarray(cm)
        self.assert_stats_close(fvta_stats_pallas(h, cm, q, qm, "trilinear", p),
                                self._stats_ref(h, cm, q, qm, "trilinear", p))

    def test_grads_match_xla_stats(self):
        from fvta_memexqa_tpu.ops.fvta_pallas import fvta_stats_pallas

        h, cm, q, qm, p = make_case(seed=5)

        def loss(fn):
            def f(h_, q_, p_):
                m, den, v, eq, e = fn(h_, cm, q_, qm, "trilinear", p_)
                # den/v/eq feed real losses; e/m via a smooth mix of valid terms
                return ((v**2).sum() + (jnp.log(den)).sum() + (eq * 0.1).sum()
                        + jnp.where(cm, e, 0.0).sum() * 1e-3)
            return f

        g_p = jax.grad(loss(fvta_stats_pallas), argnums=(0, 1, 2))(h, q, p)
        g_r = jax.grad(loss(self._stats_ref), argnums=(0, 1, 2))(h, q, p)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestFVTAStreamingDispatch:
    """Long-T streaming form: when the block count exceeds _FINALIZE_MAX_BLOCKS
    the public entry streams per-block stats to HBM (fvta_stats_pallas) and
    finalizes in XLA via the shared focal_finalize — O(Tb) VMEM instead of the
    finalizing kernel's O(S*T) e_buf. Must stay parity with the reference."""

    def test_dispatch_threshold(self):
        from fvta_memexqa_tpu.ops import fvta_pallas as fp

        assert 64 // 2 > fp._FINALIZE_MAX_BLOCKS  # the cases below stream

    def test_streaming_matches_ref(self):
        h, cm, q, qm, p = make_case(t=64, seed=10)
        assert_close(fvta_attention_pallas(h, cm, q, qm, "trilinear", p, tblock=2),
                     ref_out(h, cm, q, qm, p), rtol=1e-4, atol=1e-5)

    def test_streaming_dead_sequence(self):
        h, cm, q, qm, p = make_case(t=64, seed=11)
        cm = np.asarray(cm).copy()
        cm[:, 0, :] = False
        cm = jnp.asarray(cm)
        out = fvta_attention_pallas(h, cm, q, qm, "trilinear", p, tblock=2)
        assert np.isfinite(np.asarray(out.context)).all()
        assert_close(out, ref_out(h, cm, q, qm, p), rtol=1e-4, atol=1e-5)

    def test_streaming_grads_match_ref(self):
        h, cm, q, qm, p = make_case(t=64, seed=12)

        def loss(fn):
            def f(h_, q_, p_):
                o = fn(h_, q_, p_)
                return (o.context**2).sum() + (o.question**2).sum()
            return f

        g_p = jax.grad(loss(lambda h_, q_, p_: fvta_attention_pallas(
            h_, cm, q_, qm, "trilinear", p_, tblock=2)), argnums=(0, 1, 2))(h, q, p)
        g_r = jax.grad(loss(lambda h_, q_, p_: ref_out(h_, cm, q_, qm, p_)),
                       argnums=(0, 1, 2))(h, q, p)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_focal_finalize_matches_single_pass(self):
        """focal_finalize(focal_local_stats(...)) — the stats→output math shared
        by CP and the streaming path — equals the one-shot fvta_attention."""
        from fvta_memexqa_tpu.ops.fvta_ref import focal_finalize, focal_local_stats

        h, cm, q, qm, p = make_case(t=16, seed=13)
        m, den, v, eq, e = focal_local_stats(h, cm, q, qm, "trilinear", p)
        out = focal_finalize(m, den, v, eq, e, q, qm, cm.any(-1))
        assert_close(out, ref_out(h, cm, q, qm, p))

    def test_thin_s_long_t_streams(self, monkeypatch):
        """Thin S at LONG T with a LONG question must take the streaming path
        through the PUBLIC entry (stats mode S-pads internally) — there the
        XLA fallback's [N, S, T, J] correlation dominates the padding cost
        ((8-s)*D < s*J) and is the capacity limit the streaming form removes.
        Forward and grads match the ref."""
        from fvta_memexqa_tpu.ops import fvta_pallas as fp

        called = []
        orig = fp.fvta_stats_pallas
        monkeypatch.setattr(fp, "fvta_stats_pallas",
                            lambda *a, **k: called.append(1) or orig(*a, **k))
        h, cm, q, qm, p = make_case(s=2, t=64, j=24, seed=30)  # (8-2)*6 < 2*24
        assert_close(fvta_attention_pallas(h, cm, q, qm, "trilinear", p, tblock=2),
                     ref_out(h, cm, q, qm, p), rtol=1e-4, atol=1e-5)
        assert called, "long-question thin-S long-T case must stream"

        def loss(fn):
            def f(h_, q_, p_):
                o = fn(h_, q_, p_)
                return (o.context**2).sum() + (o.question**2).sum()
            return f

        g_p = jax.grad(loss(lambda h_, q_, p_: fvta_attention_pallas(
            h_, cm, q_, qm, "trilinear", p_, tblock=2)), argnums=(0, 1, 2))(h, q, p)
        g_r = jax.grad(loss(lambda h_, q_, p_: ref_out(h_, cm, q_, qm, p_)),
                       argnums=(0, 1, 2))(h, q, p)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_thin_s_small_j_long_t_stays_xla(self, monkeypatch):
        """Thin S with a SMALL question must NOT stream even at long T: the
        kernel's S-padding ((8-s)*D bytes per time step, and dh/dh_direct
        too under grad) dwarfs the XLA path's s*J correlation. Measured on
        chip (round-4 training-capacity probe): at S=1/J=30/D=200 the XLA
        path trains to T=2,097,152 while the padded streaming path OOM'd at
        its first probe point T=16,384 — the old block-count-only dispatch
        sent exactly that shape to the kernel."""
        from fvta_memexqa_tpu.ops import fvta_pallas as fp

        called = []
        orig = fp.fvta_stats_pallas
        monkeypatch.setattr(fp, "fvta_stats_pallas",
                            lambda *a, **k: called.append(1) or orig(*a, **k))
        h, cm, q, qm, p = make_case(s=2, t=64, seed=31)  # j=5: (8-2)*6 >= 2*5
        out = fvta_attention_pallas(h, cm, q, qm, "trilinear", p, tblock=2)
        assert not called, "small-J thin-S must take the XLA path"
        assert_close(out, ref_out(h, cm, q, qm, p), rtol=1e-4, atol=1e-5)

    def test_pick_tblock_vmem_budget(self):
        """Long-question shapes must shrink the time block: 8*512*512 f32
        correlation temporaries exceed the measured VMEM budget at Tb=512."""
        from fvta_memexqa_tpu.ops.fvta_pallas import _pick_tblock

        assert _pick_tblock(4096, s=48, j=30) == 512   # MemexQA: unchanged
        assert _pick_tblock(4096, s=8, j=512) <= 256   # long-J: capped
        assert 4096 % _pick_tblock(4096, s=8, j=512) == 0

    def test_pick_tblock_lane_valid(self):
        """Mosaic's lane rule: a blocked last dim must be a multiple of 128
        or the whole axis — the budget cap may never override it. Regression
        for the round-4 training-capacity probe crash: the streaming
        backward's 1MB budget at J=512 capped the block at 64 and the
        pallas_call lowering ValueError'd on chip."""
        from fvta_memexqa_tpu.ops.fvta_pallas import _pick_tblock

        for t in (24, 128, 192, 512, 8192, 65536):
            for j in (30, 512):
                for s in (8, 48):
                    for budget in (1 << 20, 4 << 20):
                        tb = _pick_tblock(t, s=s, j=j, c_budget_bytes=budget)
                        assert t % tb == 0 or tb == t, (t, j, s, budget, tb)
                        assert tb % 128 == 0 or tb == t, (t, j, s, budget, tb)
        # the probe's exact crash shape: J=512, s_pad=8, backward budget
        assert _pick_tblock(8192, s=8, j=512, c_budget_bytes=1 << 20) == 128


class TestFVTAStreamingBackward:
    """Long-T streaming BACKWARD (the fused stats backward kernels): when the
    block count exceeds _FINALIZE_MAX_BLOCKS the stats custom_vjp routes dC
    blockwise through two Pallas passes (global tie-count, then gradient)
    instead of rematerializing the full [N, S, T, J] correlation in XLA —
    training at long T gets the same O(Tb)-VMEM property as inference.
    Gradients must match the XLA reference exactly-ish (f32), INCLUDING the
    even tie-splitting of reduce_max in the degenerate all-masked cases."""

    @staticmethod
    def _grads(fn, h, cm, q, qm, p):
        def loss(h_, q_, p_):
            m, den, v, eq, e = fn(h_, cm, q_, qm, "trilinear", p_)
            return ((v**2).sum() + jnp.log(den).sum() + (eq * 0.1).sum()
                    + (m * 0.03).sum() + jnp.where(cm, e, 0.0).sum() * 1e-3)
        return jax.grad(loss, argnums=(0, 1, 2))(h, q, p)

    def _check(self, h, cm, q, qm, p, tblock=2):
        from fvta_memexqa_tpu.ops import fvta_pallas as fp
        from fvta_memexqa_tpu.ops.fvta_pallas import fvta_stats_pallas
        from fvta_memexqa_tpu.ops.fvta_ref import focal_local_stats

        assert h.shape[2] // tblock > fp._FINALIZE_MAX_BLOCKS  # streaming bwd
        g_p = self._grads(
            lambda h_, c_, q_, qm_, k, p_: fvta_stats_pallas(
                h_, c_, q_, qm_, k, p_, tblock=tblock),
            h, cm, q, qm, p)
        g_r = self._grads(focal_local_stats, h, cm, q, qm, p)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("seed", [0, 20])
    def test_grads_match_ref(self, seed):
        self._check(*make_case(t=64, seed=seed))

    def test_thin_s_padded(self):
        """S < 8 pads inside the backward too; pad rows carry no gradient."""
        self._check(*make_case(s=2, t=64, seed=20))

    def test_dead_sequence(self):
        h, cm, q, qm, p = make_case(t=64, seed=21)
        cm = np.asarray(cm).copy()
        cm[:, 0, :] = False
        self._check(h, jnp.asarray(cm), q, qm, p)

    def test_all_masked_example_global_ties(self):
        """Fully-masked example: eq = -1e30 with ties across EVERY (s, t) —
        the cross-block tie count must split geq evenly like jnp.max's VJP."""
        h, cm, q, qm, p = make_case(t=64, seed=22)
        cm = np.asarray(cm).copy()
        cm[0, :, :] = False
        self._check(h, jnp.asarray(cm), q, qm, p)

    def test_all_masked_example_thin_s(self):
        """Degenerate ties AND S-padding: the pad rows' cm = -1 sentinel keeps
        them out of the tie set (their masked scores land at -2e30)."""
        h, cm, q, qm, p = make_case(s=2, t=64, seed=23)
        cm = np.asarray(cm).copy()
        cm[0, :, :] = False
        self._check(h, jnp.asarray(cm), q, qm, p)

    def test_all_masked_question(self):
        """All question words masked: de splits evenly over J in both impls."""
        h, cm, q, qm, p = make_case(t=64, seed=24)
        qm = np.asarray(qm).copy()
        qm[0, :] = False
        self._check(h, cm, q, jnp.asarray(qm), p)


class TestFVTAPallasGrad:
    def test_grads_match_ref(self):
        h, cm, q, qm, p = make_case(seed=8)

        def loss_p(h_, q_, p_):
            o = fvta_attention_pallas(h_, cm, q_, qm, "trilinear", p_)
            return (o.context**2).sum() + (o.question**2).sum()

        def loss_r(h_, q_, p_):
            o = ref_out(h_, cm, q_, qm, p_)
            return (o.context**2).sum() + (o.question**2).sum()

        g_p = jax.grad(loss_p, argnums=(0, 1, 2))(h, q, p)
        g_r = jax.grad(loss_r, argnums=(0, 1, 2))(h, q, p)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
