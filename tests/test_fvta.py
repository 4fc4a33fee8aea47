"""FVTA attention core: similarity kernels vs naive loops, focal softmax invariants,
masked/ragged edge cases (SURVEY.md section 4 item 1), ablation variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvta_memexqa_tpu.ops.fvta_ref import (
    ATTENTION_VARIANTS,
    flat_attention,
    fvta_attention,
    no_attention,
    similarity_tensor,
)
from fvta_memexqa_tpu.ops.masking import VERY_NEGATIVE, exp_mask, masked_softmax


def make_case(n=2, s=3, t=4, j=5, d=6, seed=0, ragged=True):
    rng = np.random.default_rng(seed)
    h = rng.normal(0, 1, (n, s, t, d)).astype(np.float32)
    q = rng.normal(0, 1, (n, j, d)).astype(np.float32)
    if ragged:
        t_len = rng.integers(1, t + 1, (n, s))
        j_len = rng.integers(1, j + 1, n)
    else:
        t_len = np.full((n, s), t)
        j_len = np.full(n, j)
    ctx_mask = np.arange(t)[None, None, :] < t_len[..., None]
    q_mask = np.arange(j)[None, :] < j_len[:, None]
    h = h * ctx_mask[..., None]
    q = q * q_mask[..., None]
    return map(jnp.asarray, (h, ctx_mask, q, q_mask))


def trilinear_params(d, seed=1):
    rng = np.random.default_rng(seed)
    return {
        "w_x": jnp.asarray(rng.normal(0, 1, d).astype(np.float32)),
        "w_y": jnp.asarray(rng.normal(0, 1, d).astype(np.float32)),
        "w_xy": jnp.asarray(rng.normal(0, 1, d).astype(np.float32)),
    }


class TestMasking:
    def test_exp_mask_value(self):
        out = exp_mask(jnp.zeros((2, 2)), jnp.asarray([[True, False], [False, True]]))
        np.testing.assert_allclose(
            np.asarray(out), [[0.0, VERY_NEGATIVE], [VERY_NEGATIVE, 0.0]]
        )

    def test_masked_softmax_excludes_pad(self):
        logits = jnp.asarray([[1.0, 2.0, 100.0]])
        mask = jnp.asarray([[True, True, False]])
        w = np.asarray(masked_softmax(logits, mask))
        assert w[0, 2] == 0.0
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)

    def test_all_masked_is_finite(self):
        """Reference exp_mask semantics: fully padded rows give uniform, not NaN."""
        w = np.asarray(masked_softmax(jnp.zeros((1, 4)), jnp.zeros((1, 4), bool)))
        assert np.isfinite(w).all()
        np.testing.assert_allclose(w, 0.25)


class TestSimilarity:
    @pytest.mark.parametrize("kind", ["dot", "bilinear", "trilinear"])
    def test_matches_naive_loop(self, kind):
        h, cm, q, qm = make_case(d=6)
        rng = np.random.default_rng(2)
        params = trilinear_params(6)
        params["w_bilinear"] = jnp.asarray(rng.normal(0, 1, (6, 6)).astype(np.float32))
        c = np.asarray(similarity_tensor(h, q, kind, params))
        hn, qn = np.asarray(h), np.asarray(q)
        for n in range(hn.shape[0]):
            for s in range(hn.shape[1]):
                for t in range(hn.shape[2]):
                    for j in range(qn.shape[1]):
                        x, y = hn[n, s, t], qn[n, j]
                        if kind == "dot":
                            want = x @ y
                        elif kind == "bilinear":
                            want = x @ np.asarray(params["w_bilinear"]) @ y
                        else:
                            want = (
                                x @ np.asarray(params["w_x"])
                                + y @ np.asarray(params["w_y"])
                                + (x * y) @ np.asarray(params["w_xy"])
                            )
                        np.testing.assert_allclose(c[n, s, t, j], want, rtol=1e-4, atol=1e-4)

    def test_unknown_kind_raises(self):
        h, cm, q, qm = make_case()
        with pytest.raises(ValueError):
            similarity_tensor(h, q, "cosine", {})


class TestFVTA:
    def _run(self, variant, seed=0, ragged=True):
        h, cm, q, qm = make_case(seed=seed, ragged=ragged)
        c = similarity_tensor(h, q, "trilinear", trilinear_params(6))
        return ATTENTION_VARIANTS[variant](h, cm, q, qm, c), (h, cm, q, qm)

    def test_weights_normalized_and_masked(self):
        out, (h, cm, q, qm) = self._run("fvta")
        a_t = np.asarray(out.time_attn)
        b_s = np.asarray(out.seq_attn)
        cmn = np.asarray(cm)
        seq_valid = cmn.any(-1)
        # time weights: sum to 1 on valid sequences, zero at padded t
        assert np.all(a_t[~cmn] == 0.0)
        sums = a_t.sum(-1)
        np.testing.assert_allclose(sums[seq_valid], 1.0, rtol=1e-5)
        # seq weights: sum to 1 over valid seqs
        np.testing.assert_allclose(b_s.sum(-1), 1.0, rtol=1e-5)
        assert np.all(b_s[~seq_valid] == 0.0)

    def test_context_in_convex_hull(self):
        """Attended context must be a convex combo of (valid) context states."""
        out, (h, cm, q, qm) = self._run("fvta")
        hn = np.asarray(h)
        lo = hn.min(axis=(1, 2)) - 1e-5
        hi = hn.max(axis=(1, 2)) + 1e-5
        ctxn = np.asarray(out.context)
        assert (ctxn >= lo).all() and (ctxn <= hi).all()

    def test_focuses_on_matching_sequence(self):
        """Plant a context state identical to a question word → its seq wins."""
        n, s, t, j, d = 1, 3, 4, 2, 8
        rng = np.random.default_rng(0)
        h = rng.normal(0, 0.1, (n, s, t, d)).astype(np.float32)
        q = rng.normal(0, 0.1, (n, j, d)).astype(np.float32)
        spike = rng.normal(0, 1, d).astype(np.float32) * 3
        h[0, 1, 2] = spike
        q[0, 0] = spike
        cm = jnp.ones((n, s, t), bool)
        qm = jnp.ones((n, j), bool)
        c = similarity_tensor(jnp.asarray(h), jnp.asarray(q), "dot", {})
        out = fvta_attention(jnp.asarray(h), cm, jnp.asarray(q), qm, c)
        assert int(np.asarray(out.seq_attn)[0].argmax()) == 1
        assert int(np.asarray(out.time_attn)[0, 1].argmax()) == 2

    def test_flat_differs_from_fvta(self):
        out_f, _ = self._run("fvta", seed=3)
        out_fl, _ = self._run("flat", seed=3)
        assert not np.allclose(np.asarray(out_f.context), np.asarray(out_fl.context))

    def test_none_is_mean_pool(self):
        out, (h, cm, q, qm) = self._run("none", seed=4)
        hn, cmn = np.asarray(h), np.asarray(cm)
        want = hn[cmn[..., None].repeat(hn.shape[-1], -1)].reshape(-1, hn.shape[-1])
        # per-example masked mean
        for n in range(hn.shape[0]):
            sel = hn[n][cmn[n]]
            np.testing.assert_allclose(
                np.asarray(out.context)[n], sel.mean(0), rtol=1e-5, atol=1e-6
            )

    def test_empty_album_edge_cases(self):
        """Whole sequences masked out (empty album / all-pad modality) stay harmless."""
        h, cm, q, qm = make_case(seed=5)
        cm = np.asarray(cm).copy()
        cm[:, 0, :] = False  # kill sequence 0 everywhere
        cm = jnp.asarray(cm)
        c = similarity_tensor(h, q, "trilinear", trilinear_params(6))
        out = fvta_attention(h, cm, q, qm, c)
        assert np.isfinite(np.asarray(out.context)).all()
        assert np.asarray(out.seq_attn)[:, 0].max() == 0.0

    def test_question_side_normalized(self):
        out, (h, cm, q, qm) = self._run("fvta", seed=6)
        qn = np.asarray(q)
        lo = qn.min(axis=1) - 1e-5
        hi = qn.max(axis=1) + 1e-5
        qa = np.asarray(out.question)
        assert (qa >= lo).all() and (qa <= hi).all()

    def test_grads_finite(self):
        h, cm, q, qm = make_case(seed=7)
        params = trilinear_params(6)

        def loss(p):
            c = similarity_tensor(h, q, "trilinear", p)
            out = fvta_attention(h, cm, q, qm, c)
            return (out.context**2).sum() + (out.question**2).sum()

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))


class TestFocalMechanismGate:
    """Always-on, training-free form of the focal-mechanism gate (round-4
    verdict item 6). The repo's central scientific property — focal attention
    localizes planted evidence where flat's joint softmax cannot — was gated
    only behind FVTA_RUN_SLOW (trained 96-album corpus,
    tests/test_slow_regression.py::test_focal_corpus_mechanism). A trained
    SCALED-DOWN gate was calibrated and rejected: four configs (24alb/12ep,
    48alb/15ep at noise 0.3 and 0.1, 64alb/20ep) all produced chaotic or
    INVERTED localization orderings — the trained mechanism only emerges at
    the full corpus scale (BASELINE.md "mechanism gate calibration",
    round 4). So the default suite pins the ops-level property the trained
    result rests on, with constructed tensors — deterministic, milliseconds:

      within a modality both variants share the same score ranking (softmax
      is monotone), so the designed discriminator is MASS. fvta's
      per-modality time softmax renormalizes within each sequence — its
      photo-row time distribution (the localization readout the corpus
      metric reads at z["time_attn"][:, 0].argmax) is EXACTLY invariant to
      decoy content in other modalities. flat's single joint softmax lets a
      high-scoring text modality absorb the photo row's mass, collapsing the
      same readout (and with it the gradient signal that would ever train a
      photo localizer — why flat never learns to localize at corpus scale).
    """

    EVIDENCE_T = 3

    def _case(self, decoy: float):
        """2 modalities: photo (s=0) carries one planted evidence state at
        EVIDENCE_T aligned with the question; text (s=1) is all decoy states
        whose question-correlation is `decoy`-scaled."""
        n, s, t, j, d = 1, 2, 8, 1, 8
        h = np.zeros((n, s, t, d), np.float32)
        e0, e1 = np.eye(d, dtype=np.float32)[:2]
        h[0, 0] = e1 * 0.5                 # photo noise floor, orthogonal to q
        h[0, 0, self.EVIDENCE_T] = e0 * 2.0  # planted evidence
        h[0, 1] = e0 * decoy               # text decoys, every position
        q = np.zeros((n, j, d), np.float32)
        q[0, 0] = e0 * 4.0
        cm = jnp.ones((n, s, t), bool)
        qm = jnp.ones((n, j), bool)
        return jnp.asarray(h), cm, jnp.asarray(q), qm

    def _attend(self, variant, decoy):
        h, cm, q, qm = self._case(decoy)
        c = similarity_tensor(h, q, "dot", {})
        return ATTENTION_VARIANTS[variant](h, cm, q, qm, c)

    def test_agree_without_decoy_mass(self):
        """Sanity: with no decoy signal both variants localize the evidence."""
        for variant in ("fvta", "flat"):
            w = np.asarray(self._attend(variant, decoy=0.0).time_attn)[0, 0]
            assert int(w.argmax()) == self.EVIDENCE_T
            assert w[self.EVIDENCE_T] > 0.8, (variant, w)

    def test_fvta_localization_invariant_to_decoys(self):
        """The localization readout must not move AT ALL when another
        modality's correlation mass grows 4 orders of magnitude."""
        w0 = np.asarray(self._attend("fvta", decoy=0.0).time_attn)[0, 0]
        w1 = np.asarray(self._attend("fvta", decoy=4.0).time_attn)[0, 0]
        np.testing.assert_array_equal(w0, w1)  # same ops on same row: bitwise
        assert int(w1.argmax()) == self.EVIDENCE_T
        assert w1[self.EVIDENCE_T] > 0.99

    def test_flat_localization_collapses_under_decoys(self):
        """flat's joint softmax: the photo row's evidence weight — near-1
        without decoys — collapses >3 orders of magnitude against 8 decoy
        positions scoring 2x the evidence, leaving the readout (and the
        photo-side gradient, which scales with this mass) starved."""
        w_weak = np.asarray(self._attend("flat", decoy=0.0).time_attn)[0, 0]
        w_strong = np.asarray(self._attend("flat", decoy=4.0).time_attn)[0, 0]
        assert w_weak[self.EVIDENCE_T] > 0.8
        assert w_strong[self.EVIDENCE_T] < 1e-3
        assert w_strong.sum() < 1e-3  # the whole photo row is starved
