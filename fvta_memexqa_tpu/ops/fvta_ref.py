"""FVTA attention core — einsum/XLA reference implementation.

Rebuild of the reference's `model.py` attention section (SURVEY.md section 2 "FVTA
attention core"): a correlation tensor between every question hidden state and every
context hidden state across (time x modality), then a hierarchical "focal" softmax —
attention within each sequence over time composed with attention across sequences over
the modality axis — attending both the context and the question sides.

The mount was empty, so this file is the rebuild's *canonical semantic definition*
(documented here, pinned by tests/golden fixtures, mirrored by ops/fvta_pallas.py):

Given context states H [N, S, T, D] with mask M [N, S, T] (S = album x modality
sequences, T = padded time) and question states Q [N, J, D] with mask Mq [N, J]:

1. correlation  C[n,s,t,j] = sim(H[n,s,t], Q[n,j])          (dot | bilinear | trilinear)
2. context score  E[n,s,t]  = max_j C over valid j           (question-aware relevance)
3. time-level (intra-sequence) focal softmax:
       A[n,s,:] = masked_softmax_T(E[n,s,:])
       V[n,s]   = sum_t A[n,s,t] * H[n,s,t]                  (per-sequence summary)
4. sequence-level (inter-sequence / modality) focal softmax:
       G[n,s]   = max over valid (t) of E[n,s,t]
       B[n,:]   = masked_softmax_S(G[n,:])                   (seq valid iff any t valid)
       ctx[n]   = sum_s B[n,s] * V[n,s]                      (attended context, [N, D])
5. question side (symmetric pooling):
       Eq[n,j]  = max over valid (s,t) of C[n,s,t,j]
       q~[n]    = sum_j masked_softmax_J(Eq)[n,j] * Q[n,j]   (attended question, [N, D])

Ablation variants (SURVEY.md B-config 3) share steps 1-2/5 and replace 3-4:
- flat: one softmax over all (s,t) jointly — no hierarchy
- none: masked mean-pool over (s,t) and over j — no attention at all
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from fvta_memexqa_tpu.ops.masking import exp_mask, masked_softmax


class AttentionOutput(NamedTuple):
    context: jnp.ndarray    # [N, D] attended context
    question: jnp.ndarray   # [N, D] attended question
    time_attn: jnp.ndarray  # [N, S, T] time-level weights (zeros for `none`)
    seq_attn: jnp.ndarray   # [N, S] sequence-level weights (zeros for `none`)


def similarity_tensor(
    h: jnp.ndarray,          # [N, S, T, D]
    q: jnp.ndarray,          # [N, J, D]
    kind: str,
    params: dict[str, jnp.ndarray],
) -> jnp.ndarray:
    """Correlation tensor C [N, S, T, J].

    trilinear is the BiDAF-style kernel w^T [x; y; x*y] the reference most likely uses
    (SURVEY.md flags the exact form unverified; all three are selectable via
    ModelConfig.similarity and exercised by the ablation tests).
    """
    if kind == "dot":
        return jnp.einsum("nstd,njd->nstj", h, q)
    if kind == "bilinear":
        return jnp.einsum("nstd,de,nje->nstj", h, params["w_bilinear"], q)
    if kind == "trilinear":
        # w^T [x; y; x*y] = <wx, x> + <wy, y> + sum_d wxy_d * x_d * y_d
        sx = jnp.einsum("nstd,d->nst", h, params["w_x"])[..., None]        # [N,S,T,1]
        sy = jnp.einsum("njd,d->nj", q, params["w_y"])[:, None, None, :]   # [N,1,1,J]
        sxy = jnp.einsum("nstd,njd->nstj", h * params["w_xy"], q)
        return sx + sy + sxy
    raise ValueError(f"unknown similarity kind: {kind}")


def _context_scores(c: jnp.ndarray, q_mask: jnp.ndarray) -> jnp.ndarray:
    """E [N, S, T]: max over valid question words of the correlation."""
    return jnp.max(exp_mask(c, q_mask[:, None, None, :]), axis=-1)


def fvta_attention(
    h: jnp.ndarray, ctx_mask: jnp.ndarray, q: jnp.ndarray, q_mask: jnp.ndarray,
    c: jnp.ndarray,
) -> AttentionOutput:
    """Hierarchical focal attention (steps 2-5 above). `c` is the correlation tensor."""
    e = _context_scores(c, q_mask)                                   # [N, S, T]
    a_time = masked_softmax(e, ctx_mask, axis=-1)                    # [N, S, T]
    v = jnp.einsum("nst,nstd->nsd", a_time, h)                       # [N, S, D]

    seq_mask = ctx_mask.any(axis=-1)                                 # [N, S]
    g = jnp.max(exp_mask(e, ctx_mask), axis=-1)                      # [N, S]
    b_seq = masked_softmax(g, seq_mask, axis=-1)                     # [N, S]
    ctx = jnp.einsum("ns,nsd->nd", b_seq, v)

    q_att = _question_side(c, ctx_mask, q, q_mask)
    return AttentionOutput(ctx, q_att, a_time * seq_mask[..., None], b_seq * seq_mask)


def flat_attention(
    h: jnp.ndarray, ctx_mask: jnp.ndarray, q: jnp.ndarray, q_mask: jnp.ndarray,
    c: jnp.ndarray,
) -> AttentionOutput:
    """Ablation: single soft attention over all (s, t) positions jointly."""
    n, s, t, d = h.shape
    e = _context_scores(c, q_mask).reshape(n, s * t)
    w = masked_softmax(e, ctx_mask.reshape(n, s * t), axis=-1).reshape(n, s, t)
    ctx = jnp.einsum("nst,nstd->nd", w, h)
    q_att = _question_side(c, ctx_mask, q, q_mask)
    # report flat weights in the time slot; per-seq mass in the seq slot
    return AttentionOutput(ctx, q_att, w, w.sum(axis=-1))


def no_attention(
    h: jnp.ndarray, ctx_mask: jnp.ndarray, q: jnp.ndarray, q_mask: jnp.ndarray,
    c: jnp.ndarray,
) -> AttentionOutput:
    """Ablation: masked mean-pool on both sides (correlation tensor unused)."""
    cm = ctx_mask.astype(h.dtype)
    denom = jnp.maximum(cm.sum(axis=(1, 2)), 1.0)[:, None]
    ctx = jnp.einsum("nst,nstd->nd", cm, h) / denom
    qm = q_mask.astype(q.dtype)
    q_att = jnp.einsum("nj,njd->nd", qm, q) / jnp.maximum(qm.sum(axis=1), 1.0)[:, None]
    z_t = jnp.zeros(ctx_mask.shape, h.dtype)
    return AttentionOutput(ctx, q_att, z_t, z_t.any(axis=-1).astype(h.dtype) * 0.0)


def focal_local_stats(
    h: jnp.ndarray, ctx_mask: jnp.ndarray, q: jnp.ndarray, q_mask: jnp.ndarray,
    kind: str, params: dict[str, jnp.ndarray],
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-(time-)shard ONLINE-softmax statistics of the focal attention.

    The decomposition that makes both the fused Pallas kernel
    (ops/fvta_pallas.fvta_stats_pallas streams these over time blocks) and
    context parallelism (parallel/cp.py psum/pmax-composes them across devices)
    exact: for a time shard h [N, S, Tl, D] returns
        m   [N, S]     local max of the time-level scores E
        den [N, S]     sum_t exp(E - m)
        v   [N, S, D]  sum_t exp(E - m) * h[:, :, t]
        eq  [N, J]     local max over (s, t) of the ctx-masked correlation
        e   [N, S, Tl] the masked time-level scores themselves (attention maps)
    Composing (m, den, v) across shards with (max, rescaled-sum, rescaled-sum)
    and eq with max reproduces fvta_attention exactly (tested)."""
    c = similarity_tensor(h, q, kind, params)                        # [N, S, Tl, J]
    e = jnp.max(exp_mask(c, q_mask[:, None, None, :]), axis=-1)      # [N, S, Tl]
    e = exp_mask(e, ctx_mask)
    m = jnp.max(e, axis=-1)                                          # [N, S]
    p = jnp.exp(e - m[..., None])
    den = jnp.sum(p, axis=-1)                                        # [N, S]
    v = jnp.einsum("nst,nstd->nsd", p, h)                            # [N, S, D]
    eq = jnp.max(exp_mask(c, ctx_mask[..., None]), axis=(1, 2))      # [N, J]
    return m, den, v, eq, e


def focal_finalize(m, den, v, eq, e, q, q_mask, seq_valid) -> AttentionOutput:
    """Finalize (possibly composed) online-softmax statistics into the
    attention output — the single definition of the stats→output math shared
    by context parallelism (parallel/cp.py composes per-shard stats across
    devices, then finalizes) and the long-T streaming path of the fused kernel
    (ops/fvta_pallas streams per-block stats to HBM, then finalizes here).

    Inputs are focal_local_stats' tuple, already reduced over shards if any:
    m/den [N, S], v [N, S, D], eq [N, J], e [N, S, Tl] (local time scores for
    the attention map), plus seq_valid [N, S] = "any valid t anywhere".
    Numerically identical to fvta_attention (parity-tested via cp + pallas)."""
    import jax

    from fvta_memexqa_tpu.ops.masking import VERY_NEGATIVE

    g = jnp.where(seq_valid, m, VERY_NEGATIVE)
    b = jax.nn.softmax(g, axis=-1) * seq_valid
    b = b / jnp.maximum(b.sum(-1, keepdims=True), 1e-30)            # [N, S]
    vbar = v / jnp.maximum(den[..., None], 1e-30)                   # [N, S, D]
    ctx = jnp.einsum("ns,nsd->nd", b, vbar)

    eqm = eq + (1.0 - q_mask.astype(eq.dtype)) * VERY_NEGATIVE
    wq = jax.nn.softmax(eqm, axis=-1)
    q_att = jnp.einsum("nj,njd->nd", wq, q)

    time_attn = jnp.exp(e - m[..., None]) / jnp.maximum(
        den[..., None], 1e-30) * seq_valid[..., None]
    return AttentionOutput(context=ctx, question=q_att,
                           time_attn=time_attn, seq_attn=b)


def _question_side(
    c: jnp.ndarray, ctx_mask: jnp.ndarray, q: jnp.ndarray, q_mask: jnp.ndarray
) -> jnp.ndarray:
    """q~ [N, D]: attend question words by their best correlation with valid context."""
    eq = jnp.max(exp_mask(c, ctx_mask[..., None]), axis=(1, 2))      # [N, J]
    wq = masked_softmax(eq, q_mask, axis=-1)
    return jnp.einsum("nj,njd->nd", wq, q)


ATTENTION_VARIANTS: dict[str, Callable[..., AttentionOutput]] = {
    "fvta": fvta_attention,
    "flat": flat_attention,
    "none": no_attention,
}
