"""Fused FVTA attention Pallas kernel (BASELINE.json north star: "the FVTA core —
the question x context correlation kernel tensor and the hierarchical focal softmax
over the time and modality axes — becomes a single fused Pallas attention kernel").

One kernel pass computes, per example, everything ops/fvta_ref.fvta_attention does:
correlation tensor (trilinear/dot kernel), time-level masked softmax, sequence-level
masked softmax, both attended vectors, and the attention maps — without ever
materializing the [N, S, T, J] correlation tensor in HBM.

Blockwise over the context-time axis with ONLINE two-level softmax (FlashAttention
-family rescaling; cf. PAPERS.md FuseMax/FlashAttention entries — pattern only):
- grid = (N, T/Tb); VMEM scratch carries, across a row of time blocks:
    run_max[S]  running max of the time-level scores E[s, :t]
    run_den[S]  running sum of exp(E - run_max)
    run_v[S,D]  running numerator  sum_t exp(E - run_max) * h[s,t,:]
    e_buf[S,T]  raw scores (to emit exact normalized attention maps at the end)
    qmx[1,J]    running max over (s,t) of the masked correlation (question side)
- on the last block: seq-level scores G[s] = run_max[s] (+log den? no — G is the MAX
  over t of E, exactly run_max), B = masked softmax over S, ctx = sum_s B * run_v/run_den,
  question side wq = masked softmax_J(qmx), q~ = wq @ Q, and the exact time/seq maps.

This linearizes HBM traffic in T (h is streamed block by block), which is what makes
the TGIF-QA-style long-sequence config (BASELINE.json config 4) fit on chip; the
context-parallel multi-chip version composes the same online stats across devices
(parallel/cp.py).

Backward: custom_vjp rematerializing through ops/fvta_ref (exact same math), the
standard recompute strategy for fused attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fvta_memexqa_tpu.ops.fvta_ref import (AttentionOutput, focal_finalize,
                                           focal_local_stats, fvta_attention,
                                           similarity_tensor)

NEG = -1e30

# Finalizing-kernel block-count ceiling: its e_buf scratch is O(S*T) VMEM and
# its last-block finalize UNROLLS over the block count — measured fine at the
# video shapes (nt=8 @ T=4096) and dead (Mosaic compile failure) at nt~256.
# Beyond this, fvta_attention_pallas streams stats to HBM + finalizes in XLA.
_FINALIZE_MAX_BLOCKS = 16


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _kernel(h_ref, cm_ref, q_ref, qm_ref, wx_ref, wy_ref, wxy_ref,
            ctx_ref, qatt_ref, ta_ref, sa_ref,
            run_max, run_den, run_v, e_buf, qmx, cmx, *, num_tblocks: int):
    tb_i = pl.program_id(1)
    s, tb, d = h_ref.shape[1], h_ref.shape[2], h_ref.shape[3]
    j = q_ref.shape[1]

    @pl.when(tb_i == 0)
    def _init():
        run_max[:] = jnp.full_like(run_max, NEG)
        run_den[:] = jnp.zeros_like(run_den)
        run_v[:] = jnp.zeros_like(run_v)
        qmx[:] = jnp.full_like(qmx, NEG)
        cmx[:] = jnp.zeros_like(cmx)

    h = h_ref[0]                                   # [S, Tb, D]
    cm = cm_ref[0]                                 # [S, Tb] f32
    q = q_ref[0]                                   # [J, D]
    qm = qm_ref[0]                                 # [1, J] f32

    # trilinear correlation: <wx,h> + <wy,q> + (h*wxy)·q   (dot kernel = wx=wy=0, wxy=1)
    # Kept 3-D [S, Tb, J] throughout: lane-crossing reshapes (e.g. [S,Tb]→[S*Tb,1])
    # are unsupported shape casts on TPU; sublane splits ([S*Tb,J]→[S,Tb,J]) are fine.
    hf = h.reshape(s * tb, d)
    c = jax.lax.dot_general(hf * wxy_ref[0], q, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32).reshape(s, tb, j)
    sx = jnp.sum(h * wx_ref[0], axis=-1, keepdims=True)             # [S, Tb, 1]
    sy = jnp.sum(q * wy_ref[0], axis=-1, keepdims=True).T.reshape(1, 1, j)
    c = c + sx + sy

    # context scores: max over VALID question words (exp_mask semantics)
    c_jmasked = c + (1.0 - qm.reshape(1, 1, j)) * NEG               # [S, Tb, J]
    e = jnp.max(c_jmasked, axis=-1)                                 # [S, Tb]
    e = e + (1.0 - cm) * NEG                                        # mask padded t
    # leading-dim dynamic store (lane-dim dynamic offsets are illegal on TPU)
    e_buf[tb_i] = e

    # online time-softmax update (flash rescaling)
    m_old = run_max[:]                                              # [S, 1]
    m_new = jnp.maximum(m_old, jnp.max(e, axis=-1, keepdims=True))
    scale = jnp.exp(m_old - m_new)
    p = jnp.exp(e - m_new)                                          # [S, Tb]
    run_den[:] = run_den[:] * scale + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p[:, None, :], h, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)[:, 0, :]  # [S, D]
    run_v[:] = run_v[:] * scale + pv
    run_max[:] = m_new

    # question-side running max over valid (s, t)
    c_smasked = c + (1.0 - cm[:, :, None]) * NEG                    # [S, Tb, J]
    qmx[:] = jnp.maximum(qmx[:], jnp.max(c_smasked, axis=(0, 1)).reshape(1, j))
    cmx[:] = jnp.maximum(cmx[:], jnp.max(cm, axis=-1, keepdims=True))

    @pl.when(tb_i == num_tblocks - 1)
    def _finalize():
        # seq validity from the CONTEXT mask itself (cmx), not from run_max:
        # an all-masked QUESTION also absorbs run_max to -1e30, but the
        # reference's seq_mask = ctx_mask.any(-1) still marks such sequences
        # valid (finite-uniform exp_mask semantics) — the two must match.
        seq_valid = (cmx[:] > 0.5).astype(jnp.float32)              # [S, 1]
        g = run_max[:] + (1.0 - seq_valid) * NEG
        g_max = jnp.max(g, axis=0, keepdims=True)
        b = jnp.exp(g - g_max)
        b = b / jnp.sum(b, axis=0, keepdims=True)                   # [S, 1] softmax_S
        v = run_v[:] / jnp.maximum(run_den[:], 1e-30)               # [S, D]
        ctx_ref[0, 0] = jnp.sum(b * v, axis=0, keepdims=True)[0]

        # exact normalized time weights from the raw score buffer (static block
        # slices concatenated along lanes — dynamic lane offsets are illegal)
        inv_den = 1.0 / jnp.maximum(run_den[:], 1e-30)
        a = jnp.concatenate(
            [jnp.exp(e_buf[bi] - run_max[:]) * inv_den for bi in range(num_tblocks)],
            axis=1,
        )                                                           # [S, T]
        ta_ref[0] = a * seq_valid
        sa_ref[0, 0] = (b * seq_valid).reshape(1, s)[0]

        qv = qmx[:] + (1.0 - qm) * NEG
        qv = qv - jnp.max(qv, axis=-1, keepdims=True)
        wq = jnp.exp(qv)
        wq = wq / jnp.sum(wq, axis=-1, keepdims=True)               # [1, J]
        qatt_ref[0, 0] = jnp.dot(wq, q, preferred_element_type=jnp.float32)[0]


def _stats_kernel(h_ref, cm_ref, q_ref, qm_ref, wx_ref, wy_ref, wxy_ref,
                  m_ref, den_ref, v_ref, eq_ref, e_ref,
                  run_max, run_den, run_v, qmx, *, num_tblocks: int):
    """Stats-mode body: identical blockwise online pass as _kernel, but instead
    of finalizing the two-level softmax it EMITS the per-shard statistics
    (fvta_ref.focal_local_stats semantics) — the per-device engine under
    context parallelism (parallel/cp.py composes them across the mesh)."""
    tb_i = pl.program_id(1)
    s, tb, d = h_ref.shape[1], h_ref.shape[2], h_ref.shape[3]
    j = q_ref.shape[1]

    @pl.when(tb_i == 0)
    def _init():
        run_max[:] = jnp.full_like(run_max, NEG)
        run_den[:] = jnp.zeros_like(run_den)
        run_v[:] = jnp.zeros_like(run_v)
        qmx[:] = jnp.full_like(qmx, NEG)

    h = h_ref[0]                                   # [S, Tb, D]
    cm = cm_ref[0]                                 # [S, Tb] f32
    q = q_ref[0]                                   # [J, D]
    qm = qm_ref[0]                                 # [1, J] f32

    hf = h.reshape(s * tb, d)
    c = jax.lax.dot_general(hf * wxy_ref[0], q, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32).reshape(s, tb, j)
    sx = jnp.sum(h * wx_ref[0], axis=-1, keepdims=True)
    sy = jnp.sum(q * wy_ref[0], axis=-1, keepdims=True).T.reshape(1, 1, j)
    c = c + sx + sy

    c_jmasked = c + (1.0 - qm.reshape(1, 1, j)) * NEG
    e = jnp.max(c_jmasked, axis=-1)
    e = e + (1.0 - cm) * NEG
    e_ref[0] = e                                   # this block's masked scores

    m_old = run_max[:]
    m_new = jnp.maximum(m_old, jnp.max(e, axis=-1, keepdims=True))
    scale = jnp.exp(m_old - m_new)
    p = jnp.exp(e - m_new)
    run_den[:] = run_den[:] * scale + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p[:, None, :], h, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)[:, 0, :]
    run_v[:] = run_v[:] * scale + pv
    run_max[:] = m_new

    c_smasked = c + (1.0 - cm[:, :, None]) * NEG
    qmx[:] = jnp.maximum(qmx[:], jnp.max(c_smasked, axis=(0, 1)).reshape(1, j))

    @pl.when(tb_i == num_tblocks - 1)
    def _finalize():
        m_ref[0, 0] = run_max[:].reshape(1, s)[0]
        den_ref[0, 0] = run_den[:].reshape(1, s)[0]
        v_ref[0] = run_v[:]
        eq_ref[0, 0] = qmx[:][0]


def _qcnt_kernel(h_ref, cm_ref, q_ref, wx_ref, wy_ref, wxy_ref, eq_ref,
                 qcnt_ref, acc, *, num_tblocks: int):
    """Backward pre-pass: global tie counts for the question-side max.

    eq[j] = max over (s, t) of the ctx-masked correlation; its VJP splits the
    cotangent EVENLY among tied positions (JAX reduce_max semantics), and ties
    can span time blocks (every fully-masked position is exactly -1e30), so the
    denominator must be counted over the whole T axis before distributing."""
    tb_i = pl.program_id(1)
    s, tb, d = h_ref.shape[1], h_ref.shape[2], h_ref.shape[3]
    j = q_ref.shape[1]

    @pl.when(tb_i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    h = h_ref[0]
    cm = cm_ref[0]
    q = q_ref[0]
    hf = h.reshape(s * tb, d)
    c = jax.lax.dot_general(hf * wxy_ref[0], q, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32).reshape(s, tb, j)
    sx = jnp.sum(h * wx_ref[0], axis=-1, keepdims=True)
    sy = jnp.sum(q * wy_ref[0], axis=-1, keepdims=True).T.reshape(1, 1, j)
    c = c + sx + sy
    c_smasked = c + (1.0 - cm[:, :, None]) * NEG
    tie = (c_smasked == eq_ref[0].reshape(1, 1, j)).astype(jnp.float32)
    acc[:] = acc[:] + jnp.sum(tie, axis=(0, 1)).reshape(1, j)

    @pl.when(tb_i == num_tblocks - 1)
    def _emit():
        qcnt_ref[0] = acc[:]


def _bwd_kernel(h_ref, cm_ref, q_ref, qm_ref, wx_ref, wy_ref, wxy_ref,
                de_ref, geq_ref, eq_ref, qcnt_ref, e_ref, m_ref, gv_ref,
                dh_ref, dq_ref, dwx_ref, dwy_ref, dwxy_ref,
                dq_acc, dwx_acc, dwy_acc, dwxy_acc, *, num_tblocks: int):
    """Streaming stats backward: recomputes the block's correlation (flash-style
    rematerialization), routes the time-score cotangent `de` through the
    question-word max (tie-split, block-local) and the question-side cotangent
    `geq` through the (s, t) max (tie-split by the pre-counted global qcnt),
    then turns dC into dh (streamed per block) and dq/dw* (VMEM accumulators,
    emitted per example on the last block). The v-path term of dh
    (p·gv, p = exp(e - m) from the SAVED forward scores) is accumulated
    in-kernel too: materializing it XLA-side as a standalone [N, S, T, D]
    buffer plus a post-kernel add held the training-capacity probe at XLA's
    own OOM point (round 4 — two extra O(T·D) HBM slabs). O(Tb) VMEM —
    long-T training no longer materializes the [N, S, T, J] correlation the
    XLA-remat VJP needs, nor any O(T·D) temp beyond dh itself."""
    tb_i = pl.program_id(1)
    s, tb, d = h_ref.shape[1], h_ref.shape[2], h_ref.shape[3]
    j = q_ref.shape[1]

    @pl.when(tb_i == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)
        dwx_acc[:] = jnp.zeros_like(dwx_acc)
        dwy_acc[:] = jnp.zeros_like(dwy_acc)
        dwxy_acc[:] = jnp.zeros_like(dwxy_acc)

    h = h_ref[0]                                    # [S, Tb, D]
    cm = cm_ref[0]                                  # [S, Tb]
    q = q_ref[0]                                    # [J, D]
    qm = qm_ref[0]                                  # [1, J]
    de = de_ref[0]                                  # [S, Tb]

    hf = h.reshape(s * tb, d)
    c = jax.lax.dot_general(hf * wxy_ref[0], q, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32).reshape(s, tb, j)
    sx = jnp.sum(h * wx_ref[0], axis=-1, keepdims=True)
    sy = jnp.sum(q * wy_ref[0], axis=-1, keepdims=True).T.reshape(1, 1, j)
    c = c + sx + sy

    # de routed through e = max_j(C + qmask): even split among the block-local
    # tie set (self-consistent: tie mask and max from the SAME recomputed C).
    cq = c + (1.0 - qm.reshape(1, 1, j)) * NEG
    e_pre = jnp.max(cq, axis=-1, keepdims=True)     # [S, Tb, 1]
    tie_j = (cq == e_pre).astype(jnp.float32)
    dc = tie_j * (de[:, :, None] / jnp.sum(tie_j, axis=-1, keepdims=True))

    # geq routed through eq = max_{s,t}(C + cmask): global tie count (qcnt).
    c_smasked = c + (1.0 - cm[:, :, None]) * NEG
    tie_q = (c_smasked == eq_ref[0].reshape(1, 1, j)).astype(jnp.float32)
    dc = dc + tie_q * (geq_ref[0] / jnp.maximum(qcnt_ref[0], 1.0)).reshape(1, 1, j)

    # dC -> input/param grads (trilinear: C = <wx,h> + <wy,q> + (h*wxy)·q)
    dcf = dc.reshape(s * tb, j)
    ones_st = jnp.ones((s * tb, 1), jnp.float32)
    rowsum = jnp.sum(dcf, axis=-1, keepdims=True)                        # [S*Tb, 1]
    colsum = jax.lax.dot_general(dcf, ones_st, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)     # [J, 1]
    dh = jax.lax.dot_general(dcf, q * wxy_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = dh + rowsum * wx_ref[0]
    # v-path dh term: p = exp(e - m) with the saved forward scores/max —
    # bitwise the factor the XLA prologue would have formed (padded rows
    # carry e = NEG, m = 0, so p = 0 and they contribute nothing).
    p_blk = jnp.exp(e_ref[0] - m_ref[0].reshape(s, 1))          # [S, Tb]
    dh_ref[0] = dh.reshape(s, tb, d) + p_blk[:, :, None] * gv_ref[0][:, None, :]
    tmp = jax.lax.dot_general(dcf, hf, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)        # [J, D]
    dq_acc[:] = dq_acc[:] + tmp * wxy_ref[0] + colsum * wy_ref[0]
    dwx_acc[:] = dwx_acc[:] + jax.lax.dot_general(
        rowsum, hf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dwy_acc[:] = dwy_acc[:] + jax.lax.dot_general(
        colsum, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dwxy_acc[:] = dwxy_acc[:] + jnp.sum(tmp * q, axis=0, keepdims=True)

    @pl.when(tb_i == num_tblocks - 1)
    def _emit():
        dq_ref[0] = dq_acc[:]
        dwx_ref[0] = dwx_acc[:]
        dwy_ref[0] = dwy_acc[:]
        dwxy_ref[0] = dwxy_acc[:]


def _fvta_bwd_pallas_call(h, cm_f, q, qm_f, wx, wy, wxy, de, geq, eq,
                          e, m, gv, tblock: int, interpret: bool):
    n, s, t, d = h.shape
    j = q.shape[1]
    nt = t // tblock
    common_in = [
        pl.BlockSpec((1, s, tblock, d), lambda ni, ti: (ni, 0, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, tblock), lambda ni, ti: (ni, 0, ti),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, j, d), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
    ]
    w_in = [pl.BlockSpec((1, d), lambda ni, ti: (0, 0), memory_space=pltpu.VMEM)] * 3
    nj_in = pl.BlockSpec((1, 1, j), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM)
    qcnt = pl.pallas_call(
        functools.partial(_qcnt_kernel, num_tblocks=nt),
        grid=(n, nt),
        in_specs=common_in + w_in + [nj_in],
        out_specs=nj_in,
        out_shape=jax.ShapeDtypeStruct((n, 1, j), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, j), jnp.float32)],
        interpret=interpret,
    )(h, cm_f, q, wx, wy, wxy, eq)
    st_in = pl.BlockSpec((1, s, tblock), lambda ni, ti: (ni, 0, ti),
                         memory_space=pltpu.VMEM)
    dh, dq, dwx, dwy, dwxy = pl.pallas_call(
        functools.partial(_bwd_kernel, num_tblocks=nt),
        grid=(n, nt),
        in_specs=common_in + [nj_in] + w_in + [
            st_in,                                          # de
            nj_in, nj_in, nj_in,                            # geq, eq, qcnt
            st_in,                                          # e (saved scores)
            pl.BlockSpec((1, 1, s), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM),          # m (saved max)
            pl.BlockSpec((1, s, d), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM),          # gv (v cotangent)
        ],
        out_specs=[
            pl.BlockSpec((1, s, tblock, d), lambda ni, ti: (ni, 0, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, d), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda ni, ti: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, s, t, d), jnp.float32),
            jax.ShapeDtypeStruct((n, j, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((j, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(h, cm_f, q, qm_f, wx, wy, wxy, de, geq, eq, qcnt, e, m, gv)
    return dh, dq, dwx[:, 0], dwy[:, 0], dwxy[:, 0]


def _fvta_stats_pallas_call(h, cm_f, q, qm_f, wx, wy, wxy, tblock: int,
                            interpret: bool):
    n, s, t, d = h.shape
    j = q.shape[1]
    nt = t // tblock
    kernel = functools.partial(_stats_kernel, num_tblocks=nt)
    return pl.pallas_call(
        kernel,
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, s, tblock, d), lambda ni, ti: (ni, 0, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, tblock), lambda ni, ti: (ni, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, d), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda ni, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda ni, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda ni, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, s), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
            # e streams back block by block (the only O(T) output)
            pl.BlockSpec((1, s, tblock), lambda ni, ti: (ni, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, s), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, s), jnp.float32),
            jax.ShapeDtypeStruct((n, s, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, j), jnp.float32),
            jax.ShapeDtypeStruct((n, s, t), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, 1), jnp.float32),    # run_max
            pltpu.VMEM((s, 1), jnp.float32),    # run_den
            pltpu.VMEM((s, d), jnp.float32),    # run_v
            pltpu.VMEM((1, j), jnp.float32),    # qmx
        ],
        interpret=interpret,
    )(h, cm_f, q, qm_f, wx, wy, wxy)


def _fvta_pallas_call(h, cm_f, q, qm_f, wx, wy, wxy, tblock: int, interpret: bool):
    n, s, t, d = h.shape
    j = q.shape[1]
    nt = t // tblock
    kernel = functools.partial(_kernel, num_tblocks=nt)
    return pl.pallas_call(
        kernel,
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, s, tblock, d), lambda ni, ti: (ni, 0, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, tblock), lambda ni, ti: (ni, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, d), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda ni, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda ni, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda ni, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # singleton middle axis so block dims == array dims (TPU tiling rule)
            pl.BlockSpec((1, 1, d), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, t), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda ni, ti: (ni, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((n, s, t), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, s), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, 1), jnp.float32),    # run_max
            pltpu.VMEM((s, 1), jnp.float32),    # run_den
            pltpu.VMEM((s, d), jnp.float32),    # run_v
            pltpu.VMEM((nt, s, tblock), jnp.float32),  # e_buf (raw scores, all blocks)
            pltpu.VMEM((1, j), jnp.float32),    # qmx
            pltpu.VMEM((s, 1), jnp.float32),    # cmx (per-seq ctx-mask max)
        ],
        interpret=interpret,
    )(h, cm_f, q, qm_f, wx, wy, wxy)


def _pick_tblock(t: int, s: int = 8, j: int = 32, max_block: int = 512,
                 c_budget_bytes: int = 4 << 20) -> int:
    """Largest divisor of t <= max_block whose per-block correlation
    temporaries [S, Tb, J] stay within a measured VMEM budget.

    The kernel materializes several S*Tb*J f32 temporaries per grid step
    (c, its masked/exponentiated forms, plus Mosaic double-buffering); at
    MemexQA shapes (S~48, J~30) these are small and Tb=512 is the measured
    best, but at long-question shapes (J=512) Tb=512 blows VMEM — the chip
    rejects the kernel at T where the unfused XLA path still runs. The 4MB
    c-budget keeps every measured-good config at its current block (48*512*30
    = 2.95MB) and shrinks exactly the configs that failed (8*512*512 = 8.4MB
    caps to Tb=256, and both 256 and 128 are verified to run on chip).

    Lane constraint: Mosaic requires a blocked LAST dimension to be a
    multiple of 128 (or the whole axis). The budget cap must not override
    that — the streaming backward's tighter 1MB budget at J=512 capped the
    block at 64 and the lowering ValueError'd (found by the round-4
    training-capacity probe). When no divisor of t satisfies both, the lane
    rule wins: take 128 (smallest valid block, over-budget by design — a
    VMEM OOM there is a truthful capacity answer, a lowering crash is not),
    or the whole axis when t itself isn't lane-aligned."""
    cap = max(1, c_budget_bytes // (4 * s * j))
    for cand in range(min(t, max_block, cap), 0, -1):
        if t % cand == 0 and (cand % 128 == 0 or cand == t):
            return cand
    return 128 if t % 128 == 0 else t


def fvta_attention_pallas(h, ctx_mask, q, q_mask, similarity: str, sim_params: dict,
                          tblock: int | None = None, interpret: bool | None = None
                          ) -> AttentionOutput:
    """Drop-in fused replacement for similarity_tensor + fvta_attention.

    Supports similarity in {"trilinear", "dot"}; bilinear falls back to the XLA
    reference path (a [D, D] kernel matmul inside the kernel is not worth fusing).
    """
    d = h.shape[-1]
    if similarity not in ("trilinear", "dot"):
        c = similarity_tensor(h, q, similarity, sim_params)
        return fvta_attention(h, ctx_mask, q, q_mask, c)
    t, s, j = h.shape[2], h.shape[1], q.shape[1]
    tb = tblock or _pick_tblock(t, s=max(s, 8), j=j)
    streaming = t // tb > _FINALIZE_MAX_BLOCKS
    # Dispatch: the fused kernel wins when the modality axis is wide (MemexQA:
    # S = albums x 6). For thin-S shapes (TGIF-style S<8) the Mosaic sublane
    # rules force padding S up to 8, which costs (8-s)*D extra HBM bytes per
    # time step (h and, under grad, dh/dh_direct too); the XLA path's extra
    # allocation is its s*J correlation slab. So a thin-S shape streams ONLY
    # when the correlation actually dominates the padding — long-question
    # regimes, (8-s)*D < s*J. At J <= D thin-S the XLA path's capacity is
    # strictly larger: the round-4 grad capacity probe measured XLA reaching
    # T=2,097,152 at (S=1, J=30, D=200) where the padded streaming path
    # OOM'd at its first probe point T=16,384 (BASELINE.md training-capacity
    # table) — the old block-count-only rule sent exactly that shape to the
    # kernel.
    if s < 8 and not (streaming and (8 - s) * d < s * j):
        c = similarity_tensor(h, q, similarity, sim_params)
        return fvta_attention(h, ctx_mask, q, q_mask, c)
    if streaming:
        # Long-T streaming form: the finalizing kernel buffers EVERY block's
        # raw scores in VMEM (e_buf is O(S*T)) and unrolls its finalize over
        # the block count — measured to stop compiling near nt~256 on the v5
        # lite, below the T where the unfused XLA path still runs. Streaming
        # the per-block stats to HBM (O(Tb) VMEM, the stats kernel) and
        # finalizing in XLA keeps one fused pass over the correlation and
        # scales T to the HBM limit: measured 2x the XLA path's largest T at
        # J=512 (BASELINE.md capacity table). Differentiable via the stats
        # custom_vjp, which at this block count uses the streaming Pallas
        # backward (_bwd_kernel) — training stays O(Tb)-VMEM too.
        m, den, v, eq, e = fvta_stats_pallas(h, ctx_mask, q, q_mask, similarity,
                                             sim_params, tblock=tb,
                                             interpret=interpret)
        return focal_finalize(m, den, v, eq, e, q, q_mask, ctx_mask.any(-1))
    if similarity == "trilinear":
        wx, wy, wxy = sim_params["w_x"], sim_params["w_y"], sim_params["w_xy"]
    else:  # dot
        wx = jnp.zeros(d, h.dtype)
        wy = jnp.zeros(d, h.dtype)
        wxy = jnp.ones(d, h.dtype)
    return _core(h, ctx_mask.astype(jnp.float32), q, q_mask.astype(jnp.float32),
                 wx, wy, wxy, tb, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _core(h, cm_f, q, qm_f, wx, wy, wxy, tblock, interpret):
    return _core_fwd_impl(h, cm_f, q, qm_f, wx, wy, wxy, tblock, interpret)


def _core_fwd_impl(h, cm_f, q, qm_f, wx, wy, wxy, tblock, interpret):
    if interpret is None:
        interpret = not _on_tpu()
    s = h.shape[1]
    # the dispatch in fvta_attention_pallas routes S<8 to the XLA path, so the
    # kernel always sees the Mosaic sublane minimum (stats mode pads instead)
    assert s >= 8, "fused FVTA kernel requires S >= 8 (dispatch handles S < 8)"
    tb = tblock or _pick_tblock(h.shape[2], s=s, j=q.shape[1])
    ctx, qatt, ta, sa = _fvta_pallas_call(
        h, cm_f, q, qm_f[:, None, :], wx[None], wy[None], wxy[None], tb, interpret
    )
    return AttentionOutput(context=ctx[:, 0], question=qatt[:, 0],
                           time_attn=ta, seq_attn=sa[:, 0])


def _core_fwd(h, cm_f, q, qm_f, wx, wy, wxy, tblock, interpret):
    out = _core_fwd_impl(h, cm_f, q, qm_f, wx, wy, wxy, tblock, interpret)
    return out, (h, cm_f, q, qm_f, wx, wy, wxy)


def _core_bwd(tblock, interpret, res, g):
    h, cm_f, q, qm_f, wx, wy, wxy = res

    def ref(h_, q_, wx_, wy_, wxy_):
        c = similarity_tensor(h_, q_, "trilinear",
                              {"w_x": wx_, "w_y": wy_, "w_xy": wxy_})
        return fvta_attention(h_, cm_f > 0.5, q_, qm_f > 0.5, c)

    _, vjp = jax.vjp(ref, h, q, wx, wy, wxy)
    dh, dq, dwx, dwy, dwxy = vjp(g)
    return (dh, jnp.zeros_like(cm_f), dq, jnp.zeros_like(qm_f), dwx, dwy, dwxy)


_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# Stats mode: the per-shard engine for context parallelism (parallel/cp.py).
# Same blockwise online pass, but returns focal_local_stats' (m, den, v, eq, e)
# instead of finalizing — CP composes them across devices with psum/pmax.
# ---------------------------------------------------------------------------


def fvta_stats_pallas(h, ctx_mask, q, q_mask, similarity: str, sim_params: dict,
                      tblock: int | None = None, interpret: bool | None = None):
    """Fused drop-in for ops/fvta_ref.focal_local_stats: streams the time axis
    in VMEM-resident blocks, never materializing the [N, S, Tl, J] correlation
    of the local shard. bilinear falls back to the XLA stats (same reasoning
    as fvta_attention_pallas). Differentiable (custom_vjp rematerializes the
    XLA stats math)."""
    d = h.shape[-1]
    if similarity not in ("trilinear", "dot"):
        return focal_local_stats(h, ctx_mask, q, q_mask, similarity, sim_params)
    if similarity == "trilinear":
        wx, wy, wxy = sim_params["w_x"], sim_params["w_y"], sim_params["w_xy"]
    else:
        wx = jnp.zeros(d, h.dtype)
        wy = jnp.zeros(d, h.dtype)
        wxy = jnp.ones(d, h.dtype)
    return _stats_core(h, ctx_mask.astype(jnp.float32), q,
                       q_mask.astype(jnp.float32), wx, wy, wxy, tblock, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _stats_core(h, cm_f, q, qm_f, wx, wy, wxy, tblock, interpret):
    return _stats_fwd_impl(h, cm_f, q, qm_f, wx, wy, wxy, tblock, interpret)


def _stats_fwd_impl(h, cm_f, q, qm_f, wx, wy, wxy, tblock, interpret):
    if interpret is None:
        interpret = not _on_tpu()
    n, s, t, d = h.shape
    # Same Mosaic sublane-underflow workaround as _core_fwd_impl: padded
    # sequences are fully masked and sliced back off every output.
    s_pad = max(s, 8)
    if s_pad != s:
        h = jnp.pad(h, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
        cm_f = jnp.pad(cm_f, ((0, 0), (0, s_pad - s), (0, 0)))
    tb = tblock or _pick_tblock(t, s=s_pad, j=q.shape[1])
    m, den, v, eq, e = _fvta_stats_pallas_call(
        h, cm_f, q, qm_f[:, None, :], wx[None], wy[None], wxy[None], tb, interpret
    )
    return (m[:, 0, :s], den[:, 0, :s], v[:, :s], eq[:, 0], e[:, :s])


def _stats_fwd(h, cm_f, q, qm_f, wx, wy, wxy, tblock, interpret):
    out = _stats_fwd_impl(h, cm_f, q, qm_f, wx, wy, wxy, tblock, interpret)
    m, den, v, eq, e = out
    # m/eq/e feed the streaming backward (den/v are re-derivable from e and m:
    # p = exp(e - m) is bitwise what the XLA VJP would have saved, since e and m
    # are the exact masked scores / running maxes the kernel emitted).
    return out, (h, cm_f, q, qm_f, wx, wy, wxy, m, eq, e)


def _stats_bwd(tblock, interpret, res, g):
    # res holds _stats_core's own (unpadded) arguments; the S>=8 padding is
    # internal to _stats_fwd_impl, so shapes here match the primal exactly.
    h, cm_f, q, qm_f, wx, wy, wxy, m, eq, e = res
    n, s, t, d = h.shape
    j = q.shape[1]
    s_pad = max(s, 8)
    tb_fwd = tblock or _pick_tblock(t, s=s_pad, j=j)
    if t // tb_fwd <= _FINALIZE_MAX_BLOCKS:
        # Short T (the CP-engine regime): the XLA-remat VJP materializes only a
        # modest [N, S, T, J] correlation and is cheaper than two kernel passes.
        def ref(h_, q_, wx_, wy_, wxy_):
            return focal_local_stats(h_, cm_f > 0.5, q_, qm_f > 0.5, "trilinear",
                                     {"w_x": wx_, "w_y": wy_, "w_xy": wxy_})

        _, vjp = jax.vjp(ref, h, q, wx, wy, wxy)
        dh, dq, dwx, dwy, dwxy = vjp(g)
        return (dh, jnp.zeros_like(cm_f), dq, jnp.zeros_like(qm_f),
                dwx, dwy, dwxy)

    # Long-T streaming backward. Everything EXCEPT the correlation routing is
    # computable in XLA from the saved outputs with O(S*T) memory:
    #   p      = exp(e - m)                      (the time-softmax numerators)
    #   dp     = d(den)/de + d(v)/de             (gden + <gv, h_t>)
    #   dm_tot = gm - sum_t p*dp                 (m's total cotangent)
    #   de     = ge + p*dp + tie_m * dm_tot/cnt  (reduce_max's even tie split)
    # Only dC = route(de through max_j, geq through max_st) needs the
    # correlation itself — rematerialized blockwise by the Pallas kernels.
    gm, gden, gv, geq, ge = g
    if interpret is None:
        interpret = not _on_tpu()
    p = jnp.exp(e - m[..., None])
    dp = gden[..., None] + jnp.einsum("nsd,nstd->nst", gv, h)
    dm_tot = gm - jnp.sum(p * dp, axis=-1)
    tie_m = (e == m[..., None]).astype(e.dtype)
    cnt_m = jnp.sum(tie_m, axis=-1, keepdims=True)
    de = ge + p * dp + tie_m * (dm_tot[..., None] / cnt_m)
    # The v-path dh term p·gv is accumulated INSIDE the backward kernel from
    # the saved (e, m): forming it here as a standalone [N, S, T, D] buffer
    # plus a post-kernel add kept two extra O(T·D) HBM slabs live and held
    # the training-capacity probe at XLA's own OOM point (round 4).

    hk, cmk, dek, ek, mk, gvk = h, cm_f, de, e, m, gv
    if s_pad != s:
        hk = jnp.pad(hk, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
        # pad rows get cm = -1.0: their masked correlation lands at -2e30,
        # which can never tie with a real eq (>= -1e30) — keeping qcnt and the
        # routed gradients identical to the unpadded reference even in the
        # degenerate all-masked-example case (where every real position ties).
        cmk = jnp.pad(cmk, ((0, 0), (0, s_pad - s), (0, 0)),
                      constant_values=-1.0)
        dek = jnp.pad(dek, ((0, 0), (0, s_pad - s), (0, 0)))
        # pad rows: e = NEG with m = 0 makes the in-kernel p = exp(e - m)
        # exactly 0 — no contribution, sliced off anyway
        ek = jnp.pad(ek, ((0, 0), (0, s_pad - s), (0, 0)),
                     constant_values=NEG)
        mk = jnp.pad(mk, ((0, 0), (0, s_pad - s)))
        gvk = jnp.pad(gvk, ((0, 0), (0, s_pad - s), (0, 0)))
    # tighter block budget than the forward: the backward keeps ~4-6 live
    # [S, Tb, J] temporaries (c, masked forms, tie masks, dC) vs the forward's ~3
    tb = _pick_tblock(t, s=s_pad, j=j, c_budget_bytes=1 << 20)
    dh_k, dq, dwx_n, dwy_n, dwxy_n = _fvta_bwd_pallas_call(
        hk, cmk, q, qm_f[:, None, :], wx[None], wy[None], wxy[None],
        dek, geq[:, None, :], eq[:, None, :],
        ek, mk[:, None, :], gvk, tb, interpret)
    dh = dh_k[:, :s]
    return (dh, jnp.zeros_like(cm_f), dq, jnp.zeros_like(qm_f),
            dwx_n.sum(0), dwy_n.sum(0), dwxy_n.sum(0))


_stats_core.defvjp(_stats_fwd, _stats_bwd)
