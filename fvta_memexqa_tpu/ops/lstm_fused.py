"""Fused bi-LSTM v2: batch-wide grid-stepped scan + fused backward.

Round-2 successor to ops/lstm_pallas.py (BASELINE.json north star: encoders
"rewritten as a Pallas fused scan"). Round-1 kernels kept the x@Wx projection
OUTSIDE the kernel (an extra HBM round trip of x_proj [B, T, 4H] per direction,
the same traffic XLA's lax.scan pays) and rematerialized the backward through
the XLA reference. Round-2 MFU profiling (BASELINE.md) showed the LSTM encoders
are ~80% of forward FLOPs at ~12% MFU, and that a per-batch-tile sequential loop
is LATENCY-bound: T×num_tiles small recurrence matmuls execute back-to-back on
the MXU with nothing to hide their pipeline latency.

Design here — one grid cell per (direction, segment, STEP, batch-tile):

    grid = (G, nseg, T, nb)     # last dim fastest; t advances after all tiles

- Recurrent state (h, c) lives in VMEM scratch sized for a whole SEGMENT of the
  batch and persists across grid cells; each cell computes ONE time step for a
  bb-row tile: gates = x[t] @ Wx + b + h @ Wh — two LARGE matmuls (bb up to
  1024+ rows), so MXU latency is amortized and Pallas's automatic pipeline
  prefetches the next x block during compute. x is read from HBM exactly once;
  the only other HBM traffic is what the caller asked for (outputs / final
  states / cell states for training).
- `bilstm_fused_final`: inference fast path for final-state-only consumers
  (photo titles, answer candidates): NO per-step output writes at all.
- `_bwd_step_kernel`: the same grid with time REVERSED (via block index maps)
  producing per-step GATE cotangents in-kernel — recomputing pre-activations
  from (x[t], h[t-1]), both large matmuls — and writing only dgates [T, B, 4Hp]
  to HBM; the heavy dX/dWx/dWh contractions then run as three big MXU einsums
  OUTSIDE the kernel where XLA schedules them best.

Cell math and masking are TF1-exact (ops/lstm_ref.py pins; bit-identical on
chip because the prologue/projection shapes match the reference's). Masks must
be contiguous prefixes — guaranteed and validated at pack time
(data/pack.py _assert_prefix_masks). Both directions run in ONE kernel launch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fvta_memexqa_tpu.ops.lstm_ref import LSTMParams, _flip_to_front
from fvta_memexqa_tpu.ops.lstm_pallas import _on_tpu, _pad_gates, _round_up

# Scoped-VMEM budget (model bytes) for ONE kernel launch: double-buffered
# per-cell blocks + per-segment (h, c) state scratch + constant windows.
# The hardware scoped-vmem limit is 16 MB/core, but (a) the compiler's
# accounting runs ~10-15% above this simple model (semaphores, alignment —
# measured: a launch this model priced at 15.7 MB was billed 17.4 MB), and
# (b) the launch shares the scoped stack with whatever XLA overlaps around
# it inside a large program (async copies feeding the operands). A 12.5 MB
# model target keeps the billed figure ~14 MB with headroom for both — the
# round-5 full-driver dedup train step OOM'd at the old 10 MB-blocks +
# 4.5 MB-state split, which priced blocks and state separately, ignored the
# f32 lane padding of narrow windows (d=200 -> 256 lanes), and did not count
# the constant (Wx/Wh/b) windows at all.
_SCOPED_BUDGET = 12_500_000
_MAX_SEG_ROWS = 4096     # cap on rows of (h, c) state scratch per segment


def _cell_math(gates, c, hdim: int, forget_bias: float):
    i = gates[:, :hdim]
    j = gates[:, hdim : 2 * hdim]
    f = gates[:, 2 * hdim : 3 * hdim]
    o = gates[:, 3 * hdim :]
    nc = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
    nh = jnp.tanh(nc) * jax.nn.sigmoid(o)
    return nc, nh


def _fwd_step_kernel(x_ref, len_ref, wx_ref, wh_ref, b_ref, *refs,
                     seq_len: int, forget_bias: float,
                     emit_out: bool, emit_cell: bool):
    """One grid cell = one (group, segment, step, batch-tile)."""
    idx = 0
    out_ref = cell_ref = None
    if emit_out:
        out_ref = refs[idx]
        idx += 1
    fin_ref = refs[idx]
    idx += 1
    if emit_cell:
        cell_ref = refs[idx]
        idx += 1
    h_scr, c_scr = refs[idx], refs[idx + 1]

    t = pl.program_id(2)
    i = pl.program_id(3)
    bb = x_ref.shape[2]
    hdim = h_scr.shape[-1]
    rows = pl.ds(i * bb, bb)

    @pl.when(t == 0)
    def _init():
        h_scr[rows] = jnp.zeros((bb, hdim), jnp.float32)
        c_scr[rows] = jnp.zeros((bb, hdim), jnp.float32)

    h = h_scr[rows]
    c = c_scr[rows]
    gates = (jnp.dot(x_ref[0, 0], wx_ref[0], preferred_element_type=jnp.float32)
             + jnp.dot(h, wh_ref[0], preferred_element_type=jnp.float32)
             + b_ref[0])
    nc, nh = _cell_math(gates, c, hdim, forget_bias)
    m = (t < len_ref[0]).astype(jnp.float32)          # [bb, 1]
    new_h = m * nh + (1.0 - m) * h
    new_c = m * nc + (1.0 - m) * c
    h_scr[rows] = new_h
    c_scr[rows] = new_c
    if emit_out:
        out_ref[0, 0] = m * nh
    if emit_cell:
        cell_ref[0, 0] = new_c
    # fin block is flushed after every visit; the t = T-1 write is the final one
    fin_ref[0] = new_h


def _bwd_step_kernel(x_ref, len_ref, wx_ref, wh_ref, b_ref, wht_ref,
                     hprev_ref, cell_ref, cprev_ref, gout_ref, gfin_ref,
                     dg_ref, dh_scr, dc_scr, *, seq_len: int, forget_bias: float):
    """Reverse-time step cell producing gate cotangents (TF1 cell; prefix masks).

    hprev/cprev are the t-1 blocks of the stored state sequences (clamped index
    maps; zeroed in-kernel at t=0). Recomputes gate pre-activations — two large
    matmuls — instead of storing them."""
    ti = pl.program_id(2)                  # 0 .. T-1, walking time DOWN
    i = pl.program_id(3)
    t = seq_len - 1 - ti
    bb = x_ref.shape[2]
    hdim = dh_scr.shape[-1]
    rows = pl.ds(i * bb, bb)

    @pl.when(ti == 0)
    def _init():
        dh_scr[rows] = jnp.zeros((bb, hdim), jnp.float32)
        dc_scr[rows] = jnp.zeros((bb, hdim), jnp.float32)

    nz = (t > 0).astype(jnp.float32)
    h_prev = nz * hprev_ref[0, 0]
    c_prev = nz * cprev_ref[0, 0]
    c_t = cell_ref[0, 0]

    gates = (jnp.dot(x_ref[0, 0], wx_ref[0], preferred_element_type=jnp.float32)
             + jnp.dot(h_prev, wh_ref[0], preferred_element_type=jnp.float32)
             + b_ref[0])
    i_s = jax.nn.sigmoid(gates[:, :hdim])
    j_t = jnp.tanh(gates[:, hdim : 2 * hdim])
    f_s = jax.nn.sigmoid(gates[:, 2 * hdim : 3 * hdim] + forget_bias)
    o_s = jax.nn.sigmoid(gates[:, 3 * hdim :])
    tanh_nc = jnp.tanh(c_t)

    lengths = len_ref[0]                                  # [bb, 1]
    m = (t < lengths).astype(jnp.float32)
    is_last = (t == lengths - 1).astype(jnp.float32)
    dh_in = dh_scr[rows] + m * gout_ref[0, 0] + is_last * gfin_ref[0]
    dc_in = dc_scr[rows]

    dnh = m * dh_in
    dnc_total = m * dc_in + dnh * o_s * (1.0 - tanh_nc * tanh_nc)
    do = dnh * tanh_nc * o_s * (1.0 - o_s)
    di = dnc_total * j_t * i_s * (1.0 - i_s)
    dj = dnc_total * i_s * (1.0 - j_t * j_t)
    df = dnc_total * c_prev * f_s * (1.0 - f_s)
    dgates = jnp.concatenate([di, dj, df, do], axis=-1)   # [bb, 4Hp]
    dg_ref[0, 0] = dgates

    dh_scr[rows] = (jnp.dot(dgates, wht_ref[0], preferred_element_type=jnp.float32)
                    + (1.0 - m) * dh_in)
    dc_scr[rows] = dnc_total * f_s + (1.0 - m) * dc_in


def _tiling(n: int, widths: list[int], hp: int,
            const_bytes: int) -> tuple[int, int, int, int]:
    """(bb, nb, nseg, n_pad): batch tile, tiles/segment, segments, padded rows.

    widths = per-row f32 window widths of every blocked operand AND output
    (each padded here to the 128-lane tile, so a d=200 x block is priced at
    its physical 256 lanes); the pipeline holds ~2 buffers of each. The
    (h, c) state scratch adds 2*hp f32 per segment row, and const_bytes is
    the one-copy size of the constant (weight) windows, double-buffered.

    Two objectives, in order: (1) fit _SCOPED_BUDGET — blocks, state, and
    constants priced together, not from separate pools; (2) among fitting
    tile sizes, MINIMIZE phantom rows. n_pad = nseg*nb*bb rounds n up, and
    the old budget-only bb choice could pad brutally (measured: the bs=64
    photo-title backward ran 3,360 padded rows for 2,688 real ones, +25%
    phantom scan work). A descending search over bb candidates with nb
    rebalanced per segment count finds the largest tile that both fits and
    wastes the least.
    """
    budget = _SCOPED_BUDGET - 2 * const_bytes
    wsum = sum(_round_up(w, 128) for w in widths)
    # At wide hidden/input dims the doubled constant (weight) windows alone
    # can exceed the budget, driving it negative; the search below would then
    # silently return a bb=8 launch whose constants cannot fit — a
    # compile-time scoped-VMEM OOM with no error from the sizing logic.
    # Refuse with an actionable message instead (the XLA scan path
    # (ops.lstm_ref, use_pallas=False) has no such limit).
    min_need = 8 * wsum * 8 + 8 * hp * 8  # bb=8 blocks + one 8-row state seg
    if budget < min_need:
        raise ValueError(
            f"fused LSTM tiling cannot fit scoped VMEM: constant windows "
            f"need {2 * const_bytes} B doubled + {min_need} B minimum "
            f"blocks/state of the {_SCOPED_BUDGET} B budget (hp={hp}, "
            f"widths={widths}). This hidden/input width is beyond the fused "
            f"kernel; use the XLA scan path (use_pallas=False).")
    # largest bb leaving >= 1/3 of the budget for state scratch
    bb_max = max(8, min(1024, budget * 2 // 3 // (8 * wsum) // 8 * 8))
    bb_max = min(bb_max, _round_up(n, 8))
    best = None
    bb = bb_max
    while bb >= max(8, bb_max - 256):
        state_budget = budget - 8 * wsum * bb
        rows_cap = min(_MAX_SEG_ROWS,
                       max(bb, state_budget // (8 * hp) // 8 * 8))
        nb_cap = max(1, rows_cap // bb)
        n_tiles = -(-_round_up(n, 8) // bb)
        nseg = -(-n_tiles // nb_cap)
        nb = -(-n_tiles // nseg)          # rebalance: don't pad to full segments
        phantom = nseg * nb * bb - n
        cand = (phantom, -bb, bb, nb, nseg)
        if best is None or cand < best:
            best = cand
        if phantom < 8:                   # cannot beat sub-tile padding
            break
        bb -= 8
    _, _, bb, nb, nseg = best
    return bb, nb, nseg, nseg * nb * bb


def _fused_scan(x_t, lens3, wx, wh, b, forget_bias, emit_out, emit_cell, interpret):
    """x_t [G, T, B, D] (time-major), lens3 [G, B, 1], wx [G, D, 4Hp],
    wh [G, Hp, 4Hp], b [G, 1, 4Hp] → [out [G,T,B,Hp],] fin [G,B,Hp] [, cell]."""
    g, t, n, d = x_t.shape
    hp = wh.shape[1]
    g4 = wh.shape[2]
    # blocked windows: x, lengths, [out,] fin, [cell]; consts: wx, wh, b
    widths = [d, 1, hp] + [hp] * (emit_out + emit_cell)
    const_bytes = 4 * (d * g4 + hp * g4 + 8 * g4)
    bb, nb, nseg, n_pad = _tiling(n, widths, hp, const_bytes)
    if n_pad != n:
        x_t = jnp.pad(x_t, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
        lens3 = jnp.pad(lens3, ((0, 0), (0, n_pad - n), (0, 0)))

    kernel = functools.partial(_fwd_step_kernel, seq_len=t, forget_bias=forget_bias,
                               emit_out=emit_out, emit_cell=emit_cell)
    row_ix = lambda gi, si, ti, ii: (gi, ti, si * nb + ii, 0)
    seq_blk = lambda w: pl.BlockSpec((1, 1, bb, w), row_ix, memory_space=pltpu.VMEM)
    const_blk = lambda a, bdim: pl.BlockSpec(
        (1,) + a.shape[1:], lambda gi, si, ti, ii: (gi,) + (0,) * bdim,
        memory_space=pltpu.VMEM)

    out_specs, out_shape = [], []
    if emit_out:
        out_specs.append(seq_blk(hp))
        out_shape.append(jax.ShapeDtypeStruct((g, t, n_pad, hp), jnp.float32))
    out_specs.append(pl.BlockSpec((1, bb, hp),
                                  lambda gi, si, ti, ii: (gi, si * nb + ii, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((g, n_pad, hp), jnp.float32))
    if emit_cell:
        out_specs.append(seq_blk(hp))
        out_shape.append(jax.ShapeDtypeStruct((g, t, n_pad, hp), jnp.float32))

    res = pl.pallas_call(
        kernel,
        grid=(g, nseg, t, nb),
        in_specs=[
            seq_blk(d),
            pl.BlockSpec((1, bb, 1), lambda gi, si, ti, ii: (gi, si * nb + ii, 0),
                         memory_space=pltpu.VMEM),
            const_blk(wx, 2),
            const_blk(wh, 2),
            const_blk(b, 2),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nb * bb, hp), jnp.float32),   # h state (one segment)
            pltpu.VMEM((nb * bb, hp), jnp.float32),   # c state
        ],
        interpret=interpret,
    )(x_t, lens3, wx, wh, b)
    return [r[:, :, :n] if r.ndim == 4 else r[:, :n] for r in res]


def _fused_scan_bwd(x_t, lens3, wx, wh, b, hall, cell, gout, gfin,
                    forget_bias, interpret):
    """→ dgates [G, T, B, 4Hp]."""
    g, t, n, d = x_t.shape
    hp = wh.shape[1]
    g4 = wh.shape[2]
    # blocked windows: x, lengths, h_{t-1}, c_t, c_{t-1}, g_out, g_fin,
    # dgates (out); consts: wx, wh, b, wht — this launch is the scoped-VMEM
    # heavyweight (the round-5 OOM was here: see _SCOPED_BUDGET)
    widths = [d, 1, hp, hp, hp, hp, hp, g4]
    const_bytes = 4 * (d * g4 + hp * g4 + 8 * g4 + g4 * hp)
    bb, nb, nseg, n_pad = _tiling(n, widths, hp, const_bytes)
    if n_pad != n:
        pad4 = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        x_t = jnp.pad(x_t, pad4)
        hall = jnp.pad(hall, pad4)
        cell = jnp.pad(cell, pad4)
        gout = jnp.pad(gout, pad4)
        gfin = jnp.pad(gfin, ((0, 0), (0, n_pad - n), (0, 0)))
        lens3 = jnp.pad(lens3, ((0, 0), (0, n_pad - n), (0, 0)))
    wht = jnp.swapaxes(wh, 1, 2)                          # [G, 4Hp, Hp]

    kernel = functools.partial(_bwd_step_kernel, seq_len=t, forget_bias=forget_bias)
    rev_ix = lambda gi, si, ti, ii: (gi, t - 1 - ti, si * nb + ii, 0)
    prev_ix = lambda gi, si, ti, ii: (gi, jnp.maximum(t - 2 - ti, 0),
                                      si * nb + ii, 0)
    rev_blk = lambda w, ix: pl.BlockSpec((1, 1, bb, w), ix, memory_space=pltpu.VMEM)
    row_blk = lambda w: pl.BlockSpec((1, bb, w),
                                     lambda gi, si, ti, ii: (gi, si * nb + ii, 0),
                                     memory_space=pltpu.VMEM)
    const_blk = lambda a: pl.BlockSpec(
        (1,) + a.shape[1:], lambda gi, si, ti, ii: (gi, 0, 0),
        memory_space=pltpu.VMEM)

    dg = pl.pallas_call(
        kernel,
        grid=(g, nseg, t, nb),
        in_specs=[
            rev_blk(d, rev_ix),          # x[t]
            row_blk(1),                  # lengths
            const_blk(wx),
            const_blk(wh),
            const_blk(b),
            const_blk(wht),
            rev_blk(hp, prev_ix),        # h_{t-1}
            rev_blk(hp, rev_ix),         # c_t
            rev_blk(hp, prev_ix),        # c_{t-1}
            rev_blk(hp, rev_ix),         # g_out[t]
            row_blk(hp),                 # g_fin
        ],
        out_specs=[rev_blk(g4, rev_ix)],
        out_shape=[jax.ShapeDtypeStruct((g, t, n_pad, g4), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((nb * bb, hp), jnp.float32),
            pltpu.VMEM((nb * bb, hp), jnp.float32),
        ],
        interpret=interpret,
    )(x_t, lens3, wx, wh, b, wht, hall, cell, cell, gout, gfin)
    return dg[0][:, :, :n]


# ---------------------------------------------------------------------------
# Public bi-LSTM entry points
# ---------------------------------------------------------------------------


def _prep(params_fw: LSTMParams, params_bw: LSTMParams, x, mask):
    h = params_fw.wh.shape[0]
    hp = _round_up(h, 128)
    lengths = mask.sum(axis=1).astype(jnp.int32)
    x_rev = _flip_to_front(x, lengths)
    wxf, whf, bf = _pad_gates(params_fw, hp)
    wxb, whb, bb_ = _pad_gates(params_bw, hp)
    x_t = jnp.stack([jnp.swapaxes(x, 0, 1), jnp.swapaxes(x_rev, 0, 1)])  # [2,T,N,D]
    wx = jnp.stack([wxf, wxb])
    wh = jnp.stack([whf, whb])
    b = jnp.stack([bf, bb_])[:, None, :]
    lens3 = jnp.broadcast_to(lengths[None, :, None], (2, x.shape[0], 1))
    return x_t, lens3, wx, wh, b, lengths, h, hp


def _unpad_gate_cols(a, h: int, hp: int):
    """[..., 4Hp] → [..., 4H]: drop the per-gate alignment padding."""
    return jnp.concatenate([a[..., g * hp : g * hp + h] for g in range(4)], axis=-1)


def _assemble_bwd(params_fw, params_bw, x, mask, hall, cell, g_out, g_fin,
                  forget_bias, interpret):
    """Shared backward: fused dgates kernel + outside MXU contractions.

    hall holds the per-direction output sequences in kernel layout [2, T, N, Hp]
    — under prefix masks hall[t-1] IS the carried h state; cell holds the
    carried c. Wx/Wh/dx contractions run as XLA einsums on dgates."""
    if interpret is None:
        interpret = not _on_tpu()
    x_t, lens3, wx, wh, b, lengths, h, hp = _prep(params_fw, params_bw, x, mask)
    n, t, d = x.shape

    if g_out is None:
        gout = jnp.zeros((2, t, n, hp), jnp.float32)
    else:
        g_fw, g_bw = g_out[..., :h], g_out[..., h:]
        g_bw_rev = _flip_to_front(g_bw, lengths)  # involutive permutation
        gout = jnp.stack([jnp.swapaxes(g_fw, 0, 1), jnp.swapaxes(g_bw_rev, 0, 1)])
        gout = jnp.pad(gout, ((0, 0), (0, 0), (0, 0), (0, hp - h)))
    gfin = jnp.stack([g_fin[..., :h], g_fin[..., h:]])
    gfin = jnp.pad(gfin, ((0, 0), (0, 0), (0, hp - h)))

    dg = _fused_scan_bwd(x_t, lens3, wx, wh, b, hall, cell, gout, gfin,
                         forget_bias, interpret)                    # [2,T,N,4Hp]

    # Heavy contractions on the MXU, outside the kernel:
    dx_g = jnp.einsum("gtbk,gdk->gtbd", dg, wx)                     # [2,T,N,D]
    dx = jnp.swapaxes(dx_g[0], 0, 1) + _flip_to_front(
        jnp.swapaxes(dx_g[1], 0, 1), lengths)
    h_prev = jnp.concatenate([jnp.zeros_like(hall[:, :1]), hall[:, :-1]], axis=1)
    dwx = jnp.einsum("gtbd,gtbk->gdk", x_t, dg)                     # [2,D,4Hp]
    dwh = jnp.einsum("gtbh,gtbk->ghk", h_prev, dg)                  # [2,Hp,4Hp]
    db = dg.sum(axis=(1, 2))                                        # [2,4Hp]

    def unpack(gi):
        return LSTMParams(
            wx=_unpad_gate_cols(dwx[gi], h, hp),
            wh=_unpad_gate_cols(dwh[gi, :h], h, hp),
            b=_unpad_gate_cols(db[gi], h, hp),
        )

    return unpack(0), unpack(1), dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def bilstm_fused(params_fw: LSTMParams, params_bw: LSTMParams, x: jnp.ndarray,
                 mask: jnp.ndarray, forget_bias: float = 1.0,
                 interpret: bool | None = None):
    """Fused bi-LSTM encode: (outputs [N, T, 2H], final [N, 2H]).

    Contract identical to ops/lstm_ref.bilstm_ref (TF1 numerics, zero-padded
    outputs past each row's length); mask must be a contiguous prefix
    (pack-time invariant)."""
    itp = interpret if interpret is not None else not _on_tpu()
    x_t, lens3, wx, wh, b, lengths, h, hp = _prep(params_fw, params_bw, x, mask)
    out, fin = _fused_scan(x_t, lens3, wx, wh, b, forget_bias,
                           emit_out=True, emit_cell=False, interpret=itp)
    out_fw = jnp.swapaxes(out[0], 0, 1)[:, :, :h]
    out_bw = _flip_to_front(jnp.swapaxes(out[1], 0, 1), lengths)[:, :, :h]
    return (jnp.concatenate([out_fw, out_bw], axis=-1),
            jnp.concatenate([fin[0, :, :h], fin[1, :, :h]], axis=-1))


def _bilstm_fused_fwd(params_fw, params_bw, x, mask, forget_bias, interpret):
    itp = interpret if interpret is not None else not _on_tpu()
    x_t, lens3, wx, wh, b, lengths, h, hp = _prep(params_fw, params_bw, x, mask)
    hall, fin, cell = _fused_scan(x_t, lens3, wx, wh, b, forget_bias,
                                  emit_out=True, emit_cell=True, interpret=itp)
    out_fw = jnp.swapaxes(hall[0], 0, 1)[:, :, :h]
    out_bw = _flip_to_front(jnp.swapaxes(hall[1], 0, 1), lengths)[:, :, :h]
    prim = (jnp.concatenate([out_fw, out_bw], axis=-1),
            jnp.concatenate([fin[0, :, :h], fin[1, :, :h]], axis=-1))
    return prim, (params_fw, params_bw, x, mask, hall, cell)


def _bilstm_fused_bwd(forget_bias, interpret, res, g):
    params_fw, params_bw, x, mask, hall, cell = res
    g_out, g_fin = g
    dpf, dpb, dx = _assemble_bwd(params_fw, params_bw, x, mask, hall, cell,
                                 g_out, g_fin, forget_bias, interpret)
    return dpf, dpb, dx, jnp.zeros(mask.shape, dtype=jax.dtypes.float0)


bilstm_fused.defvjp(_bilstm_fused_fwd, _bilstm_fused_bwd)


def _prep_group(params_pairs, xs, masks):
    """K bi-LSTMs over a SHARED batch (one per context modality) → one G=2K
    stack, time-padded to the longest sequence and feature-padded to the widest
    input (zero x columns + zero Wx rows leave the gates unchanged). All xs
    share the leading batch dim N."""
    h = params_pairs[0][0].wh.shape[0]
    hs = {p.wh.shape[0] for pair in params_pairs for p in pair}
    if hs != {h}:  # padding only equalizes T and D; H must match across the group
        raise ValueError(f"grouped bi-LSTMs must share hidden_dim, got {sorted(hs)}")
    hp = _round_up(h, 128)
    t_max = max(x.shape[1] for x in xs)
    d_max = max(x.shape[2] for x in xs)
    xts, wxs, whs, bs, lens = [], [], [], [], []
    for (p_fw, p_bw), x, mask in zip(params_pairs, xs, masks):
        x = jnp.pad(x, ((0, 0), (0, t_max - x.shape[1]), (0, d_max - x.shape[2])))
        mask = jnp.pad(mask, ((0, 0), (0, t_max - mask.shape[1])))
        lengths = mask.sum(axis=1).astype(jnp.int32)
        x_rev = _flip_to_front(x, lengths)
        for p, xx in ((p_fw, x), (p_bw, x_rev)):
            wx2, wh2, b2 = _pad_gates(p, hp)
            wx2 = jnp.pad(wx2, ((0, d_max - wx2.shape[0]), (0, 0)))
            xts.append(jnp.swapaxes(xx, 0, 1))
            wxs.append(wx2)
            whs.append(wh2)
            bs.append(b2)
            lens.append(lengths)
    n = xs[0].shape[0]
    return (jnp.stack(xts), jnp.broadcast_to(jnp.stack(lens)[:, :, None],
                                             (len(xts), n, 1)),
            jnp.stack(wxs), jnp.stack(whs), jnp.stack(bs)[:, None, :], h, hp, t_max)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bilstm_fused_grouped(params_pairs, xs, masks, forget_bias: float = 1.0,
                         interpret: bool | None = None):
    """K independent bi-LSTM encodes over a shared batch in ONE kernel launch
    (G = 2K grid groups): the per-modality time encoders of the flagship model
    (photo, photo_title, album_title, album_desc, when, where) as a single
    launch instead of six — kernel-launch overhead amortized and the grid kept
    busy. params_pairs: tuple of (p_fw, p_bw); xs: tuple of [N, T_k, D]; masks:
    tuple of [N, T_k]. Returns tuple of (out [N, T_k, 2H], fin [N, 2H])."""
    itp = interpret if interpret is not None else not _on_tpu()
    x_t, lens3, wx, wh, b, h, hp, t_max = _prep_group(params_pairs, xs, masks)
    out, fin = _fused_scan(x_t, lens3, wx, wh, b, forget_bias,
                           emit_out=True, emit_cell=False, interpret=itp)
    res = []
    for k, (x, mask) in enumerate(zip(xs, masks)):
        lengths = mask.sum(axis=1).astype(jnp.int32)
        o_fw = jnp.swapaxes(out[2 * k], 0, 1)[:, : x.shape[1], :h]
        o_bw = _flip_to_front(jnp.swapaxes(out[2 * k + 1], 0, 1),
                              lengths)[:, : x.shape[1], :h]
        res.append((jnp.concatenate([o_fw, o_bw], axis=-1),
                    jnp.concatenate([fin[2 * k, :, :h], fin[2 * k + 1, :, :h]],
                                    axis=-1)))
    return tuple(res)


def _grouped_fwd(params_pairs, xs, masks, forget_bias, interpret):
    itp = interpret if interpret is not None else not _on_tpu()
    x_t, lens3, wx, wh, b, h, hp, t_max = _prep_group(params_pairs, xs, masks)
    hall, fin, cell = _fused_scan(x_t, lens3, wx, wh, b, forget_bias,
                                  emit_out=True, emit_cell=True, interpret=itp)
    res = []
    for k, (x, mask) in enumerate(zip(xs, masks)):
        lengths = mask.sum(axis=1).astype(jnp.int32)
        o_fw = jnp.swapaxes(hall[2 * k], 0, 1)[:, : x.shape[1], :h]
        o_bw = _flip_to_front(jnp.swapaxes(hall[2 * k + 1], 0, 1),
                              lengths)[:, : x.shape[1], :h]
        res.append((jnp.concatenate([o_fw, o_bw], axis=-1),
                    jnp.concatenate([fin[2 * k, :, :h], fin[2 * k + 1, :, :h]],
                                    axis=-1)))
    return tuple(res), (params_pairs, xs, masks, hall, cell)


def _grouped_bwd(forget_bias, interpret, res, g):
    """Backward for the grouped launch: one fused dgates kernel over all 2K
    groups, then the dX/dWx/dWh einsums, unpacked per modality."""
    params_pairs, xs, masks, hall, cell = res
    if interpret is None:
        interpret = not _on_tpu()
    x_t, lens3, wx, wh, b, h, hp, t_max = _prep_group(params_pairs, xs, masks)
    n = xs[0].shape[0]
    g2k = x_t.shape[0]

    gout = jnp.zeros((g2k, t_max, n, hp), jnp.float32)
    gfin = jnp.zeros((g2k, n, hp), jnp.float32)
    for k, (x, mask) in enumerate(zip(xs, masks)):
        g_out_k, g_fin_k = g[k]
        lengths = mask.sum(axis=1).astype(jnp.int32)
        pad_t = t_max - x.shape[1]
        g_out_k = jnp.pad(g_out_k, ((0, 0), (0, pad_t), (0, 0)))
        g_fw, g_bw = g_out_k[..., :h], g_out_k[..., h:]
        g_bw_rev = _flip_to_front(g_bw, lengths)
        gout = gout.at[2 * k].set(
            jnp.pad(jnp.swapaxes(g_fw, 0, 1), ((0, 0), (0, 0), (0, hp - h))))
        gout = gout.at[2 * k + 1].set(
            jnp.pad(jnp.swapaxes(g_bw_rev, 0, 1), ((0, 0), (0, 0), (0, hp - h))))
        gfin = gfin.at[2 * k].set(jnp.pad(g_fin_k[..., :h], ((0, 0), (0, hp - h))))
        gfin = gfin.at[2 * k + 1].set(jnp.pad(g_fin_k[..., h:], ((0, 0), (0, hp - h))))

    dg = _fused_scan_bwd(x_t, lens3, wx, wh, b, hall, cell, gout, gfin,
                         forget_bias, interpret)

    dx_g = jnp.einsum("gtbk,gdk->gtbd", dg, wx)
    h_prev = jnp.concatenate([jnp.zeros_like(hall[:, :1]), hall[:, :-1]], axis=1)
    dwx = jnp.einsum("gtbd,gtbk->gdk", x_t, dg)
    dwh = jnp.einsum("gtbh,gtbk->ghk", h_prev, dg)
    db = dg.sum(axis=(1, 2))

    def unpack(gi, d_k):
        return LSTMParams(
            wx=_unpad_gate_cols(dwx[gi, :d_k], h, hp),
            wh=_unpad_gate_cols(dwh[gi, :h], h, hp),
            b=_unpad_gate_cols(db[gi], h, hp),
        )

    dparams, dxs, dmasks = [], [], []
    for k, (x, mask) in enumerate(zip(xs, masks)):
        lengths = mask.sum(axis=1).astype(jnp.int32)
        dx = (jnp.swapaxes(dx_g[2 * k], 0, 1)
              + _flip_to_front(jnp.swapaxes(dx_g[2 * k + 1], 0, 1), lengths))
        dparams.append((unpack(2 * k, x.shape[2]), unpack(2 * k + 1, x.shape[2])))
        dxs.append(dx[:, : x.shape[1], : x.shape[2]])
        dmasks.append(jnp.zeros(mask.shape, dtype=jax.dtypes.float0))
    return tuple(dparams), tuple(dxs), tuple(dmasks)


bilstm_fused_grouped.defvjp(_grouped_fwd, _grouped_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def bilstm_fused_final(params_fw: LSTMParams, params_bw: LSTMParams,
                       x: jnp.ndarray, mask: jnp.ndarray,
                       forget_bias: float = 1.0, interpret: bool | None = None):
    """Final-state-only fused bi-LSTM: returns fin [N, 2H] and (at inference)
    writes NO per-step outputs to HBM — the fast path for summary consumers
    (photo titles, answer candidates). Gradients are exact: the vjp forward
    stores the state sequences the backward scan needs."""
    itp = interpret if interpret is not None else not _on_tpu()
    x_t, lens3, wx, wh, b, lengths, h, hp = _prep(params_fw, params_bw, x, mask)
    (fin,) = _fused_scan(x_t, lens3, wx, wh, b, forget_bias,
                         emit_out=False, emit_cell=False, interpret=itp)
    return jnp.concatenate([fin[0, :, :h], fin[1, :, :h]], axis=-1)


def _bilstm_final_fwd(params_fw, params_bw, x, mask, forget_bias, interpret):
    itp = interpret if interpret is not None else not _on_tpu()
    x_t, lens3, wx, wh, b, lengths, h, hp = _prep(params_fw, params_bw, x, mask)
    hall, fin, cell = _fused_scan(x_t, lens3, wx, wh, b, forget_bias,
                                  emit_out=True, emit_cell=True, interpret=itp)
    prim = jnp.concatenate([fin[0, :, :h], fin[1, :, :h]], axis=-1)
    return prim, (params_fw, params_bw, x, mask, hall, cell)


def _bilstm_final_bwd(forget_bias, interpret, res, g_fin):
    params_fw, params_bw, x, mask, hall, cell = res
    dpf, dpb, dx = _assemble_bwd(params_fw, params_bw, x, mask, hall, cell,
                                 None, g_fin, forget_bias, interpret)
    return dpf, dpb, dx, jnp.zeros(mask.shape, dtype=jax.dtypes.float0)


bilstm_fused_final.defvjp(_bilstm_final_fwd, _bilstm_final_bwd)
