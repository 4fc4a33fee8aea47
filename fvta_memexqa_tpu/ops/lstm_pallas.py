"""Pallas fused LSTM recurrence (SURVEY.md section 7 step 4; BASELINE.json north
star: "per-modality bidirectional LSTM encoders ... rewritten as a Pallas fused scan").

Structure (see /opt/skills/guides/pallas_guide.md for the kernel model):
- The input projection x @ Wx + b for ALL timesteps stays OUTSIDE the kernel as one
  large MXU matmul (it has no sequential dependence).
- The kernel owns only the sequential part: for t in 0..T, gates = x_proj[t] + h @ Wh,
  TF1 BasicLSTMCell activations, masked state update. h and c live in VMEM scratch for
  the whole scan — zero HBM round-trips between steps, one kernel launch per scan
  (vs. lax.scan's per-step XLA op dispatch).
- Grid over batch tiles (time-major layout so the per-step slice is a leading-dim
  dynamic index). Batch is padded to the tile size outside.

Backward: custom_vjp whose bwd rematerializes through the lax.scan reference
implementation (ops/lstm_ref.py) — numerically identical cell, so gradients are exact;
the Pallas forward and the ref forward agree to float tolerance (parity-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fvta_memexqa_tpu.ops.lstm_ref import LSTMParams, lstm_scan_ref, _flip_to_front


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _grouped_kernel(xp_ref, len_ref, wh_ref, out_ref, fin_ref, h_scr, c_scr, *,
                    seq_len: int, forget_bias: float):
    """One grid cell = one (group, batch-tile); the group grid dim selects which
    scan's tensors this cell sees. Sequence masking is derived in-kernel from
    LENGTHS (t < len) — masks are contiguous prefixes by construction (pack-time
    padding), and a lengths tensor shaped [G, B, 1] avoids blocking any array's
    lane dimension by the batch tile (a Mosaic 128-multiple constraint)."""
    h_scr[:] = jnp.zeros_like(h_scr)
    c_scr[:] = jnp.zeros_like(c_scr)
    hdim = h_scr.shape[-1]
    lengths = len_ref[0]                       # [bb, 1] i32

    def step(t, _):
        h = h_scr[:]
        c = c_scr[:]
        gates = xp_ref[0, t] + jnp.dot(h, wh_ref[0], preferred_element_type=jnp.float32)
        i = gates[:, :hdim]
        j = gates[:, hdim : 2 * hdim]
        f = gates[:, 2 * hdim : 3 * hdim]
        o = gates[:, 3 * hdim :]
        nc = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
        nh = jnp.tanh(nc) * jax.nn.sigmoid(o)
        m = (t < lengths).astype(jnp.float32)  # [bb, 1]
        h_scr[:] = m * nh + (1.0 - m) * h
        c_scr[:] = m * nc + (1.0 - m) * c
        out_ref[0, t] = m * nh
        return 0

    jax.lax.fori_loop(0, seq_len, step, 0)
    fin_ref[0] = h_scr[:]


def _pallas_scan(x_proj_t: jnp.ndarray, lengths: jnp.ndarray, wh: jnp.ndarray,
                 forget_bias: float, block_b: int, interpret: bool):
    """Grouped fused scan: G independent scans in ONE kernel launch.

    x_proj_t [G, T, B, 4H], lengths i32 [G, B, 1], wh [G, H, 4H]
      → (out [G, T, B, H], fin [G, B, H]).
    B must be a multiple of block_b. Used with G=2 for the fw/bw pair of a bi-LSTM
    (one launch per bi-encode instead of two); grid = (G, B/block_b).
    """
    g, t, b, g4 = x_proj_t.shape
    hdim = wh.shape[1]
    nb = b // block_b
    kernel = functools.partial(_grouped_kernel, seq_len=t, forget_bias=forget_bias)
    return pl.pallas_call(
        kernel,
        grid=(g, nb),
        in_specs=[
            pl.BlockSpec((1, t, block_b, g4), lambda gi, i: (gi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, 1), lambda gi, i: (gi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim, g4), lambda gi, i: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, block_b, hdim), lambda gi, i: (gi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, hdim), lambda gi, i: (gi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, t, b, hdim), jnp.float32),
            jax.ShapeDtypeStruct((g, b, hdim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, hdim), jnp.float32),
            pltpu.VMEM((block_b, hdim), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj_t, lengths, wh)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Streaming variant: x_proj stays in HBM and is DMA'd per (step, batch-tile) with
# double buffering; outputs are DMA'd back the same way. XLA's lax.scan
# materializes gates/x_proj slices through HBM every step (~4x the fundamental
# traffic); this kernel's HBM traffic is exactly read-x_proj-once +
# write-outputs-once, which is what makes it faster on the word-level encoders
# (the flagship model's dominant cost). Pattern: pallas_guide.md "Double Buffering".
# ---------------------------------------------------------------------------


def _stream_kernel(xp_hbm, len_ref, wh_ref, out_hbm, fin_ref,
                   xbuf, obuf, h_scr, c_scr, in_sem, out_sem, *,
                   seq_len: int, forget_bias: float, block_b: int):
    gi = pl.program_id(0)
    bi = pl.program_id(1)
    hdim = h_scr.shape[-1]
    bsl = pl.ds(bi * block_b, block_b)
    h_scr[:] = jnp.zeros_like(h_scr)
    c_scr[:] = jnp.zeros_like(c_scr)
    lengths = len_ref[0]

    # x_proj/outputs are TIME-major in HBM ([G, T, B, .]): the tiled (sublane,
    # lane) dims are (B, 4Hp), so slicing one t is layout-aligned. (Batch-major
    # would put T on the sublane-tiled dim, where 1-element slices are illegal.)
    def in_dma(slot, t):
        return pltpu.make_async_copy(
            xp_hbm.at[gi, t, bsl, :], xbuf.at[slot, :, 0, :], in_sem.at[slot])

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            obuf.at[slot, :, 0, :], out_hbm.at[gi, t, bsl, :], out_sem.at[slot])

    in_dma(0, 0).start()

    def step(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < seq_len)
        def _prefetch():
            in_dma(nxt, t + 1).start()

        in_dma(slot, t).wait()
        h = h_scr[:]
        c = c_scr[:]
        gates = xbuf[slot, :, 0, :] + jnp.dot(h, wh_ref[0],
                                              preferred_element_type=jnp.float32)
        i = gates[:, :hdim]
        j = gates[:, hdim : 2 * hdim]
        f = gates[:, 2 * hdim : 3 * hdim]
        o = gates[:, 3 * hdim :]
        nc = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
        nh = jnp.tanh(nc) * jax.nn.sigmoid(o)
        m = (t < lengths).astype(jnp.float32)
        h_scr[:] = m * nh + (1.0 - m) * h
        c_scr[:] = m * nc + (1.0 - m) * c

        # wait for this slot's previous output DMA (t-2) before overwriting
        @pl.when(t >= 2)
        def _drain():
            out_dma(slot, t - 2).wait()

        obuf[slot, :, 0, :] = m * nh
        out_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, seq_len, step, 0)
    out_dma((seq_len - 1) % 2, seq_len - 1).wait()

    @pl.when(seq_len >= 2)
    def _():
        out_dma(seq_len % 2, seq_len - 2).wait()

    fin_ref[0] = h_scr[:]


def _pallas_scan_stream(x_proj_bm: jnp.ndarray, lengths: jnp.ndarray, wh: jnp.ndarray,
                        forget_bias: float, block_b: int, interpret: bool):
    """Streaming grouped scan (time-major like _pallas_scan).

    x_proj_bm [G, T, B, 4H], lengths i32 [G, B, 1], wh [G, H, 4H]
      → (out [G, T, B, H], fin [G, B, H]).
    """
    g, t, b, g4 = x_proj_bm.shape
    hdim = wh.shape[1]
    nb = b // block_b
    kernel = functools.partial(_stream_kernel, seq_len=t, forget_bias=forget_bias,
                               block_b=block_b)
    return pl.pallas_call(
        kernel,
        grid=(g, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),           # xp stays in HBM
            pl.BlockSpec((1, block_b, 1), lambda gi, i: (gi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim, g4), lambda gi, i: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),           # out written via DMA
            pl.BlockSpec((1, block_b, hdim), lambda gi, i: (gi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, t, b, hdim), jnp.float32),
            jax.ShapeDtypeStruct((g, b, hdim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_b, 1, g4), jnp.float32),   # xbuf (double)
            pltpu.VMEM((2, block_b, 1, hdim), jnp.float32), # obuf (double)
            pltpu.VMEM((block_b, hdim), jnp.float32),       # h
            pltpu.VMEM((block_b, hdim), jnp.float32),       # c
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x_proj_bm, lengths, wh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def lstm_scan_pallas(params: LSTMParams, x: jnp.ndarray, mask_f: jnp.ndarray,
                     forget_bias: float = 1.0, block_b: int = 256,
                     interpret: bool | None = None):
    """Unidirectional fused scan. x [N, T, D], mask_f f32 [N, T].
    Returns (outputs [N, T, H], final_h [N, H]) — same contract as lstm_scan_ref."""
    return _forward(params, x, mask_f, forget_bias, block_b, interpret)


def _pad_gates(params: LSTMParams, hp: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Re-lay the (i,j,f,o) gate blocks on 128-aligned column boundaries.

    With hidden 100 the natural [*, 4H] layout puts gate boundaries at 100/200/300 —
    every in-kernel slice is lane-unaligned and the MXU tiles ragged. Padding each
    gate block to hp=round_up(H,128) keeps all slices aligned; the padded lanes stay
    exactly zero through the recurrence (gates there are 0 ⇒ nc=c*sig(fb)=0, nh=0),
    so results are bit-identical after the final slice.
    """
    h = params.wh.shape[0]
    d = params.wx.shape[0]

    def relay(w, rows):
        out = jnp.zeros((rows, 4 * hp), w.dtype)
        for g in range(4):
            out = out.at[: w.shape[0], g * hp : g * hp + h].set(w[:, g * h : (g + 1) * h])
        return out

    wx2 = relay(params.wx, d)
    wh2 = relay(params.wh, hp)              # rows padded h→hp with zeros
    b2 = jnp.zeros(4 * hp, params.b.dtype)
    for g in range(4):
        b2 = b2.at[g * hp : g * hp + h].set(params.b[g * h : (g + 1) * h])
    return wx2, wh2, b2


def _run_grouped(xps: list[jnp.ndarray], mask_f: jnp.ndarray, whs: list[jnp.ndarray],
                 forget_bias, block_b, interpret):
    """Stack G pre-projected scans sharing one mask and run them in one launch.
    xps: list of [N, T, 4Hp]; whs: list of [Hp, 4Hp]. Returns (outs, fins) lists."""
    if interpret is None:
        interpret = not _on_tpu()
    n, t, _ = xps[0].shape
    hp = whs[0].shape[0]
    g4 = xps[0].shape[-1]
    # Large batches use the streaming kernel (x_proj tiles DMA'd from HBM per
    # step); small ones keep x_proj fully VMEM-resident. The threshold is where
    # streaming's fixed DMA orchestration starts paying for itself.
    stream = n >= 1024 and t >= 2
    if stream:
        bb = 512
    else:
        # VMEM budget: x_proj block (T x bb x 4Hp) and output block are each
        # double-buffered across grid cells; keep the working set under ~10MB.
        vmem_rows = max(8, int(10e6 / (t * (g4 + hp) * 4 * 2)) // 8 * 8)
        bb = min(block_b, vmem_rows, _round_up(n, 8))
    n_pad = _round_up(n, bb)
    lengths = jnp.sum(mask_f > 0.5, axis=1).astype(jnp.int32)     # [N]
    if n_pad != n:
        lengths = jnp.pad(lengths, (0, n_pad - n))
    lens3 = jnp.broadcast_to(lengths[None, :, None], (len(xps), n_pad, 1))
    xp = jnp.stack([jnp.swapaxes(x, 0, 1) for x in xps])          # [G, T, N, 4Hp]
    if n_pad != n:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    scan = _pallas_scan_stream if stream else _pallas_scan
    out, fin = scan(xp, lens3, jnp.stack(whs), forget_bias, bb, interpret)
    outs = [jnp.swapaxes(out[g], 0, 1)[:n] for g in range(len(xps))]
    fins = [fin[g, :n] for g in range(len(xps))]
    return outs, fins


def _forward(params, x, mask_f, forget_bias, block_b, interpret):
    n, t, _ = x.shape
    h = params.wh.shape[0]
    hp = _round_up(h, 128)
    wx2, wh2, b2 = _pad_gates(params, hp)
    x_proj = jnp.dot(x, wx2, preferred_element_type=jnp.float32) + b2
    outs, fins = _run_grouped([x_proj], mask_f, [wh2], forget_bias, block_b, interpret)
    return outs[0][:, :, :h], fins[0][:, :h]


def _fwd(params, x, mask_f, forget_bias, block_b, interpret):
    return _forward(params, x, mask_f, forget_bias, block_b, interpret), (params, x, mask_f)


def _bwd(forget_bias, block_b, interpret, res, g):
    params, x, mask_f = res
    _, vjp = jax.vjp(
        lambda p, xx: lstm_scan_ref(p, xx, mask_f > 0.5, forget_bias), params, x
    )
    dp, dx = vjp(g)
    return dp, dx, jnp.zeros_like(mask_f)


lstm_scan_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def bilstm_pallas(params_fw: LSTMParams, params_bw: LSTMParams, x: jnp.ndarray,
                  mask: jnp.ndarray, forget_bias: float = 1.0,
                  block_b: int = 256, interpret: bool | None = None):
    """Bidirectional fused encode; contract identical to ops/lstm_ref.bilstm_ref.
    The fw and bw scans run as a G=2 group in ONE kernel launch."""
    return _bilstm_forward(params_fw, params_bw, x, mask, forget_bias, block_b, interpret)


def _bilstm_forward(params_fw, params_bw, x, mask, forget_bias, block_b, interpret):
    h = params_fw.wh.shape[0]
    hp = _round_up(h, 128)
    mask_f = mask.astype(jnp.float32)
    lengths = mask.sum(axis=1).astype(jnp.int32)
    x_rev = _flip_to_front(x, lengths)
    wxf, whf, bf = _pad_gates(params_fw, hp)
    wxb, whb, bb_ = _pad_gates(params_bw, hp)
    xp_fw = jnp.dot(x, wxf, preferred_element_type=jnp.float32) + bf
    xp_bw = jnp.dot(x_rev, wxb, preferred_element_type=jnp.float32) + bb_
    outs, fins = _run_grouped([xp_fw, xp_bw], mask_f, [whf, whb], forget_bias,
                              block_b, interpret)
    out_fw, out_bw_rev = outs[0][:, :, :h], outs[1][:, :, :h]
    out_bw = _flip_to_front(out_bw_rev, lengths)
    return (jnp.concatenate([out_fw, out_bw], axis=-1),
            jnp.concatenate([fins[0][:, :h], fins[1][:, :h]], axis=-1))


def _bilstm_fwd(params_fw, params_bw, x, mask, forget_bias, block_b, interpret):
    out = _bilstm_forward(params_fw, params_bw, x, mask, forget_bias, block_b, interpret)
    return out, (params_fw, params_bw, x, mask)


def _bilstm_bwd(forget_bias, block_b, interpret, res, g):
    from fvta_memexqa_tpu.ops.lstm_ref import bilstm_ref

    params_fw, params_bw, x, mask = res
    _, vjp = jax.vjp(
        lambda pf, pb, xx: bilstm_ref(pf, pb, xx, mask, forget_bias),
        params_fw, params_bw, x,
    )
    dpf, dpb, dx = vjp(g)
    # bool primal → float0 cotangent
    return dpf, dpb, dx, jnp.zeros(mask.shape, dtype=jax.dtypes.float0)


bilstm_pallas.defvjp(_bilstm_fwd, _bilstm_bwd)
