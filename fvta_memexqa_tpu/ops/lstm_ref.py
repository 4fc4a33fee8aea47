"""Reference bi-LSTM: `lax.scan` with TF1 `BasicLSTMCell` numerics.

This is the correctness anchor for the Pallas fused scan (ops/lstm_pallas.py) and the
parity target for the reference's encoders (SURVEY.md section 2 "Per-modality bi-LSTM
encoders": `tf.nn.bidirectional_dynamic_rnn` + `BasicLSTMCell`). Parity-critical
semantics reproduced here (SURVEY.md "Hard parts": TF1-LSTM numeric parity):

- gate layout: one [D+H, 4H] kernel, gates split in TF1 order (i, j, f, o) where j is
  the candidate; bias initialized to zero with `forget_bias` added INSIDE the cell
- c' = c * sigmoid(f + forget_bias) + sigmoid(i) * tanh(j);  h' = tanh(c') * sigmoid(o)
- `sequence_length` behavior of dynamic_rnn: beyond a sequence's length, outputs are
  zero and the carried state stops updating
- the backward direction is reverse_sequence → scan → reverse_sequence, implemented as
  a mask-aware flip (padding moves to the front, where the no-update rule makes it a
  no-op), which is numerically identical

TPU-first structure: the input projection x @ Wx for ALL timesteps is hoisted out of
the scan into one large MXU matmul; only the [H, 4H] recurrent matmul stays inside.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LSTMParams(NamedTuple):
    wx: jnp.ndarray  # [D, 4H] input kernel
    wh: jnp.ndarray  # [H, 4H] recurrent kernel
    b: jnp.ndarray   # [4H]


def init_lstm_params(key: jax.Array, input_dim: int, hidden_dim: int) -> LSTMParams:
    """Glorot-uniform over the concatenated [D+H, 4H] kernel (TF1 default), zero bias."""
    k = jax.random.uniform(
        key,
        (input_dim + hidden_dim, 4 * hidden_dim),
        minval=-jnp.sqrt(6.0 / (input_dim + hidden_dim + 4 * hidden_dim)),
        maxval=jnp.sqrt(6.0 / (input_dim + hidden_dim + 4 * hidden_dim)),
        dtype=jnp.float32,
    )
    return LSTMParams(wx=k[:input_dim], wh=k[input_dim:], b=jnp.zeros(4 * hidden_dim))


def lstm_cell(
    x_proj_t: jnp.ndarray,  # [N, 4H] = x_t @ wx + b (precomputed)
    h: jnp.ndarray,         # [N, H]
    c: jnp.ndarray,         # [N, H]
    wh: jnp.ndarray,        # [H, 4H]
    forget_bias: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    gates = x_proj_t + jnp.dot(h, wh, preferred_element_type=jnp.float32)
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_h, new_c


def lstm_scan_ref(
    params: LSTMParams,
    x: jnp.ndarray,      # [N, T, D]
    mask: jnp.ndarray,   # bool [N, T]
    forget_bias: float = 1.0,
    dtype: jnp.dtype | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unidirectional scan. Returns (outputs [N, T, H], final_h [N, H]).

    dtype: optional ACTIVATION compute dtype (the bf16 variant,
    ModelConfig.dtype). Params, the hoisted x-projection, the carried (h, c)
    state, and the outputs are cast to it — halving the scan's HBM traffic
    and running the VPU transcendentals at bf16 — while both matmuls keep
    f32 accumulation (preferred_element_type) and the gate pre-activations
    are formed in f32 before casting back. None = x.dtype (fp32 parity path;
    the TF1 golden fixtures pin that one)."""
    n, t, _ = x.shape
    hdim = params.wh.shape[0]
    if dtype is not None:
        params = LSTMParams(*(p.astype(dtype) for p in params))
        x = x.astype(dtype)
    x_proj = jnp.dot(x, params.wx, preferred_element_type=jnp.float32) + params.b
    x_proj = x_proj.astype(x.dtype)
    m = mask.astype(x_proj.dtype)[..., None]  # [N, T, 1]
    cdt = x_proj.dtype

    def step(carry, inp):
        h, c = carry
        xp_t, m_t = inp
        nh, nc = lstm_cell(xp_t, h, c, params.wh, forget_bias)
        nh, nc = nh.astype(cdt), nc.astype(cdt)
        h = m_t * nh + (1.0 - m_t) * h
        c = m_t * nc + (1.0 - m_t) * c
        return (h, c), m_t * nh  # output is zero at padded steps (dynamic_rnn)

    init = (jnp.zeros((n, hdim), x_proj.dtype), jnp.zeros((n, hdim), x_proj.dtype))
    (h_fin, _), outs = jax.lax.scan(
        step, init, (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(m, 0, 1))
    )
    return jnp.swapaxes(outs, 0, 1), h_fin


def _flip_to_front(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """reverse_sequence: reverse the first `length` elements of axis 1 per example.

    Implemented as a gather so it stays a single fused XLA op: index
    t -> (length - 1 - t) for t < length, identity elsewhere (padded tail, which is
    masked anyway).
    """
    n, t = x.shape[:2]
    pos = jnp.arange(t)[None, :]                        # [1, T]
    src = jnp.where(pos < lengths[:, None], lengths[:, None] - 1 - pos, pos)
    return jnp.take_along_axis(x, src.reshape(n, t, *([1] * (x.ndim - 2))), axis=1)


def bilstm_ref(
    params_fw: LSTMParams,
    params_bw: LSTMParams,
    x: jnp.ndarray,      # [N, T, D]
    mask: jnp.ndarray,   # bool [N, T]
    forget_bias: float = 1.0,
    dtype: jnp.dtype | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional encode. Returns (outputs [N, T, 2H], final_state [N, 2H]).

    final_state = [fw final h; bw final h], i.e. TF1's (output_state_fw, output_state_bw).h
    concatenated — the summary vector the reference uses for questions/choices.
    dtype: activation compute dtype (see lstm_scan_ref); outputs are returned
    in it — the caller (models.fvta.BiLSTM) casts back to f32 at the module
    boundary so attention/scorer numerics stay fp32.
    """
    lengths = mask.sum(axis=1).astype(jnp.int32)
    out_fw, h_fw = lstm_scan_ref(params_fw, x, mask, forget_bias, dtype)
    x_rev = _flip_to_front(x, lengths)
    out_bw_rev, h_bw = lstm_scan_ref(params_bw, x_rev, mask, forget_bias, dtype)
    out_bw = _flip_to_front(out_bw_rev, lengths)
    return jnp.concatenate([out_fw, out_bw], axis=-1), jnp.concatenate([h_fw, h_bw], axis=-1)
