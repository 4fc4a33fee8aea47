"""Masking primitives, numerically matching the reference's BiDAF-lineage `exp_mask`.

The reference masks softmax inputs by adding -1e30 at padded positions
(SURVEY.md section 2 "Data runtime": "-1e30 exp_mask for softmax masking").
Parity-critical detail: positions are *added* a large negative constant rather than
set to -inf, so a sequence that is entirely padding still produces a finite, uniform
softmax instead of NaN — downstream weights then multiply against zeroed values.
"""

from __future__ import annotations

import jax.numpy as jnp

VERY_NEGATIVE = -1e30


def exp_mask(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Add VERY_NEGATIVE where mask is False. mask broadcasts against logits."""
    return logits + (1.0 - mask.astype(logits.dtype)) * VERY_NEGATIVE


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax over `axis` with padded positions excluded (exp_mask semantics).

    Kept as explicit max-shift/exp/sum arithmetic (not jax.nn.softmax) so the Pallas
    kernels can mirror it op-for-op and parity tests compare like against like.
    """
    x = exp_mask(logits, mask)
    x = x - jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x)
    return e / jnp.sum(e, axis=axis, keepdims=True)
