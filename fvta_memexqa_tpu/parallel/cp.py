"""Context parallelism: FVTA focal attention over a time-sharded context.

SURVEY.md section 5 "Long-context / sequence parallelism": for TGIF-QA-style frame
sequences (BASELINE.json config 4) whose context time axis T exceeds one chip's
comfortable tiling, the context tensor is sharded [N, S, T/cp, D] over the mesh's
"ctx" axis and the hierarchical focal softmax is composed from per-shard ONLINE
softmax statistics — the same (max, denominator, weighted-numerator) triple the
fused Pallas kernel streams over time blocks (ops/fvta_pallas.py), here combined
ACROSS DEVICES with XLA collectives that ride ICI:

    m_g   = pmax(m_local)                      one collective max
    den_g = psum(den_local * exp(m_local - m_g))
    v_g   = psum(v_local  * exp(m_local - m_g))
    eq_g  = pmax(eq_local)                     question side

No user-level communication code: `shard_map` + psum/pmax emit the collectives
(SURVEY.md section 2 "Distributed communication backend": the mesh IS the backend).
Ulysses-style head sharding is N/A — FVTA has no multi-head structure (SURVEY.md
section 5, documented reasoning).

The sequence-level softmax (over S) and the question tensors are tiny and
replicated; only the O(T) terms are sharded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fvta_memexqa_tpu.ops.fvta_ref import (AttentionOutput, focal_finalize,
                                           focal_local_stats)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _diff_pmax(x, axis_name: str):
    """Differentiable cross-device max: jax.lax.pmax has no VJP, but here the max
    is ALSO a logit (the sequence-level focal score is the max over time of E), so
    gradients must reach the argmax shard — mirror jnp.max's subgradient by routing
    the cotangent to the shard(s) achieving the max (split evenly on exact ties).
    The output is replicated but each shard USES it differently downstream, so the
    per-shard cotangents must be psum'd before routing to the argmax shard."""
    return jax.lax.pmax(x, axis_name)


def _diff_pmax_fwd(x, axis_name):
    mg = jax.lax.pmax(x, axis_name)
    is_max = (x == mg).astype(x.dtype)
    cnt = jax.lax.psum(is_max, axis_name)
    return mg, (is_max, cnt)


def _diff_pmax_bwd(axis_name, res, g):
    is_max, cnt = res
    g_total = jax.lax.psum(g, axis_name)
    return (is_max * g_total / jnp.maximum(cnt, 1.0),)


_diff_pmax.defvjp(_diff_pmax_fwd, _diff_pmax_bwd)


def fvta_attention_cp(h, cm, q, qm, similarity: str, sim_params: dict,
                      axis_name: str = "ctx", use_pallas: bool = False
                      ) -> AttentionOutput:
    """FVTA attention inside shard_map, context time axis sharded over `axis_name`.

    Returns AttentionOutput with context/question/seq_attn REPLICATED across the
    axis and time_attn SHARDED like h (each device holds its shard's weights).
    Numerically identical to the unsharded ops/fvta_ref.fvta_attention.

    The per-shard statistics come from fvta_ref.focal_local_stats (XLA) or,
    with use_pallas, from the fused blockwise kernel
    (ops/fvta_pallas.fvta_stats_pallas) — the same online (m, den, v) triple
    streamed over time blocks in VMEM so the local [N, S, Tl, J] correlation
    never materializes even within a shard. Both parity-tested."""
    if use_pallas:
        from fvta_memexqa_tpu.ops.fvta_pallas import fvta_stats_pallas

        m, den, v, eq, e = fvta_stats_pallas(h, cm, q, qm, similarity, sim_params)
    else:
        m, den, v, eq, e = focal_local_stats(h, cm, q, qm, similarity, sim_params)

    m_g = _diff_pmax(m, axis_name)                                 # [N, S]
    scale = jnp.exp(m - m_g)
    den_g = jax.lax.psum(den * scale, axis_name)
    v_g = jax.lax.psum(v * scale[..., None], axis_name)

    # Validity comes from the CONTEXT mask (any valid t on any shard), not from
    # m_g: an all-masked QUESTION also absorbs m_g to -1e30, but the reference
    # seq_mask = ctx_mask.any(-1) still counts such sequences (finite-uniform
    # exp_mask semantics — ops/masking.py).
    seq_valid = jax.lax.psum(
        cm.any(axis=-1).astype(m_g.dtype), axis_name) > 0.5        # [N, S]
    eq_g = _diff_pmax(eq, axis_name)                               # [N, J]
    # stats→output math shared with the fused kernel's streaming path
    # (ops/fvta_ref.focal_finalize); e stays local, so time_attn is sharded
    return focal_finalize(m_g, den_g, v_g, eq_g, e, q, qm, seq_valid)


def make_cp_attention(mesh: Mesh, similarity: str, axis_name: str = "ctx",
                      use_pallas: bool = False):
    """shard_map-wrapped CP attention: h/cm sharded on the time axis over
    `axis_name`, everything else replicated. Call like the reference attention.
    use_pallas: per-shard stats via the fused blockwise kernel."""
    try:
        from jax import shard_map  # jax >= 0.7 canonical location
        check_kw = {"check_vma": False}
    except ImportError:  # pragma: no cover
        # the experimental signature predates the check_vma rename
        from jax.experimental.shard_map import shard_map
        check_kw = {"check_rep": False}

    def fn(h, cm, q, qm, sim_params):
        return fvta_attention_cp(h, cm, q, qm, similarity, sim_params, axis_name,
                                 use_pallas)

    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(None, None, axis_name, None), P(None, None, axis_name),
                  P(), P(), P()),
        out_specs=AttentionOutput(
            context=P(), question=P(),
            time_attn=P(None, None, axis_name), seq_attn=P(),
        ),
        **check_kw,
    )


def shard_context(mesh: Mesh, h, cm, axis_name: str = "ctx"):
    """Place (h, cm) with the time axis sharded over the mesh's ctx axis."""
    hs = NamedSharding(mesh, P(None, None, axis_name, None))
    ms = NamedSharding(mesh, P(None, None, axis_name))
    return jax.device_put(h, hs), jax.device_put(cm, ms)
