"""Capacity probe: largest context length T per attention path (round-2 verdict #4).

The fused Pallas FVTA kernel's stated reason to exist on the long-T path is
its O(T_block) VMEM streaming — it never materializes the [N, S, T, J]
correlation tensor that the XLA einsum path allocates in HBM. This module
MEASURES that claim instead of asserting it:

- probe_largest_t(): on the current device, grow T until each path dies with
  RESOURCE_EXHAUSTED; record the last T that ran and the first that OOM'd.
  Inputs are generated ON DEVICE inside the jit (a [8, T, F] host array at
  OOM-scale T would take minutes through this box's tunnel and prove
  nothing). At FVTA's MemexQA shapes (J<=30) the correlation tensor is ~1%
  of the input bytes and the two paths are expected to tie — the honest
  result BASELINE.md already predicts; the kernel's streaming becomes the
  capacity lever only when J grows (long-question variants, e.g.
  subtitle-conditioned video QA: J~512 makes C the dominant allocation).
- cp_memory_table(): per-device compiled memory (XLA memory_analysis) of the
  SAME attention program unsharded vs context-parallel over an 8-device mesh
  — the measured form of "CP divides per-chip bytes by the ctx axis", which
  is the real capacity lever for FVTA-shaped attention (BASELINE.md).

Run on the chip:   python -m fvta_memexqa_tpu.capacity_probe
On CPU (mesh only): FVTA_PLATFORM=cpu python -m fvta_memexqa_tpu.capacity_probe --cp-only
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp


def _attention_fn(use_pallas: bool, similarity: str = "trilinear"):
    from fvta_memexqa_tpu.ops.fvta_pallas import fvta_attention_pallas
    from fvta_memexqa_tpu.ops.fvta_ref import (ATTENTION_VARIANTS,
                                               similarity_tensor)

    def fn(h, cm, q, qm, params):
        if use_pallas:
            return fvta_attention_pallas(h, cm, q, qm, similarity, params).context
        c = similarity_tensor(h, q, similarity, params)
        return ATTENTION_VARIANTS["fvta"](h, cm, q, qm, c).context

    return fn


def _run_at_t(t: int, use_pallas: bool, batch: int, j: int, d: int,
              s: int = 8, grad: bool = False) -> None:
    """One encoder-output-shaped attention forward at context length t, inputs
    minted on device. Raises on OOM. grad=True runs a full backward instead
    (d(loss)/d(h, q, params)) — the training-capacity probe: the XLA VJP
    materializes the [N, S, T, J] correlation plus its backward intermediates,
    while the fused path's streaming backward (ops/fvta_pallas._bwd_kernel)
    rematerializes it blockwise and streams only dh.

    s >= 8 is REQUIRED to probe the fused kernel: fvta_attention_pallas
    dispatches thin-S shapes to the XLA path (its S-padding cost rule), so an
    s=1 probe silently measures XLA twice and reports a tie."""

    from jax import lax

    def mint(shape):
        # Deterministic varied fill from fused iotas: exactly ONE output
        # buffer. jax.random.normal here would materialize a same-size
        # uint32 bits buffer alongside the output — doubling the probe's
        # own footprint at precisely the OOM scales it exists to measure
        # (it turned a real XLA-vs-fused capacity separation into a tie).
        i2 = lax.broadcasted_iota(jnp.float32, shape, len(shape) - 2)
        i3 = lax.broadcasted_iota(jnp.float32, shape, len(shape) - 1)
        return jnp.sin(i2 * 7.77e-3 + i3 * 0.31)

    @jax.jit
    def go():
        h = mint((batch, s, t, d))
        cm = jnp.ones((batch, s, t), bool)
        q = mint((batch, j, d))
        qm = jnp.ones((batch, j), bool)
        params = {"w_x": jnp.full((d,), 0.1), "w_y": jnp.full((d,), 0.1),
                  "w_xy": jnp.full((d,), 0.1)}
        fn = _attention_fn(use_pallas)
        if grad:
            dh, dq, dp = jax.grad(
                lambda h_, q_, p_: fn(h_, cm, q_, qm, p_).sum(),
                argnums=(0, 1, 2))(h, q, params)
            # reduce on device: only scalars cross the tunnel
            return dh.sum() + dq.sum() + sum(v.sum() for v in dp.values())
        return fn(h, cm, q, qm, params).sum()

    import numpy as np

    np.asarray(go())  # force execution through the tunnel


def probe_largest_t(batch: int = 8, j: int = 512, d: int = 200, s: int = 8,
                    t_start: int = 1 << 14, t_cap: int = 1 << 22,
                    grad: bool = False,
                    t_list: list[int] | None = None) -> dict:
    """Doubling search: largest T that runs / first T that OOMs, per path.

    `t_list` replaces the doubling sequence with explicit probe points — the
    finer-than-doubling grid that separated the two training-capacity paths
    at J=512 (XLA last-ok 98,304 vs streaming 114,688; BASELINE.md round-4
    follow-up) sits BETWEEN doubling steps, where the default search reports
    a tie."""
    results = {}
    for use_pallas in (False, True):
        name = "pallas" if use_pallas else "xla"
        last_ok, first_oom = None, None
        ts = iter(t_list) if t_list else None
        t = next(ts) if ts else t_start
        while t <= t_cap:
            try:
                _run_at_t(t, use_pallas, batch, j, d, s, grad=grad)
                last_ok = t
                print(f"[{name}] T={t}: ok", flush=True)
                t = next(ts, t_cap + 1) if ts else t * 2
            except Exception as e:
                # OOM surfaces in several shapes (RESOURCE_EXHAUSTED, the
                # buffer-assignment dump "Attempting to reserve/allocate",
                # "exceeds the ... memory capacity"). Bare "exceeds"/"allocat"
                # also appear in NON-memory compiler errors (operand-count
                # limits, semaphore allocation) — recording those as the
                # path's capacity limit would publish an understated measured
                # number, so those substrings only count next to "memory".
                msg = str(e).lower()
                memory_oom = (
                    any(k in msg for k in
                        ("resource_exhausted", "out of memory", "oom",
                         "memory capacity"))
                    or (("exceeds" in msg or "allocat" in msg)
                        and "memory" in msg))
                if not memory_oom:
                    raise
                first_oom = t
                print(f"[{name}] T={t}: OOM ({type(e).__name__})", flush=True)
                break
        results[name] = {"last_ok_t": last_ok, "first_oom_t": first_oom}
    return {"batch": batch, "j": j, "d": d, "grad": grad, **results}


def cp_memory_table(t: int = 65536, batch: int = 2, j: int = 30, d: int = 200,
                    devices: int = 8, grad: bool = False) -> dict:
    """Per-device compiled memory, unsharded vs CP over `devices` (virtual ok).

    grad=True compiles the full backward (d(loss)/d(h, q, params)) instead —
    the measured form of the round-4 training-capacity conclusion: past the
    single-chip h+dh materialization floor (13.4 GB at T=131k, J=512), more
    trainable T comes from sharding h AND dh over the ctx axis, not from
    kernel work. h arrives device-sharded from the CP encoder and dh leaves
    the same way, so per-device bytes fall ~1/devices end to end."""
    import numpy as np

    from fvta_memexqa_tpu.config import MeshConfig
    from fvta_memexqa_tpu.parallel.cp import make_cp_attention, shard_context
    from fvta_memexqa_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(0, 1, (batch, 1, t, d)).astype(np.float32))
    cm = jnp.ones((batch, 1, t), bool)
    q = jnp.asarray(rng.normal(0, 1, (batch, j, d)).astype(np.float32))
    qm = jnp.ones((batch, j), bool)
    params = {"w_x": jnp.full((d,), 0.1), "w_y": jnp.full((d,), 0.1),
              "w_xy": jnp.full((d,), 0.1)}

    def stats(compiled):
        ma = compiled.memory_analysis()
        return {"argument_mb": round(ma.argument_size_in_bytes / 2**20, 2),
                "output_mb": round(ma.output_size_in_bytes / 2**20, 2),
                "temp_mb": round(ma.temp_size_in_bytes / 2**20, 2)}

    local_fn = _attention_fn(False)

    def wrap(fn):
        if not grad:
            return fn
        return lambda h_, cm_, q_, qm_, p_: jax.grad(
            lambda hh, qq, pp: fn(hh, cm_, qq, qm_, pp).sum(),
            argnums=(0, 1, 2))(h_, q_, p_)

    c_local = jax.jit(wrap(local_fn)).lower(h, cm, q, qm, params).compile()
    mesh = make_mesh(MeshConfig(data_parallel=1, context_parallel=devices))
    cp = make_cp_attention(mesh, "trilinear")
    hs, cms = shard_context(mesh, h, cm)
    c_cp = jax.jit(wrap(lambda *a: cp(*a).context)).lower(
        hs, cms, q, qm, params).compile()
    return {"t": t, "devices": devices, "grad": grad,
            "local_per_device": stats(c_local), "cp_per_device": stats(c_cp)}


def main(argv=None):
    import argparse
    import os
    import sys

    if os.environ.get("FVTA_PLATFORM"):
        # the axon plugin ignores JAX_PLATFORMS; only the config knob works
        jax.config.update("jax_platforms", os.environ["FVTA_PLATFORM"])
    from fvta_memexqa_tpu.utils.jit_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(prog="fvta capacity_probe")
    p.add_argument("--cp-only", action="store_true")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--j", type=int, default=512,
                   help="question length; C [N,S,T,J] dominates inputs when "
                        "J >> D (long-question regime)")
    p.add_argument("--d", type=int, default=200)
    p.add_argument("--s", type=int, default=8,
                   help="modality/sequence axis; >=8 or the fused kernel "
                        "dispatches to XLA and the probe measures XLA twice")
    p.add_argument("--t-start", type=int, default=1 << 14)
    p.add_argument("--t-list", type=str, default=None,
                   help="comma-separated explicit T probe points (ascending) "
                        "instead of the doubling search — the fine grid that "
                        "separates paths between doubling steps")
    p.add_argument("--grad", action="store_true",
                   help="probe a full backward (training capacity) instead of "
                        "the forward")
    args = p.parse_args(sys.argv[1:] if argv is None else argv)
    out = {}
    if not args.cp_only:
        t_list = ([int(x) for x in args.t_list.split(",")]
                  if args.t_list else None)
        out["largest_t"] = probe_largest_t(batch=args.batch, j=args.j, d=args.d,
                                           s=args.s, t_start=args.t_start,
                                           grad=args.grad, t_list=t_list)
    if len(jax.devices()) >= 8:
        out["cp_memory"] = cp_memory_table(grad=args.grad)
    else:
        out["cp_memory"] = "skipped: needs 8 devices (run with FVTA_PLATFORM=cpu " \
                           "+ xla_force_host_platform_device_count=8)"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
