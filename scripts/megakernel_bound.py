"""ROADMAP #3 closure experiment: measure the mega-kernel's upper bound.

The one untried forward-perf lever (BASELINE.md train profile; round-3
verdict weak #4) was a mega-kernel interleaving the vocab-table embed
gather (+ dropout) with the LSTM scan on the dominant train-step component
— the photo-title word-encoder (3072 length-10 sequences/step at bs=64,
3.3 ms of the 8.84 ms step). Before building a gather-in-kernel Pallas
variant, this script measures what such a kernel could possibly save:

  A. gather+dropout alone           (what the fusion would hide)
  B. fused fin-only bi-LSTM alone   (the scan it would hide it inside)
  C. gather+dropout -> scan chained (what XLA already does end-to-end)

The mega-kernel's ceiling is C - B (the marginal cost the embed path adds
on top of the scan when XLA schedules them together): a fused kernel
cannot beat removing the embed phase entirely. All timings use the
mandatory dependency-chained slope method (bench_lib._median_slope) —
per-call timing lies through the axon tunnel. Forward+backward (train is
where the component dominates), wrt the vocab table and LSTM params.

Run on chip:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/megakernel_bound.py
CPU smoke:    FVTA_PLATFORM=cpu python scripts/megakernel_bound.py --rows 64 --reps 2
"""

import argparse
import json
import os
import sys

import jax

if os.environ.get("FVTA_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FVTA_PLATFORM"])

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fvta_memexqa_tpu.bench_lib import _median_slope
from fvta_memexqa_tpu.ops.lstm_fused import bilstm_fused_final
from fvta_memexqa_tpu.ops.lstm_ref import init_lstm_params
from fvta_memexqa_tpu.utils.jit_cache import enable_compile_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=3072,
                   help="sequences per step (titles at bs=64: 48 albums x 8 "
                        "photos x ... = 3072)")
    p.add_argument("--length", type=int, default=10)
    p.add_argument("--dim", type=int, default=200,
                   help="vocab-table row width (word 100 + char-CNN 100)")
    p.add_argument("--hidden", type=int, default=100)
    p.add_argument("--vocab", type=int, default=12000)
    p.add_argument("--keep-prob", type=float, default=0.9)
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("--k-small", type=int, default=4)
    p.add_argument("--k-large", type=int, default=24)
    args = p.parse_args()
    enable_compile_cache()

    n, t, d, h, v = args.rows, args.length, args.dim, args.hidden, args.vocab
    rng = np.random.default_rng(0)
    vt = jnp.asarray(rng.normal(0, 1, (v, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, (n, t)).astype(np.int32))
    mask = jnp.ones((n, t), bool)
    kp = args.keep_prob
    key = jax.random.key(0)
    pf = init_lstm_params(jax.random.key(1), d, h)
    pb = init_lstm_params(jax.random.key(2), d, h)

    def embed(vt_, ids_, key_):
        x = vt_[ids_]                                   # [N, T, D] gather
        keep = jax.random.bernoulli(key_, kp, x.shape)
        return jnp.where(keep, x / kp, 0.0)

    def scan(pf_, pb_, x_):
        return bilstm_fused_final(pf_, pb_, x_, mask)

    # Dependency chaining: every iteration's inputs depend on the previous
    # iteration's OUTPUT on every independent compute path (ids via the loss
    # scalar, table/params via grad application) so XLA cannot hoist or
    # parallelize iterations (CLAUDE.md slope-method rule).
    def chain_ids(ids_, scalar):
        bump = (jnp.abs(scalar) * 1e-6).astype(jnp.int32) % v
        return (ids_ + 1 + bump) % v

    @jax.jit
    def run_embed(vt_, ids_, k):
        def body(i, carry):
            vt_c, ids_c = carry
            def loss(tbl):
                return embed(tbl, ids_c, jax.random.fold_in(key, i)).sum()
            val, dvt = jax.value_and_grad(loss)(vt_c)
            return vt_c + dvt * 1e-9, chain_ids(ids_c, val)
        vt_c, ids_c = jax.lax.fori_loop(0, k, body, (vt_, ids_))
        return vt_c.sum() + ids_c.sum()

    @jax.jit
    def run_scan(pf_, pb_, x0, k):
        def body(i, carry):
            pf_c, x_c = carry
            def loss(pp):
                return scan(pp, pb_, x_c).sum()
            val, dpf = jax.value_and_grad(loss)(pf_c)
            pf_c = jax.tree.map(lambda a, g: a + g * 1e-9, pf_c, dpf)
            return pf_c, x_c + val * 1e-9
        pf_c, x_c = jax.lax.fori_loop(0, k, body, (pf_, x0))
        return jax.tree.reduce(lambda a, b: a + b.sum(), pf_c, 0.0) + x_c.sum()

    @jax.jit
    def run_both(vt_, ids_, pf_, pb_, k):
        def body(i, carry):
            vt_c, ids_c, pf_c = carry
            def loss(tbl, pp):
                return scan(pp, pb_, embed(tbl, ids_c,
                                           jax.random.fold_in(key, i))).sum()
            val, (dvt, dpf) = jax.value_and_grad(loss, argnums=(0, 1))(vt_c, pf_c)
            pf_c = jax.tree.map(lambda a, g: a + g * 1e-9, pf_c, dpf)
            return vt_c + dvt * 1e-9, chain_ids(ids_c, val), pf_c
        vt_c, ids_c, pf_c = jax.lax.fori_loop(0, k, body, (vt_, ids_, pf_))
        return (vt_c.sum() + ids_c.sum()
                + jax.tree.reduce(lambda a, b: a + b.sum(), pf_c, 0.0))

    # Decomposition variants (round 4): WHERE does the marginal cost go?
    # A fused kernel can hide the gather/dropout/x round-trips, but it canNOT
    # skip the table-gradient scatter — if that chain dominates the marginal,
    # the mega-kernel is bounded out regardless of kernel quality.
    @jax.jit
    def run_both_nodrop(vt_, ids_, pf_, pb_, k):
        def body(i, carry):
            vt_c, ids_c, pf_c = carry
            def loss(tbl, pp):
                return scan(pp, pb_, tbl[ids_c]).sum()
            val, (dvt, dpf) = jax.value_and_grad(loss, argnums=(0, 1))(vt_c, pf_c)
            pf_c = jax.tree.map(lambda a, g: a + g * 1e-9, pf_c, dpf)
            return vt_c + dvt * 1e-9, chain_ids(ids_c, val), pf_c
        vt_c, ids_c, pf_c = jax.lax.fori_loop(0, k, body, (vt_, ids_, pf_))
        return (vt_c.sum() + ids_c.sum()
                + jax.tree.reduce(lambda a, b: a + b.sum(), pf_c, 0.0))

    @jax.jit
    def run_both_noembedbwd(vt_, ids_, pf_, pb_, k):
        # embed runs forward, but grad is wrt pf only: the dx -> dropout-bwd
        # -> scatter-add(table) chain is skipped entirely.
        def body(i, carry):
            vt_c, ids_c, pf_c = carry
            def loss(pp):
                x = jax.lax.stop_gradient(
                    embed(vt_c, ids_c, jax.random.fold_in(key, i)))
                return scan(pp, pb_, x).sum()
            val, dpf = jax.value_and_grad(loss)(pf_c)
            pf_c = jax.tree.map(lambda a, g: a + g * 1e-9, pf_c, dpf)
            return vt_c + val * 1e-12, chain_ids(ids_c, val), pf_c
        vt_c, ids_c, pf_c = jax.lax.fori_loop(0, k, body, (vt_, ids_, pf_))
        return (vt_c.sum() + ids_c.sum()
                + jax.tree.reduce(lambda a, b: a + b.sum(), pf_c, 0.0))

    @jax.jit
    def run_scan_dx(pf_, pb_, x0, k):
        # scan alone but also producing dx (what the chained bwd hands the
        # embed bwd) — isolates dx-production cost from the embed chain.
        def body(i, carry):
            pf_c, x_c = carry
            def loss(pp, xx):
                return scan(pp, pb_, xx).sum()
            val, (dpf, dx) = jax.value_and_grad(loss, argnums=(0, 1))(pf_c, x_c)
            pf_c = jax.tree.map(lambda a, g: a + g * 1e-9, pf_c, dpf)
            return pf_c, x_c + dx * 1e-9 + val * 1e-12
        pf_c, x_c = jax.lax.fori_loop(0, k, body, (pf_, x0))
        return jax.tree.reduce(lambda a, b: a + b.sum(), pf_c, 0.0) + x_c.sum()

    x0 = embed(vt, ids, key)
    ks, kl, reps = args.k_small, args.k_large, args.reps
    t_embed = _median_slope(
        lambda k: jax.block_until_ready(run_embed(vt, ids, k)), ks, kl, reps)
    t_scan = _median_slope(
        lambda k: jax.block_until_ready(run_scan(pf, pb, x0, k)), ks, kl, reps)
    t_both = _median_slope(
        lambda k: jax.block_until_ready(run_both(vt, ids, pf, pb, k)), ks, kl, reps)
    t_nodrop = _median_slope(
        lambda k: jax.block_until_ready(run_both_nodrop(vt, ids, pf, pb, k)),
        ks, kl, reps)
    t_noebwd = _median_slope(
        lambda k: jax.block_until_ready(run_both_noembedbwd(vt, ids, pf, pb, k)),
        ks, kl, reps)
    t_scandx = _median_slope(
        lambda k: jax.block_until_ready(run_scan_dx(pf, pb, x0, k)), ks, kl, reps)

    out = {
        "rows": n, "length": t, "dim": d, "hidden": h, "vocab": v,
        "backend": jax.devices()[0].platform,
        "embed_ms": round(t_embed * 1e3, 4),
        "scan_ms": round(t_scan * 1e3, 4),
        "both_ms": round(t_both * 1e3, 4),
        "marginal_embed_ms": round((t_both - t_scan) * 1e3, 4),
        "both_nodrop_ms": round(t_nodrop * 1e3, 4),
        "dropout_cost_ms": round((t_both - t_nodrop) * 1e3, 4),
        "both_noembedbwd_ms": round(t_noebwd * 1e3, 4),
        "embed_bwd_chain_ms": round((t_both - t_noebwd) * 1e3, 4),
        "scan_dx_ms": round(t_scandx * 1e3, 4),
        "dx_production_ms": round((t_scandx - t_scan) * 1e3, 4),
        "note": "mega-kernel ceiling = marginal_embed_ms; embed_bwd_chain_ms "
                "(dx->dropout-bwd->scatter) is NOT fusable away (the table "
                "grad must be scattered regardless); fusable upper bound = "
                "marginal - (embed_bwd_chain - dx_production)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
