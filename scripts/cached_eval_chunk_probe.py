#!/usr/bin/env python
"""Chunked cached-eval probe at the bs=256 cache-gather bandwidth wall.

Round-4 verdict weak #4 / round-5 task #6: cached-album eval peaks at bs=128
(233k qa/s) and REGRESSES at bs=256 (164k) — the [N,A,6,T,2H] cache gather
goes bandwidth-bound. The one unmeasured lever: split each batch into
n_chunks sub-batches INSIDE the jit (gather+answer per chunk, unrolled) so
the TPU's DMA engines can overlap chunk i+1's cache gather with chunk i's
answer math. bench_lib.bench_cached_inference(n_chunks=) implements it with
identical math; this script sweeps the cells and prints one JSON line for
BASELINE.md. Accept/reject on measurement, like every perf lever here.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cached_eval_chunk_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fvta_memexqa_tpu.utils.jit_cache import enable_compile_cache

enable_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fvta_memexqa_tpu.bench_lib import (bench_cached_inference,  # noqa: E402
                                        realistic_config,
                                        retry_transient as _retry)


def main():
    t0 = time.perf_counter()
    np.asarray((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
    print(f"first contact: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    cfg = realistic_config(use_pallas=False)
    # default cells = the round-5 bs=256-wall sweep; pass e.g.
    # --cells 128:1,128:2,64:2 to probe other (batch, n_chunks) points
    cells = [(128, 1), (256, 1), (256, 2), (256, 4), (512, 4)]
    for a in sys.argv[1:]:
        if a.startswith("--cells"):
            spec = a.split("=", 1)[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1]
            cells = [tuple(int(x) for x in c.split(":")) for c in
                     spec.split(",")]
    out = {"platform": jax.devices()[0].platform}
    prebuilt = None
    for bs, nc in cells:
        qps, cache_s, prebuilt = _retry(
            lambda bs=bs, nc=nc, pb=prebuilt: bench_cached_inference(
                cfg, batch_size=bs, n_chunks=nc, prebuilt=pb,
                k_small=5, k_large=25),
            f"cached(bs={bs},chunks={nc})")
        key = f"cached_qps_bs{bs}_c{nc}"
        out[key] = round(qps, 1)
        print(f"{key}: {qps:.1f} qa/s (cache build {cache_s:.1f}s)",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
