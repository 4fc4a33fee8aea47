"""Measure bf16 album-cache storage for the CACHED-EVAL path (speed, not capacity).

Hypothesis: the [R,6,T,2H] cache gather dominates the cached answer step's HBM
traffic, so storing the cache in bf16 (upcast right after the gather) should
speed up the bandwidth-bound end of the batch sweep. Verdict (recorded in
BASELINE.md "bf16 eval-cache storage — measured reject"): it does NOT — the
step is VPU-bound at bs=128 (0.88x) and the halved bytes never pay for the
convert pass even at bs=256 (0.99x); XLA's cost model shows the gather is only
~6% of the step's accessed bytes. The eval cache therefore stays f32; cache
compression remains a serving capacity lever only (serve --cache-dtype).

Run on the chip: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cached_eval_dtype_bench.py
Raw artifact: docs/artifacts/cached_eval_dtype.json
"""

import json
import sys

sys.path.insert(0, ".")

from fvta_memexqa_tpu.utils.jit_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402

from fvta_memexqa_tpu.bench_lib import (bench_cached_inference,  # noqa: E402
                                        realistic_config)


def main():
    cfg = realistic_config()
    rows = []
    prebuilt = None
    for bs in (128, 256):
        qa_f32, cache_s, prebuilt = bench_cached_inference(
            cfg, batch_size=bs, prebuilt=prebuilt)
        qa_bf16, _, _ = bench_cached_inference(cfg, batch_size=bs,
                                               prebuilt=prebuilt,
                                               cache_dtype="bfloat16")
        rows.append({"batch_size": bs, "platform": jax.devices()[0].platform,
                     "f32_qa_per_sec": round(qa_f32, 1),
                     "bf16_qa_per_sec": round(qa_bf16, 1),
                     "speedup": round(qa_bf16 / qa_f32, 3)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
