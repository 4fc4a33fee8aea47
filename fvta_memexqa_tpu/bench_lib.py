"""Benchmark harness: MemexQA-shaped inference/training throughput + latency.

Implements the driver's benchmark (BASELINE.json config 1: "MemexQA v1.1 test-set
inference, pretrained FVTA checkpoint, batch 8" — plus a batch sweep for peak
throughput). Because the real dataset is not present in the sandbox (SURVEY.md
provenance), inputs are random tensors with the REAL dataset's shapes and vocab scale:
the compute graph (embedding gathers, 6x2 LSTM scans per album, FVTA correlation +
focal softmax, 4-way scorer) is identical to a real checkpoint's, so throughput and
latency are representative; accuracy is exercised by the test suite instead.
Methodology recorded in BASELINE.md.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fvta_memexqa_tpu.config import Config, DataConfig, ModelConfig
from fvta_memexqa_tpu.data.device_prepro import SharedTables, assemble
from fvta_memexqa_tpu.data.pipeline import Batch
from fvta_memexqa_tpu.models.fvta import FVTAModel


def realistic_config(use_pallas: bool = False, dtype: str = "float32") -> Config:
    """MemexQA v1.1-scale shapes (SURVEY.md: ~20.8k QAs, 630 albums, 5090 photos,
    feat dim 2537, GloVe 100d; hidden 100 per direction as in the paper)."""
    cfg = Config()
    return cfg.replace(
        data=DataConfig(
            max_albums=4,
            max_photos=12,
            max_question_len=30,
            max_answer_len=8,
            max_sent_len=10,
            max_album_text_len=24,
            max_word_len=16,
            image_feat_dim=2537,
            word_emb_dim=100,
            word_vocab_size=12000,
            char_vocab_size=70,
            num_glove_words=10000,
        ),
        model=ModelConfig(hidden_dim=100, use_pallas=use_pallas, dtype=dtype),
    )


def synth_shared(cfg: Config, num_albums: int = 630, num_photos: int = 5090,
                 seed: int = 0) -> SharedTables:
    d = cfg.data
    rng = np.random.default_rng(seed)
    n_alb, n_ph = num_albums + 1, num_photos + 1

    def words(shape):
        return rng.integers(2, d.word_vocab_size, shape).astype(np.int32)

    def chars(shape):
        return rng.integers(2, d.char_vocab_size, shape).astype(np.int32)

    photo_idx = rng.integers(1, n_ph, (n_alb, d.max_photos)).astype(np.int32)
    feats = rng.normal(0, 1, (n_ph, d.image_feat_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    return SharedTables(
        word_emb=jnp.asarray(rng.normal(0, 0.5, (d.word_vocab_size, d.word_emb_dim))
                             .astype(np.float32)),
        vocab_chars=jnp.asarray(chars((d.word_vocab_size, d.max_word_len))),
        photo_feats=jnp.asarray(feats),
        album_photo_idx=jnp.asarray(photo_idx),
        album_photo_mask=jnp.asarray(np.ones((n_alb, d.max_photos), bool)),
        photo_title_words=jnp.asarray(words((n_alb, d.max_photos, d.max_sent_len))),
        photo_title_chars=jnp.asarray(
            chars((n_alb, d.max_photos, d.max_sent_len, d.max_word_len))),
        photo_title_mask=jnp.asarray(np.ones((n_alb, d.max_photos, d.max_sent_len), bool)),
        album_text_words=jnp.asarray(words((n_alb, 4, d.max_album_text_len))),
        album_text_chars=jnp.asarray(chars((n_alb, 4, d.max_album_text_len, d.max_word_len))),
        album_text_mask=jnp.asarray(np.ones((n_alb, 4, d.max_album_text_len), bool)),
    )


def synth_batch(cfg: Config, batch_size: int, num_albums: int = 630,
                seed: int = 1) -> Batch:
    d = cfg.data
    rng = np.random.default_rng(seed)
    return Batch(
        q_words=jnp.asarray(rng.integers(2, d.word_vocab_size,
                                         (batch_size, d.max_question_len)).astype(np.int32)),
        q_chars=jnp.asarray(rng.integers(2, d.char_vocab_size,
                                         (batch_size, d.max_question_len, d.max_word_len))
                            .astype(np.int32)),
        q_mask=jnp.asarray(np.ones((batch_size, d.max_question_len), bool)),
        choice_words=jnp.asarray(rng.integers(2, d.word_vocab_size,
                                              (batch_size, 4, d.max_answer_len))
                                 .astype(np.int32)),
        choice_chars=jnp.asarray(rng.integers(2, d.char_vocab_size,
                                              (batch_size, 4, d.max_answer_len, d.max_word_len))
                                 .astype(np.int32)),
        choice_mask=jnp.asarray(np.ones((batch_size, 4, d.max_answer_len), bool)),
        album_idx=jnp.asarray(rng.integers(1, num_albums + 1,
                                           (batch_size, d.max_albums)).astype(np.int32)),
        album_mask=jnp.asarray(np.ones((batch_size, d.max_albums), bool)),
        label=jnp.asarray(rng.integers(0, 4, batch_size).astype(np.int32)),
        ex_mask=jnp.asarray(np.ones(batch_size, bool)),
    )


@dataclass
class BenchResult:
    batch_size: int
    qa_pairs_per_sec: float
    p50_latency_ms: float
    compile_s: float


def _median_slope(run, k_small: int, k_large: int, reps: int) -> float:
    """Median slope (time(k_large) - time(k_small)) / (k_large - k_small).

    THE mandatory timing ritual on this box (module docstring + BASELINE.md):
    `run(k)` must execute k dependency-chained iterations inside ONE jit and
    block on the result; the slope cancels the constant dispatch/fetch
    overhead the axon tunnel adds to every call. Single definition so every
    benchmark measures identically."""
    run(k_small)  # compile
    run(k_large)
    slopes = []
    for _ in range(reps):
        run(k_small)  # drain the dispatch queue
        t0 = time.perf_counter()
        run(k_small)
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(k_large)
        d2 = time.perf_counter() - t0
        slopes.append((d2 - d1) / (k_large - k_small))
    return sorted(slopes)[len(slopes) // 2]


def retry_transient(fn, what: str, retries: int = 2, backoff_s: float = 45.0):
    """Retry a bench section through transient axon-tunnel failures.

    The tunnel's remote_compile occasionally drops its response mid-read
    (JaxRuntimeError "INTERNAL: ... remote_compile: read body: response body
    closed before all bytes were read" — observed killing an otherwise-healthy
    round-4 bench run). That is a transport flake, not a program bug: the
    same compile succeeds once the tunnel recovers. Only errors matching the
    transient signature are retried — the runtime-error types the tunnel
    actually raises, carrying its documented transport strings; anything else
    re-raises immediately (ADVICE r4: an unrelated error merely mentioning
    "unavailable" must fail fast). ONE definition, shared by bench.py and the
    probe scripts, so the signature can never silently diverge."""
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:
            msg = repr(e)
            is_rt = type(e).__name__ in ("JaxRuntimeError", "XlaRuntimeError")
            transient = is_rt and ("remote_compile" in msg
                                   or "response body closed" in msg
                                   or "UNAVAILABLE" in msg)
            if attempt >= retries or not transient:
                raise
            print(f"{what}: transient tunnel error ({msg[:120]}); "
                  f"retry {attempt + 1}/{retries} after {backoff_s:.0f}s",
                  file=sys.stderr)
            time.sleep(backoff_s)


# ---------------------------------------------------------------------------
# FLOP / MFU accounting (round-1 verdict: perf numbers need denominators).
# FLOPs and HBM bytes come from XLA's own cost model on the COMPILED module
# (compiled.cost_analysis()), so they track the program actually executed —
# fusion, rematerialization, layout padding — rather than a hand count.
# Peaks: v5e MXU is 197 TFLOP/s bf16 (fp32 matmuls run bf16 multiplies at
# DEFAULT precision on TPU, so bf16 peak is the honest denominator) and
# 819 GB/s HBM. MFU = model_flops / (step_time * peak_flops); the HBM
# utilization column says whether the program is bandwidth-bound instead.
# ---------------------------------------------------------------------------

_PEAK_FLOPS = {  # bf16 matmul peak, FLOP/s
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}
_PEAK_HBM = {  # bytes/s
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v4": 1228e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
}


def device_peaks() -> tuple[float, float] | None:
    """(peak_flops, peak_hbm_bytes_per_sec) for this device, None if unknown."""
    kind = jax.devices()[0].device_kind
    if kind in _PEAK_FLOPS:
        return _PEAK_FLOPS[kind], _PEAK_HBM[kind]
    return None


def _compiled_cost(fn, *args) -> dict:
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0))}


def step_cost(cfg: Config, batch_size: int, train: bool = False,
              seed: int = 0) -> dict:
    """XLA cost-model FLOPs + HBM bytes for ONE forward (or train) step."""
    model = FVTAModel(cfg=cfg)
    shared = synth_shared(cfg, seed=seed)
    batch = synth_batch(cfg, batch_size, seed=seed + 1)

    @jax.jit
    def _init(k, sh, b):
        return model.init(k, sh, assemble(sh, b), train=False)

    params = _init(jax.random.key(0), shared, batch)
    if not train:
        from fvta_memexqa_tpu.train import make_eval_tables

        vt, pt = make_eval_tables(model, params, shared)

        def fwd(p, sh, b, v, pho):
            return model.apply(p, sh, assemble(sh, b, pho), train=False,
                               vocab_table=v).logits

        return _compiled_cost(fwd, params, shared, batch, vt, pt)

    from fvta_memexqa_tpu.train import init_state, loss_and_metrics, make_optimizer

    state = init_state(cfg, model, shared, batch)
    opt = make_optimizer(cfg)

    def tstep(st, sh, b):
        def loss_fn(p):
            return loss_and_metrics(model, p, sh, b, jax.random.key(0), True)[0]

        loss, g = jax.value_and_grad(loss_fn)(st.params)
        up, opt_state = opt.update(g, st.opt_state, st.params)
        params2 = jax.tree.map(lambda a, u: a + u, st.params, up)
        return loss, params2, opt_state

    return _compiled_cost(tstep, state, shared, batch)


def _timed_loop_fn(model: FVTAModel):
    """K dependency-chained forwards inside ONE jit.

    Measurement methodology (recorded in BASELINE.md): on this box the TPU sits
    behind the axon tunnel, where (a) block_until_ready does not actually block and
    (b) every host<->device fetch pays a large, variable round-trip, so naive
    per-call wall timing is meaningless. Instead we run K forwards inside one jitted
    fori_loop with a forced data dependency between iterations (each step's output
    perturbs the next step's input by a runtime-zero the compiler cannot fold, which
    defeats loop-invariant code motion) and time two different K values; the slope
    (d_K2 - d_K1)/(K2 - K1) cancels the constant dispatch+fetch overhead and yields
    pure on-device step time.
    """

    from functools import partial

    @partial(jax.jit, static_argnums=5)
    def fwd_loop(p, sh, b, vt, pt, k):
        def body(i, carry):
            acc, feedback = carry
            # Perturb an input on EVERY independent compute path (question, choices,
            # album/photo gathers + all context encoders) or XLA hoists the
            # untouched paths out of the loop and the measurement undercounts.
            # The vocab embed table vt and photo table pt are INTENTIONALLY
            # loop-invariant: production evaluation precomputes both once per
            # checkpoint (train.make_eval_tables) and every eval step consumes
            # the cached tables, exactly as here. The per-batch photo gather
            # itself still recomputes (album_idx is perturbed).
            b2 = b.replace(
                q_words=b.q_words + feedback,
                choice_words=b.choice_words + feedback,
                album_idx=b.album_idx + feedback,
            )
            lg = model.apply(p, sh, assemble(sh, b2, pt), train=False,
                             vocab_table=vt).logits
            s = lg.sum()
            fb = jnp.where(jnp.isnan(s), 1, 0).astype(jnp.int32)  # 0 at runtime
            return acc + s, fb

        return jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), jnp.int32(0)))[0]

    return fwd_loop


def bench_train(cfg: Config, batch_size: int = 64, k_small: int = 10,
                k_large: int = 60, reps: int = 3, seed: int = 0) -> float:
    """Training-step throughput (BASELINE.json config 2): full fwd+bwd+adam,
    dependency-chained inside one jit. Returns QA-pairs/sec."""
    import time
    from functools import partial

    from fvta_memexqa_tpu.train import init_state, loss_and_metrics, make_optimizer

    model = FVTAModel(cfg=cfg)
    shared = synth_shared(cfg, seed=seed)
    batch = synth_batch(cfg, batch_size, seed=seed + 1)
    state = init_state(cfg, model, shared, batch)
    opt = make_optimizer(cfg)

    @partial(jax.jit, static_argnums=3)
    def loop(st, sh, b, k):
        def body(i, carry):
            params, opt_state, fb = carry
            b2 = b.replace(q_words=b.q_words + fb, choice_words=b.choice_words + fb,
                           album_idx=b.album_idx + fb)

            def loss_fn(p):
                return loss_and_metrics(model, p, sh, b2, jax.random.fold_in(
                    jax.random.key(0), i), True)[0]

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt_state = opt.update(g, opt_state, params)
            params = jax.tree.map(lambda a, u: a + u, params, up)
            fb = jnp.where(jnp.isnan(loss), 1, 0).astype(jnp.int32)
            return params, opt_state, fb

        params, opt_state, _ = jax.lax.fori_loop(
            0, k, body, (st.params, st.opt_state, jnp.int32(0)))
        return jax.tree.leaves(params)[0].sum()

    return batch_size / _median_slope(
        lambda k: np.asarray(loop(state, shared, batch, k)), k_small, k_large, reps)


def bench_train_dedup(cfg: Config, batch_size: int = 64, k_small: int = 10,
                      k_large: int = 60, reps: int = 3, seed: int = 0):
    """Training-step throughput through the album-dedup step
    (TrainConfig.dedup_albums): same fwd+bwd+adam chain as bench_train but the
    context encode runs over the batch's UNIQUE albums + gather. The unique
    buffer is sized to this batch's actual unique count (rounded up to 8) so
    the number reflects the achievable win at this batch's duplicate rate.
    Returns (qa_pairs_per_sec, unique_frac)."""
    from functools import partial

    from fvta_memexqa_tpu.train import (a1_config, dedup_album_batch,
                                        dedup_loss_and_metrics, init_state,
                                        make_optimizer)

    model = FVTAModel(cfg=cfg)
    a1_model = FVTAModel(cfg=a1_config(cfg))
    shared = synth_shared(cfg, seed=seed)
    batch = synth_batch(cfg, batch_size, seed=seed + 1)
    slots = batch_size * cfg.data.max_albums
    n_uniq = len(np.unique(np.asarray(batch.album_idx)))
    u_cap = min(-(-n_uniq // 8) * 8, slots)
    dd = dedup_album_batch(np.asarray(batch.album_idx), u_cap)
    uniq, inv = jnp.asarray(dd[0]), jnp.asarray(dd[1])
    state = init_state(cfg, model, shared, batch)
    opt = make_optimizer(cfg)

    @partial(jax.jit, static_argnums=5)
    def loop(st, sh, b, u, iv, k):
        def body(i, carry):
            params, opt_state, fb = carry
            # perturb EVERY independent compute path (uniq drives the context
            # encode; q/choice words drive the query side) or XLA hoists it
            b2 = b.replace(q_words=b.q_words + fb, choice_words=b.choice_words + fb)
            u2 = u + fb

            def loss_fn(p):
                return dedup_loss_and_metrics(
                    model, a1_model, p, sh, b2, u2, iv,
                    jax.random.fold_in(jax.random.key(0), i), True)[0]

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt_state = opt.update(g, opt_state, params)
            params = jax.tree.map(lambda a, u_: a + u_, params, up)
            fb = jnp.where(jnp.isnan(loss), 1, 0).astype(jnp.int32)
            return params, opt_state, fb

        params, opt_state, _ = jax.lax.fori_loop(
            0, k, body, (st.params, st.opt_state, jnp.int32(0)))
        return jax.tree.leaves(params)[0].sum()

    qps = batch_size / _median_slope(
        lambda k: np.asarray(loop(state, shared, batch, uniq, inv, k)),
        k_small, k_large, reps)
    return qps, n_uniq / slots


def bench_cached_inference(cfg: Config, batch_size: int = 64, k_small: int = 25,
                           k_large: int = 250, reps: int = 3, seed: int = 0,
                           prebuilt=None, cache_dtype: str = "float32",
                           n_chunks: int = 1):
    """Test-set inference throughput through the album-encoding cache
    (eval_cache.py): the TPU-native restructuring of BASELINE.json config 1 —
    identical logits to the full forward, context encoders amortized across the
    questions sharing albums. Returns (qa_pairs_per_sec, cache_seconds,
    prebuilt) where prebuilt = (params, cache_h, cache_m, vt, pt) can be passed
    back in to reuse the (batch-size-independent) album cache across a sweep.

    cache_dtype="bfloat16" stores the album cache in bf16 and upcasts to f32
    right after the per-question gather — halves the gather's HBM bytes while
    keeping the answer math f32 (the HBM-bound-cached-eval experiment;
    BASELINE.md records the verdict).

    n_chunks>1: split each batch into n_chunks sub-batches INSIDE the jit,
    gather+answer per chunk — the double-buffering probe at the bs=256
    bandwidth wall (round-4 verdict weak #4): TPU DMA engines run parallel
    to compute, so chunk i+1's cache gather can overlap chunk i's answer
    math if the monolithic step was serializing them. Identical math."""
    import time
    from functools import partial

    from fvta_memexqa_tpu.eval_cache import precompute_album_cache

    model = FVTAModel(cfg=cfg)
    shared = synth_shared(cfg, seed=seed)
    batch = synth_batch(cfg, batch_size, seed=seed + 1)

    if prebuilt is not None:
        params, cache_h, cache_m, vt0, pt0 = prebuilt
        cache_s = 0.0
    else:
        @jax.jit
        def _init(k, sh, b):
            return model.init(k, sh, assemble(sh, b), train=False)

        params = _init(jax.random.key(0), shared, batch)
        from fvta_memexqa_tpu.train import make_eval_tables

        t0 = time.perf_counter()
        vt0, pt0 = make_eval_tables(model, params, shared)
        cache_h, cache_m = precompute_album_cache(cfg, model, params, shared,
                                                  vocab_table=vt0, photo_table=pt0)
        np.asarray(cache_h[0, 0, 0, 0])  # sync through the tunnel
        cache_s = time.perf_counter() - t0

    from fvta_memexqa_tpu.eval_cache import gather_cached_context

    if cache_dtype == "bfloat16":
        cache_h = cache_h.astype(jnp.bfloat16)

    if batch_size % n_chunks:
        raise ValueError(f"n_chunks {n_chunks} must divide batch {batch_size}")
    csz = batch_size // n_chunks

    @partial(jax.jit, static_argnums=5)
    def loop(p, sh, b, cache, vt, k):
        ch, cm = cache

        def body(i, carry):
            acc, fb = carry
            b2 = b.replace(q_words=b.q_words + fb, choice_words=b.choice_words + fb,
                           album_idx=b.album_idx + fb)
            mi = assemble(sh, b2)
            s = jnp.float32(0.0)
            for c in range(n_chunks):  # unrolled: XLA may overlap chunk c+1's
                sl = slice(c * csz, (c + 1) * csz)  # gather DMA with chunk c
                mic = jax.tree.map(lambda x: x[sl], mi)
                # the exact production gather (eval_cache.gather_cached_context);
                # vt loop-invariant by design: cached per checkpoint in production
                h_ctx, ctx_mask = gather_cached_context(ch, cm, b2.album_idx[sl],
                                                        b2.album_mask[sl])
                h_ctx = h_ctx.astype(jnp.float32)  # no-op for the f32 cache
                out = model.apply(p, sh, mic, h_ctx, ctx_mask, train=False,
                                  vocab_table=vt, method=model.answer)
                s = s + out.logits.sum()
            return acc + s, jnp.where(jnp.isnan(s), 1, 0).astype(jnp.int32)

        return jax.lax.fori_loop(0, k, body, (jnp.float32(0), jnp.int32(0)))[0]

    cache = (cache_h, cache_m)
    per = _median_slope(
        lambda k: np.asarray(loop(params, shared, batch, cache, vt0, k)),
        k_small, k_large, reps)
    return batch_size / per, cache_s, (params, cache_h, cache_m, vt0, pt0)


def _video_setup(t_frames: int, use_pallas: bool, batch_size: int, seed: int):
    import dataclasses

    from fvta_memexqa_tpu.models.video import VideoFVTAModel, make_synthetic_video

    cfg = realistic_config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                pallas_attention=use_pallas))
    model = VideoFVTAModel(cfg=cfg, num_choices=5)
    shared = synth_shared(cfg, num_albums=2, num_photos=2, seed=seed)
    vi, _ = make_synthetic_video(cfg, num_videos=batch_size, num_frames=t_frames,
                                 seed=seed)
    params = jax.jit(lambda k: model.init(k, shared, vi, train=False))(
        jax.random.key(0))
    return model, shared, vi, params


def video_step_cost(t_frames: int, batch_size: int = 8, seed: int = 0) -> dict:
    """XLA cost-model FLOPs + HBM bytes for ONE video forward step. Always
    costed on the XLA attention path: Pallas custom calls contribute 0 FLOPs
    to XLA's cost model, and both backends compute the same math."""
    model, shared, vi, params = _video_setup(t_frames, False, batch_size, seed)
    return _compiled_cost(
        lambda p, sh, v: model.apply(p, sh, v, train=False).logits,
        params, shared, vi)


def bench_video(t_frames: int, use_pallas: bool, batch_size: int = 8,
                reps: int = 3, seed: int = 0, min_signal_s: float = 0.6,
                max_k: int = 20000, flops_per_step: float | None = None,
                peak_flops: float | None = None, mfu_cap: float = 0.5) -> float | None:
    """Long-T video-QA forward throughput in frames/sec (BASELINE.json config 4).

    Single chip, dilated-conv temporal encoder (parallel over T), FVTA attention
    either via XLA einsum+softmax or the fused Pallas kernel (use_pallas) — the
    head-to-head that shows where streaming over T starts winning. Same
    dependency-chained slope methodology as bench_inference, with two
    round-2-verdict hardenings:

    - K CALIBRATION: the video step is fast (sub-ms at T=1024), so fixed small
      Ks put the whole slope signal under the axon tunnel's noise floor
      (~0.8 s fetch variance — CLAUDE.md). k_large grows until the measured
      chained-compute signal between k_small and k_large clears min_signal_s.
      The loop takes K as a TRACED argument (fori_loop with a dynamic trip
      count) so recalibration never recompiles.
    - MFU SANITY GUARD: with the XLA cost model's FLOPs for this exact step
      (video_step_cost) and the chip's peak, a measurement implying
      > mfu_cap (default 50%) machine utilization for this VPU-heavy workload
      is physically implausible → re-measure with a doubled signal target;
      after 3 implausible attempts return None (a null artifact field beats a
      wrong one).
    """
    model, shared, vi, params = _video_setup(t_frames, use_pallas, batch_size,
                                             seed)

    @jax.jit
    def loop(p, sh, v, k):
        def body(i, carry):
            acc, fb = carry
            v2 = v.replace(q_words=v.q_words + fb, choice_words=v.choice_words + fb,
                           frame_feats=v.frame_feats + fb.astype(jnp.float32))
            sh2 = sh.replace(vocab_chars=sh.vocab_chars + fb)
            s = model.apply(p, sh2, v2, train=False).logits.sum()
            return acc + s, jnp.where(jnp.isnan(s), 1, 0).astype(jnp.int32)

        return jax.lax.fori_loop(0, k, body, (jnp.float32(0), jnp.int32(0)))[0]

    def run(k):
        return np.asarray(loop(params, shared, vi, jnp.int32(k)))

    k_small, k_large = 5, 60
    run(k_small)  # compile once (k is traced)
    for attempt in range(3):
        # grow k_large until the slope signal clears the noise floor
        for _ in range(8):
            run(k_small)
            t0 = time.perf_counter()
            run(k_small)
            d1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(k_large)
            d2 = time.perf_counter() - t0
            sig = d2 - d1
            if sig >= min_signal_s or k_large >= max_k:
                break
            k_large = min(max_k, int(k_large * max(
                2.0, 1.5 * min_signal_s / max(sig, 1e-3))))
        per = _median_slope(run, k_small, k_large, reps)
        if per <= 0:
            # sub-noise-floor signal can make run(k_large) measure FASTER than
            # run(k_small); a non-positive slope is garbage, never a reading
            # (it would also pass the MFU cap below as a negative MFU)
            print(f"bench_video t={t_frames} pallas={use_pallas}: non-positive "
                  f"slope ({per:.3e}s), re-measuring with larger K",
                  file=sys.stderr, flush=True)
            min_signal_s *= 2.0
            continue
        fps = batch_size * t_frames / per
        if flops_per_step is None or peak_flops is None:
            return fps
        implied_mfu = flops_per_step / (per * peak_flops)
        if implied_mfu <= mfu_cap:
            return fps
        # stderr: bench.py's stdout contract is exactly ONE JSON line
        print(f"bench_video t={t_frames} pallas={use_pallas}: rejected "
              f"{fps:.3e} frames/s (implied MFU {implied_mfu*100:.0f}% > "
              f"{mfu_cap*100:.0f}%), re-measuring with larger K",
              file=sys.stderr, flush=True)
        min_signal_s *= 2.0
    return None


def bench_inference(cfg: Config, batch_sizes=(8, 64, 256), k_small: int = 25,
                    k_large: int = 250, reps: int = 3, seed: int = 0) -> list[BenchResult]:
    model = FVTAModel(cfg=cfg)
    shared = synth_shared(cfg, seed=seed)
    fwd_loop = _timed_loop_fn(model)
    results = []
    params = None
    for bs in batch_sizes:
        batch = synth_batch(cfg, bs, seed=seed + 1)
        if params is None:
            @jax.jit
            def _init(k, sh, b):
                return model.init(k, sh, assemble(sh, b), train=False)
            params = _init(jax.random.key(0), shared, batch)
            from fvta_memexqa_tpu.train import make_eval_tables

            vt, pt = make_eval_tables(model, params, shared)  # once per checkpoint

        t0 = time.perf_counter()
        np.asarray(fwd_loop(params, shared, batch, vt, pt, k_small))
        compile_s = time.perf_counter() - t0
        per = _median_slope(
            lambda k: np.asarray(fwd_loop(params, shared, batch, vt, pt, k)),
            k_small, k_large, reps)
        results.append(BenchResult(
            batch_size=bs,
            qa_pairs_per_sec=bs / per,
            p50_latency_ms=per * 1e3,
            compile_s=compile_s,
        ))
    return results
