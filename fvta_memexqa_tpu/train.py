"""Jitted train/eval steps + the training loop.

Rebuild of the reference's main.py/trainer.py/tester.py driver layer (SURVEY.md
sections 2-3): the epoch/batch loop, periodic validation, keep-best checkpointing —
but TPU-native: one jitted, donated train step over a ("data","ctx") mesh; the
device-side prepro gather (data/device_prepro.py) runs INSIDE the step so only id
tensors cross the host boundary; optax adam/adadelta with global-norm clipping;
metrics as JSONL.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import optax

from fvta_memexqa_tpu.config import Config
from fvta_memexqa_tpu.checkpoint import CheckpointManager
from fvta_memexqa_tpu.data.device_prepro import SharedTables, assemble, device_put_batch
from fvta_memexqa_tpu.data.pipeline import Batch, Dataset
from fvta_memexqa_tpu.models.fvta import FVTAModel
from fvta_memexqa_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from fvta_memexqa_tpu.utils.metrics import MetricsLogger, Timer


def maybe_enable_debug_nans() -> bool:
    """FVTA_DEBUG_NANS=1 → jax_debug_nans (SURVEY.md section 5 race/sanitizer row:
    the determinism/debug tooling the reference lacks). Under the flag every jitted
    computation re-runs op-by-op on a NaN and raises at the producing op; the train
    loop additionally hard-fails on a non-finite loss at each log boundary."""
    import os

    on = os.environ.get("FVTA_DEBUG_NANS", "") not in ("", "0", "false")
    if on:
        jax.config.update("jax_debug_nans", True)
    return on


def check_finite_loss(loss: float, step: int) -> None:
    """Raise with context if the training loss went non-finite."""
    import math

    if not math.isfinite(loss):
        raise FloatingPointError(
            f"non-finite training loss {loss!r} at step {step}; rerun with "
            "FVTA_DEBUG_NANS=1 to locate the producing op")


@flax.struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray      # i32 scalar
    rng_key: jnp.ndarray   # raw key data (uint32), restorable by orbax


def canonical_model(model):
    """Canonicalize a model's static identity for jit keying: the model graph
    reads ONLY cfg.model + cfg.data (verified — no cfg.train/cfg.mesh use in
    models/), so two models whose configs differ only in loop bookkeeping
    (num_epochs, periods, seed, mesh axes) must share one trace. Without this,
    e.g. resuming a run with a higher num_epochs recompiled the full model
    (~35s measured on this box)."""
    from fvta_memexqa_tpu.config import MeshConfig, TrainConfig

    cfg = model.cfg
    canon = cfg.replace(train=TrainConfig(), mesh=MeshConfig())
    return model if cfg == canon else model.clone(cfg=canon)


def _opt_key(cfg: Config) -> tuple:
    """The ONLY TrainConfig fields the jitted step depends on. The train-step
    jit is static-keyed on this tuple, NOT the whole Config — otherwise two
    configs differing only in loop bookkeeping (num_epochs, periods, seed)
    would retrace the full model (measured ~35s per retrace on this box)."""
    t = cfg.train
    return (t.optimizer, t.learning_rate, t.grad_clip_norm,
            t.lr_schedule, t.warmup_steps, t.decay_steps, t.grad_accum)


def _make_lr(learning_rate: float, schedule: str, warmup_steps: int,
             decay_steps: int):
    """LR schedule over OPTIMIZER steps: linear 0→lr warmup, then constant,
    cosine-to-0, or linear-to-0 over decay_steps. Returns a float for the
    plain constant case (keeps old opt states' structure identical)."""
    if schedule == "constant":
        if warmup_steps <= 0:
            return learning_rate
        tail = optax.constant_schedule(learning_rate)
    elif schedule in ("cosine", "linear"):
        if decay_steps <= 0:
            raise ValueError(f"lr_schedule={schedule!r} needs decay_steps > 0 "
                             "(the horizon it decays over)")
        tail = (optax.cosine_decay_schedule(learning_rate, decay_steps)
                if schedule == "cosine"
                else optax.linear_schedule(learning_rate, 0.0, decay_steps))
    else:
        raise ValueError(f"unknown lr_schedule {schedule!r} "
                         "(expected constant | cosine | linear)")
    if warmup_steps <= 0:
        return tail
    return optax.join_schedules(
        [optax.linear_schedule(0.0, learning_rate, warmup_steps), tail],
        boundaries=[warmup_steps])


def _optimizer_from_key(key: tuple) -> optax.GradientTransformation:
    (optimizer, learning_rate, grad_clip_norm,
     lr_schedule, warmup_steps, decay_steps, grad_accum) = key
    lr = _make_lr(learning_rate, lr_schedule, warmup_steps, decay_steps)
    if optimizer == "adam":
        opt = optax.adam(lr)
    elif optimizer == "adadelta":
        opt = optax.adadelta(lr)
    else:
        raise ValueError(f"unknown optimizer {optimizer}")
    if grad_clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip_norm), opt)
    if grad_accum > 1:
        # accumulate/average grads over k microbatches, apply on the k-th;
        # schedule + accumulator state live in opt_state (exact resume holds)
        ms = optax.MultiSteps(opt, every_k_schedule=grad_accum)
        opt = optax.GradientTransformation(ms.init, ms.update)
    return opt


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    return _optimizer_from_key(_opt_key(cfg))


def masked_choice_metrics(logits, label, ex_mask) -> dict:
    """Parity-critical metric tail shared by every eval/train path: masked
    per-example NLL + correctness counts (ex_mask excludes pad rows)."""
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, label[:, None], axis=1)[:, 0]
    w = ex_mask.astype(logp.dtype)
    correct = ((jnp.argmax(logits, -1) == label).astype(logp.dtype) * w).sum()
    return {"correct": correct, "count": w.sum(), "loss_sum": (nll * w).sum()}


def loss_and_metrics(model: FVTAModel, params, shared: SharedTables, batch: Batch,
                     dropout_rng, train: bool, vocab_table=None, photo_table=None):
    """Masked 4-way cross-entropy + accuracy counts. ex_mask excludes pad rows.
    vocab_table / photo_table: optional precomputed per-checkpoint tables
    (frozen-param evaluation; see make_vocab_table / make_photo_table)."""
    mi = assemble(shared, batch, photo_table)
    rngs = {"dropout": dropout_rng} if train else None
    out = model.apply(params, shared, mi, train=train, rngs=rngs,
                      vocab_table=vocab_table)
    m = masked_choice_metrics(out.logits, mi.label, mi.ex_mask)
    loss = m["loss_sum"] / jnp.maximum(m["count"], 1.0)
    return loss, m


# The step builders return module-level jits with (cfg, model) STATIC — both
# are frozen dataclasses, so equal configs hash equal and every train()/
# evaluate()/serve entry in a process shares one trace per config instead of
# re-tracing a fresh closure per call (measured: repeated run_train calls in
# the suite spent more time re-tracing than training).
import functools as _functools


@_functools.partial(jax.jit, static_argnums=0)
def _init_params_jit(model, k, sh, b):
    mi = assemble(sh, b)
    return model.init(k, sh, mi, train=False)


def init_state(cfg: Config, model: FVTAModel, shared: SharedTables, batch: Batch,
               seed: int | None = None) -> TrainState:
    seed = cfg.train.seed if seed is None else seed
    key = jax.random.key(seed)
    k_init, k_run = jax.random.split(key)

    params = _init_params_jit(canonical_model(model), k_init, shared, batch)
    opt = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        step=jnp.asarray(0, jnp.int32),
        rng_key=jax.random.key_data(k_run),
    )


@_functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2,))
def _train_step_jit(opt_key, model, state, shared, batch):
    opt = _optimizer_from_key(opt_key)

    def _wrapped_loss(params, sh, b, k):
        return loss_and_metrics(model, params, sh, b, k, True)

    key = jax.random.wrap_key_data(state.rng_key)
    key, k_drop = jax.random.split(key)
    (loss, m), grads = jax.value_and_grad(_wrapped_loss, has_aux=True)(
        state.params, shared, batch, k_drop
    )
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        params=params,
        opt_state=opt_state,
        step=state.step + 1,
        rng_key=jax.random.key_data(key),
    )
    metrics = {"loss": loss, "acc": m["correct"] / jnp.maximum(m["count"], 1.0)}
    return new_state, metrics


def make_train_step(cfg: Config, model: FVTAModel):
    return _functools.partial(_train_step_jit, _opt_key(cfg),
                              canonical_model(model))


# ---- train-time album dedup (TrainConfig.dedup_albums) ----------------------
# The train-side twin of eval_cache.py: MemexQA batches reference far fewer
# distinct albums than they have album slots (~18-32% duplicates measured), and
# the context encoders are ~72% of the step (BASELINE.md), so encoding each
# distinct album once and gathering per-question rows saves real step time.
# The gather's transpose is a scatter-add, so duplicate slots' gradients
# accumulate onto their shared album encode — the update is exact at
# keep_prob=1.0 (parity-tested in tests/test_dedup_train.py); with dropout on,
# duplicate slots share one noise draw (gated by the same overfit check).


def dedup_album_batch(album_idx, u_cap: int):
    """Host-side unique+inverse over a batch's album ids.

    album_idx: host i32 [N, A] (0 = pad). Returns (uniq [u_cap] i32 padded
    with 0, inv [N, A] i32 with uniq[inv] == album_idx), or None when the
    batch has more than u_cap distinct ids (caller falls back to the plain
    step). Must run BEFORE device transfer — np.asarray on a device array
    would force a device→host fetch per step."""
    import numpy as np

    a = np.asarray(album_idx)
    uniq, inv = np.unique(a, return_inverse=True)
    if len(uniq) > u_cap:
        return None
    pad = u_cap - len(uniq)
    if pad:
        uniq = np.concatenate([uniq, np.zeros(pad, uniq.dtype)])
    return uniq.astype(np.int32), inv.reshape(a.shape).astype(np.int32)


def a1_config(cfg: Config) -> Config:
    """The album-only (max_albums=1) twin of a config: the model that encodes
    one album per row. Single definition shared by the dedup train step, the
    eval cache, and the bench — param structure is identical to the full
    model's, so the same params tree drives both."""
    import dataclasses

    return cfg.replace(data=dataclasses.replace(cfg.data, max_albums=1))


def dedup_u_cap(cfg: Config) -> int:
    """Static unique-buffer size: ceil(dedup_cap * N * A), rounded up to a
    multiple of 8 (sublane-friendly), clamped to [8, N*A]."""
    import math

    slots = cfg.train.batch_size * cfg.data.max_albums
    cap = math.ceil(cfg.train.dedup_cap * slots / 8) * 8
    return max(8, min(cap, slots))


def dedup_loss_and_metrics(model: FVTAModel, a1_model: FVTAModel, params,
                           shared: SharedTables, batch: Batch, uniq, inv,
                           dropout_rng, train: bool):
    """loss_and_metrics through the dedup context encode: each distinct album
    encodes once ([U, 6, T, 2H]), per-question context rows come from a gather
    (eval_cache.gather_cached_context — the same definition the cached eval
    path uses, so mask semantics stay single-sourced)."""
    from fvta_memexqa_tpu.data.device_prepro import assemble_albums
    from fvta_memexqa_tpu.eval_cache import gather_cached_context

    if train and dropout_rng is not None:
        k_ctx, k_ans = jax.random.split(dropout_rng)
        rngs_ctx, rngs_ans = {"dropout": k_ctx}, {"dropout": k_ans}
    else:
        rngs_ctx = rngs_ans = None
    vt = None
    if model.cfg.model.vocab_embed:
        # once per step, shared by both halves (same as __call__'s sharing)
        vt = model.apply(params, shared, method=FVTAModel._vocab_table)
    mi = assemble(shared, batch)  # album-side gathers are DCE'd (unused below)
    mi_u = assemble_albums(a1_model.cfg.data, shared, uniq)
    h_u, m_u = a1_model.apply(params, shared, mi_u, train=train, rngs=rngs_ctx,
                              vocab_table=vt, method=a1_model.encode_context)
    h_ctx, ctx_mask = gather_cached_context(h_u, m_u, inv, batch.album_mask)
    out = model.apply(params, shared, mi, h_ctx, ctx_mask, train=train,
                      rngs=rngs_ans, vocab_table=vt, method=model.answer)
    m = masked_choice_metrics(out.logits, mi.label, mi.ex_mask)
    loss = m["loss_sum"] / jnp.maximum(m["count"], 1.0)
    return loss, m


@_functools.partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3,))
def _dedup_train_step_jit(opt_key, model, a1_model, state, shared, batch,
                          uniq, inv):
    opt = _optimizer_from_key(opt_key)

    def _wrapped_loss(params, sh, b, u, iv, k):
        return dedup_loss_and_metrics(model, a1_model, params, sh, b, u, iv,
                                      k, True)

    key = jax.random.wrap_key_data(state.rng_key)
    key, k_drop = jax.random.split(key)
    (loss, m), grads = jax.value_and_grad(_wrapped_loss, has_aux=True)(
        state.params, shared, batch, uniq, inv, k_drop
    )
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        params=params,
        opt_state=opt_state,
        step=state.step + 1,
        rng_key=jax.random.key_data(key),
    )
    metrics = {"loss": loss, "acc": m["correct"] / jnp.maximum(m["count"], 1.0)}
    return new_state, metrics


def make_dedup_train_step(cfg: Config, model: FVTAModel):
    """Dedup train step: (state, shared, batch, uniq, inv) → (state, metrics).
    uniq/inv come from dedup_album_batch (host side, pre-transfer)."""
    return _functools.partial(_dedup_train_step_jit, _opt_key(cfg),
                              canonical_model(model),
                              canonical_model(FVTAModel(cfg=a1_config(model.cfg))))


@_functools.partial(jax.jit, static_argnums=0)
def _eval_step_jit(model, params, shared, batch, vocab_table=None,
                   photo_table=None):
    _, m = loss_and_metrics(model, params, shared, batch, None, False,
                            vocab_table, photo_table)
    return m


def make_eval_step(cfg: Config, model: FVTAModel):
    return _functools.partial(_eval_step_jit, canonical_model(model))


# Module-level jits with the (hashable, frozen-config) model static: repeated
# make_*_table calls — every val period, every serve/bench/eval entry — hit the
# jit cache instead of re-tracing a fresh lambda each time.
import functools


@functools.partial(jax.jit, static_argnums=0)
def _vocab_table_jit(model, params, shared):
    return model.apply(params, shared, method=FVTAModel._vocab_table)


@functools.partial(jax.jit, static_argnums=0)
def _photo_table_jit(model, params, shared):
    return model.apply(params, shared, method=FVTAModel._photo_table)


def make_vocab_table(model: FVTAModel, params, shared: SharedTables):
    """Precompute the token-embedding table for frozen-param evaluation
    (pure function of params+shared; ~22% of a forward step amortized away —
    identical logits, parity-tested)."""
    if not model.cfg.model.vocab_embed:
        return None
    return _vocab_table_jit(canonical_model(model), params, shared)


def make_photo_table(model: FVTAModel, params, shared: SharedTables):
    """Precompute the album-major pre-projected photo-feature table for
    frozen-param evaluation (pure function of params+shared; replaces the
    per-step raw [N,A,P,2537] gather + projection — identical logits,
    parity-tested). Pass to assemble()/eval_step as photo_table."""
    return _photo_table_jit(canonical_model(model), params, shared)


def make_eval_tables(model: FVTAModel, params, shared: SharedTables):
    """(vocab_table, photo_table) for frozen-param consumers, one call."""
    return (make_vocab_table(model, params, shared),
            make_photo_table(model, params, shared))


def evaluate(eval_step, params, shared: SharedTables, dataset: Dataset,
             batch_size: int, mesh=None, vocab_table=None,
             photo_table=None, prefetch: int = 0) -> dict:
    """Full-split evaluation → {"acc", "loss", "count"} (reference tester.py).

    Per-batch metrics accumulate ON DEVICE and are fetched once at the end — a
    float() per batch would force a host sync each step (very expensive through
    this box's tunnel, and needless anywhere)."""
    xfer = (lambda b: shard_batch(mesh, b)) if mesh else device_put_batch
    batch_it = dataset.get_batches(batch_size, shuffle=False)
    if prefetch > 0:
        from fvta_memexqa_tpu.data.stream import Prefetcher

        batch_it = Prefetcher(batch_it, depth=prefetch, transfer=xfer)
    totals = None
    try:
        for batch in batch_it:
            if prefetch <= 0:
                batch = xfer(batch)
            m = eval_step(params, shared, batch, vocab_table, photo_table)
            totals = m if totals is None else jax.tree.map(jnp.add, totals, m)
    finally:
        if prefetch > 0:
            batch_it.close()
    totals = jax.tree.map(float, totals or {"correct": 0.0, "count": 0.0,
                                            "loss_sum": 0.0})
    return {
        "acc": totals["correct"] / max(totals["count"], 1.0),
        "loss": totals["loss_sum"] / max(totals["count"], 1.0),
        "count": int(totals["count"]),
    }


def train(cfg: Config, packed, out_dir: str, num_steps: int | None = None,
          metrics_path: str | None = None, echo: bool = True,
          profile_dir: str | None = None, datasets=None,
          prefetch: int = 0) -> dict:
    """Full training: epochs over train split, periodic val, keep-best checkpoints.

    datasets: optional (train_ds, val_ds) override — any objects with the
    pipeline.Dataset interface (num_batches/get_batches), e.g. the
    memory-bounded data.stream.StreamingDataset. val_ds may be None.
    prefetch: if >0, host batch prep + host→device transfer run in a
    background thread `prefetch` batches ahead (data.stream.Prefetcher).

    Returns {"best_val_acc", "steps", "state"} for programmatic use (tests/serving).
    """
    maybe_enable_debug_nans()
    model = FVTAModel(cfg=cfg)
    shared = SharedTables.from_packed(packed.shared)
    if datasets is not None:
        train_ds, val_ds = datasets
    else:
        train_ds = Dataset(packed, "train")
        val_ds = Dataset(packed, "val") if packed.splits.get(
            "val") is not None and len(packed.splits["val"]["label"]) else None

    mesh = make_mesh(cfg.mesh) if cfg.mesh.num_devices > 1 else None
    if mesh is not None:
        shared = jax.device_put(shared, replicated(mesh))

    first = device_put_batch(next(iter(train_ds.get_batches(cfg.train.batch_size))))

    # One canonical state placement for BOTH the fresh-init and the restore
    # path: orbax returns arrays COMMITTED to devices while fresh init leaves
    # them uncommitted, and committed-ness is part of the jit cache key — a
    # resume otherwise recompiles the full train+eval steps (~25s measured).
    def _canonical_placement(s):
        return jax.device_put(
            s, replicated(mesh) if mesh is not None else jax.devices()[0])

    state = _canonical_placement(init_state(cfg, model, shared, first))

    ckpt = CheckpointManager(out_dir, cfg, max_to_keep=cfg.train.keep_checkpoints)
    start_epoch = 0
    skip_batches = 0
    nb = max(train_ds.num_batches(cfg.train.batch_size), 1)
    if ckpt.latest_step() is not None:
        state = _canonical_placement(ckpt.restore(state))
        # Exact resume (SURVEY.md section 5 "Failure detection"): the data order is
        # deterministic given (seed, epoch), so position = step mod batches-per-epoch
        # resumes the SAME stream — a killed run continues bit-identically (tested by
        # the fault-injection test).
        start_epoch = int(state.step) // nb
        skip_batches = int(state.step) % nb

    train_step = make_train_step(cfg, model)
    eval_step = make_eval_step(cfg, model)
    # Album dedup composes with the DP mesh via GSPMD: uniq is sharded over
    # "data" so each device encodes U/dp unique albums, then XLA all-gathers
    # the (small) unique states for the per-example gather — the GLOBAL dedup
    # rate is kept and the encode splits evenly (docs/DESIGN.md).
    use_dedup = cfg.train.dedup_albums
    if use_dedup:
        import math

        dedup_step = make_dedup_train_step(cfg, model)
        u_cap = dedup_u_cap(cfg)
        if mesh is not None:
            dp = mesh.shape["data"]
            mult = math.lcm(8, dp)
            slots = cfg.train.batch_size * cfg.data.max_albums
            u_cap = min(-(-u_cap // mult) * mult, slots)
    log = MetricsLogger(metrics_path, echo=echo)
    timer = Timer()
    best_val = -1.0
    t = cfg.train
    done = False
    steps_done = int(state.step)  # Python mirror of state.step: avoids a device
    #                               sync per step just to read the counter

    xfer = (lambda b: shard_batch(mesh, b)) if mesh is not None else device_put_batch
    if use_dedup:
        # Dedup runs on the HOST batch (before transfer, so no device fetch),
        # inside the prefetch worker when prefetching. Items become
        # (device_batch, (uniq, inv) | None); None → plain-step fallback.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            _dd_shard = NamedSharding(mesh, _P("data"))
            # device_put the host array straight onto the mesh (one hop, like
            # shard_batch) — jnp.asarray first would commit to the default
            # device and pay a second reshard copy per step
            _put_dd = lambda x: jax.device_put(x, _dd_shard)
        else:
            _put_dd = jnp.asarray

        def xfer_train(b):
            dd = dedup_album_batch(b.album_idx, u_cap)
            b = xfer(b)
            return b, (None if dd is None
                       else (_put_dd(dd[0]), _put_dd(dd[1])))
    else:
        xfer_train = xfer
    window_steps = 0  # steps in the CURRENT timing window (exact across resume/val)
    profiling = False
    for epoch in range(start_epoch, t.num_epochs):
        if done:
            break
        batch_it = train_ds.get_batches(t.batch_size, shuffle=True,
                                        seed=t.seed, epoch=epoch)
        if epoch == start_epoch and skip_batches:
            # already consumed before the checkpoint — drop them BEFORE the
            # prefetcher so the skip costs host slicing only, not transfers
            import itertools

            batch_it = itertools.islice(batch_it, skip_batches, None)
        if prefetch > 0:
            from fvta_memexqa_tpu.data.stream import Prefetcher

            batch_it = Prefetcher(batch_it, depth=prefetch, transfer=xfer_train)
        try:
            for batch in batch_it:
                if prefetch <= 0:
                    batch = xfer_train(batch)
                dd = None
                if use_dedup:
                    batch, dd = batch
                # Tracing (SURVEY.md section 5): profile steps [10, 15) once,
                # after compile noise settles; view with tensorboard/perfetto.
                if profile_dir and steps_done == 10:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                if not timer.samples and timer._t0 is None:
                    timer.start()  # window opens on the first step after a log
                if dd is not None:
                    state, m = dedup_step(state, shared, batch, *dd)
                else:
                    state, m = train_step(state, shared, batch)
                steps_done += 1
                window_steps += 1
                step = steps_done
                if profiling and step == 15:
                    jax.block_until_ready(m["loss"])
                    jax.profiler.stop_trace()
                    profiling = False
                    log.log("profile", step=step, dir=profile_dir)
                if step % t.log_period == 0:
                    # Sync only here: steps dispatch asynchronously between
                    # logs, so host-side batch prep and device compute overlap
                    # (and per-step tunnel round-trips are avoided on this box).
                    jax.block_until_ready(m["loss"])
                    check_finite_loss(float(m["loss"]), step)
                    timer.stop()
                    window = timer.samples[-1]
                    n_steps = max(window_steps, 1)
                    bs = t.batch_size
                    log.log("train", step=step, epoch=epoch, loss=float(m["loss"]),
                            acc=float(m["acc"]),
                            qa_pairs_per_sec=bs * n_steps / max(window, 1e-9),
                            p50_step_ms=window / n_steps * 1e3)
                    timer.reset()
                    window_steps = 0
                if val_ds is not None and step % t.val_period == 0:
                    vm = evaluate(eval_step, state.params, shared, val_ds,
                                  t.eval_batch_size, mesh,
                                  *make_eval_tables(model, state.params, shared),
                                  prefetch=prefetch)
                    log.log("val", step=step, acc=vm["acc"], loss=vm["loss"])
                    best_val = max(best_val, vm["acc"])
                    ckpt.save(step, state, val_acc=vm["acc"])
                    # discard any partial timing window: val wall time must not
                    # be attributed to training throughput
                    timer.reset()
                    window_steps = 0
                elif step % t.save_period == 0:
                    ckpt.save(step, state)
                if num_steps is not None and step >= num_steps:
                    done = True
                    break
        finally:
            if prefetch > 0:
                batch_it.close()  # early break/exception: stop the worker
    if profiling:  # run ended inside the profile window: close the trace
        jax.profiler.stop_trace()
        log.log("profile", step=int(steps_done), dir=profile_dir)

    # final val + save
    step = int(state.step)
    if val_ds is not None:
        vm = evaluate(eval_step, state.params, shared, val_ds, t.eval_batch_size,
                      mesh, *make_eval_tables(model, state.params, shared),
                      prefetch=prefetch)
        log.log("val", step=step, acc=vm["acc"], loss=vm["loss"])
        best_val = max(best_val, vm["acc"])
        ckpt.save(step, state, val_acc=vm["acc"])
    else:
        ckpt.save(step, state)
    ckpt.wait()
    log.close()
    return {"best_val_acc": best_val, "steps": step, "state": state, "model": model,
            "shared": shared, "mesh": mesh}


@_functools.partial(jax.jit, static_argnums=0)
def _attn_dump_step_jit(model, p, sh, b, vt=None, pt=None):
    mi = assemble(sh, b, pt)
    out = model.apply(p, sh, mi, train=False, vocab_table=vt)
    return (jax.nn.softmax(out.logits), out.attention.time_attn,
            out.attention.seq_attn)


def dump_attention(cfg: Config, model: FVTAModel, params, shared: SharedTables,
                   dataset: Dataset, batch_size: int, path: str,
                   mesh=None) -> int:
    """Write per-question FVTA attention maps + predictions to an .npz:
    qid [N], pred [N], label [N], probs [N,4], time_attn [N,S,T] (focal
    within-sequence weights), seq_attn [N,S] (across-sequence weights) —
    the tensors behind the paper's qualitative attention visualizations.
    Returns the number of examples written."""
    import numpy as np

    from fvta_memexqa_tpu.eval_cache import _batch_transfer

    vt, pt = make_eval_tables(model, params, shared)
    step = _functools.partial(_attn_dump_step_jit, canonical_model(model),
                              vt=vt, pt=pt)
    xfer = _batch_transfer(mesh)

    rows = {"qid": [], "pred": [], "label": [], "probs": [],
            "time_attn": [], "seq_attn": []}
    qids = dataset.qids
    seen = 0
    for batch in dataset.get_batches(batch_size, shuffle=False):
        probs, ta, sa = jax.tree.map(np.asarray,
                                     step(params, shared, xfer(batch)))
        keep = np.asarray(batch.ex_mask)
        rows["qid"].append(qids[seen: seen + int(keep.sum())])
        rows["pred"].append(np.argmax(probs, -1)[keep])
        rows["label"].append(np.asarray(batch.label)[keep])
        rows["probs"].append(probs[keep])
        rows["time_attn"].append(ta[keep])
        rows["seq_attn"].append(sa[keep])
        seen += int(keep.sum())
    np.savez_compressed(path, **{k: np.concatenate(v) for k, v in rows.items()})
    return seen


def test(cfg: Config, packed, out_dir: str, load_best: bool = True,
         split: str = "test", metrics_path: str | None = None, echo: bool = True,
         album_cache: bool = True, attention_path: str | None = None,
         by_category: bool = False, shard_cache: bool = False) -> dict:
    """Reference main.py --is_test: restore (best) checkpoint, report accuracy.

    album_cache=True (default) dedupes context encoding across questions via
    eval_cache.py — identical logits, much faster on album-heavy splits;
    album_cache=False is the reference-shaped full re-encode per question.
    attention_path: also dump per-question attention maps (dump_attention).
    by_category: also report the papers' per-question-category accuracy table
    (what/who/when/where/how-many — data/categories.py) under m["by_category"].
    cfg.mesh.num_devices > 1: DP-shard the eval micro-batches over the mesh's
    "data" axis (params/tables/cache replicated) — multi-chip evaluation from
    the same `cli test --data-parallel N` surface train already has.
    shard_cache: additionally row-shard the album cache over the mesh
    (eval_cache.shard_album_cache) — full-corpus eval capacity scales with
    the mesh like `serve --shard-cache`; identical metrics.
    """
    model = FVTAModel(cfg=cfg)
    shared = SharedTables.from_packed(packed.shared)
    mesh = make_mesh(cfg.mesh) if cfg.mesh.num_devices > 1 else None
    if mesh is not None:
        shared = jax.device_put(shared, replicated(mesh))
    ds = Dataset(packed, split)
    first = device_put_batch(next(iter(ds.get_batches(cfg.train.eval_batch_size))))
    state = init_state(cfg, model, shared, first)
    ckpt = CheckpointManager(out_dir, cfg)
    # same canonical placement as run_train (jit-key stability across paths)
    state = jax.device_put(
        ckpt.restore(state, best=load_best),
        replicated(mesh) if mesh is not None else jax.devices()[0])
    timer = Timer()
    timer.start()
    cache = None
    if album_cache:
        from fvta_memexqa_tpu.eval_cache import (evaluate_cached,
                                                 precompute_album_cache)

        sharded = None
        if by_category:  # build once, share with the per-question pass below
            vt, pt = make_eval_tables(model, state.params, shared)
            cache = precompute_album_cache(cfg, model, state.params, shared,
                                           vocab_table=vt, photo_table=pt)
            if shard_cache:  # shard + place once too, for the same reason
                from fvta_memexqa_tpu.eval_cache import _sharded_cache_setup

                sharded = _sharded_cache_setup(mesh, cache,
                                               cfg.train.eval_batch_size)
        m = evaluate_cached(cfg, model, state.params, shared, ds,
                            cfg.train.eval_batch_size, cache=cache, mesh=mesh,
                            shard_cache=shard_cache, sharded=sharded)
    else:
        if shard_cache:
            raise ValueError("--shard-cache shards the album cache; it has "
                             "no effect with --no-album-cache")
        eval_step = make_eval_step(cfg, model)
        vt, pt = make_eval_tables(model, state.params, shared)
        m = evaluate(eval_step, state.params, shared, ds, cfg.train.eval_batch_size,
                     mesh=mesh, vocab_table=vt, photo_table=pt)
    timer.stop()
    log = MetricsLogger(metrics_path, echo=echo)
    log.log("test", split=split, acc=m["acc"], loss=m["loss"], count=m["count"],
            wall_s=timer.samples[0])
    if by_category:
        from fvta_memexqa_tpu.data.categories import (accuracy_by_category,
                                                      question_categories)
        from fvta_memexqa_tpu.eval_cache import predict_cached

        pr = predict_cached(cfg, model, state.params, shared, ds,
                            cfg.train.eval_batch_size, cache=cache, mesh=mesh,
                            shard_cache=shard_cache, sharded=sharded)
        bc = accuracy_by_category(question_categories(packed, split),
                                  pr["pred"] == pr["label"])
        m["by_category"] = bc
        log.log("test_by_category", split=split,
                **{k: v["acc"] for k, v in bc.items()})
    if attention_path:
        n = dump_attention(cfg, model, state.params, shared, ds,
                           cfg.train.eval_batch_size, attention_path, mesh=mesh)
        log.log("attention_dump", split=split, path=attention_path, count=n)
    log.close()
    return m


def test_ensemble(cfg: Config, packed, out_dirs: list[str],
                  load_best: bool = True, split: str = "test",
                  metrics_path: str | None = None, echo: bool = True,
                  by_category: bool = False, shard_cache: bool = False) -> dict:
    """Checkpoint ensembling: average per-question choice probabilities across
    runs, argmax the mean. The reference main.py has no ensemble mode, but the
    papers' strongest reported MemexQA numbers are ensembles (SURVEY.md §6);
    this is the tester-surface equivalent. All runs must share the pack; each
    member is restored under its own saved config (so e.g. attention-variant
    ablation runs can ensemble), evaluated through the album cache, and
    reported individually alongside the ensemble accuracy.
    cfg.mesh.num_devices > 1: each member evaluates DP-sharded over the mesh,
    same as test() (`cli test --data-parallel N --ensemble ...`).
    """
    import os as _os

    import numpy as np

    from fvta_memexqa_tpu.config import load_config
    from fvta_memexqa_tpu.eval_cache import predict_cached

    mesh = make_mesh(cfg.mesh) if cfg.mesh.num_devices > 1 else None
    probs_sum, labels, qid0, members = None, None, None, []
    for d in out_dirs:
        cfg_path = _os.path.join(d, "config.json")
        mcfg = (load_config(cfg_path) if _os.path.exists(cfg_path)
                else cfg).replace(data=packed.cfg)
        import dataclasses as _dc

        # same CPU-eval trap as cli.cmd_test: inference ships XLA
        mcfg = mcfg.replace(model=_dc.replace(mcfg.model,
                                              use_pallas=cfg.model.use_pallas))
        # eval BATCHING follows the CALLER's config, not the member's saved
        # one: the CLI-resolved eval_batch_size is what the user sized (and
        # what --data-parallel/--shard-cache validated divisibility against);
        # a member saved with e.g. eval_batch_size=100 must not crash a DP-8
        # ensemble mid-eval. The member's config still owns the ARCHITECTURE.
        mcfg = mcfg.replace(train=_dc.replace(
            mcfg.train, eval_batch_size=cfg.train.eval_batch_size))
        model = FVTAModel(cfg=mcfg)
        shared = SharedTables.from_packed(packed.shared)
        if mesh is not None:
            shared = jax.device_put(shared, replicated(mesh))
        ds = Dataset(packed, split)
        first = device_put_batch(
            next(iter(ds.get_batches(mcfg.train.eval_batch_size))))
        state = init_state(mcfg, model, shared, first)
        state = jax.device_put(
            CheckpointManager(d, mcfg).restore(state, best=load_best),
            replicated(mesh) if mesh is not None else jax.devices()[0])
        pr = predict_cached(mcfg, model, state.params, shared, ds,
                            mcfg.train.eval_batch_size, mesh=mesh,
                            shard_cache=shard_cache)
        if qid0 is None:
            qid0, labels = pr["qid"], pr["label"]
        members.append({"dir": d,
                        "acc": float((pr["pred"] == pr["label"]).mean())})
        probs_sum = pr["probs"] if probs_sum is None else probs_sum + pr["probs"]
    probs = probs_sum / len(out_dirs)
    correct = np.argmax(probs, -1) == labels
    acc = float(correct.mean())
    m = {"acc": acc, "count": int(labels.shape[0]), "members": members}
    log = MetricsLogger(metrics_path, echo=echo)
    log.log("test_ensemble", split=split, acc=acc, count=m["count"],
            member_accs=[mm["acc"] for mm in members])
    if by_category:  # the papers' table rows, over the ensembled predictions
        from fvta_memexqa_tpu.data.categories import (accuracy_by_category,
                                                      question_categories)

        m["by_category"] = accuracy_by_category(
            question_categories(packed, split), correct)
        log.log("test_by_category", split=split,
                **{k: v["acc"] for k, v in m["by_category"].items()})
    log.close()
    return m
