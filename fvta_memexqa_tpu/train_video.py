"""Video-family (TGIF-QA-style) training driver with full parity to train.py.

The memexqa driver (train.py — the rebuild of the reference's
main.py/trainer.py/tester.py layer, SURVEY.md §2-3) owns periodic validation,
keep-best orbax checkpointing, JSONL metrics, and exact mid-epoch resume; the
video path (BASELINE.json config 4) originally trained through a bare loop in
cli.py with none of that. This module gives the video family the same driver
contract, reusing train.py's state/optimizer machinery verbatim:

- jitted, donated train step (one trace per (optimizer-key, model, cp) triple);
- periodic val on the pack's val split; keep-best via checkpoint.CheckpointManager
  with a task-appropriate score (acc for mc/frameqa, NEGATIVE mse for count —
  the manager maximizes val_acc, so count runs store -mse there);
- exact resume: TrainState carries (params, opt state, step, rng); the
  streaming shuffle is deterministic given (seed, epoch), so position =
  step mod batches-per-epoch re-enters the same stream (same contract the
  fault-injection test pins for the memexqa driver);
- JSONL metrics with the driver metric set (loss, acc, qa_pairs/sec, p50).

The run dir records everything needed to rebuild the model at test time:
config.json (via CheckpointManager) + video_run.json ({task, encoder,
num_choices, num_answers, pack max_frames}) — `cli video-test` restores the
best-on-val state from those alone.
"""

from __future__ import annotations

import functools as _functools
import json
import os

import jax
import jax.numpy as jnp
import optax

from fvta_memexqa_tpu.config import Config
from fvta_memexqa_tpu.checkpoint import CheckpointManager
from fvta_memexqa_tpu.models.video import (COUNT_MAX, COUNT_MIN, VideoFVTAModel,
                                           video_loss)
from fvta_memexqa_tpu.train import (TrainState, _opt_key, _optimizer_from_key,
                                    check_finite_loss, maybe_enable_debug_nans)
from fvta_memexqa_tpu.utils.metrics import MetricsLogger, Timer


def video_model_from_meta(cfg: Config, meta: dict,
                          encoder: str = "dilated_conv") -> VideoFVTAModel:
    """Model shaped by a video pack's meta.json (task, choices, answer vocab).
    Packs predating task heads carry no "task" key — they are mc."""
    return VideoFVTAModel(cfg=cfg, num_choices=meta["num_choices"],
                          temporal_encoder=encoder,
                          task=meta.get("task", "mc"),
                          num_answers=len(meta.get("answer_vocab", [])))


@_functools.partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3,))
def _video_train_step_jit(opt_key, model, cp_attention, state, shared, vi):
    opt = _optimizer_from_key(opt_key)
    key = jax.random.wrap_key_data(state.rng_key)
    key, k_drop = jax.random.split(key)
    (loss, m), grads = jax.value_and_grad(
        lambda p: video_loss(model, p, shared, vi, k_drop, True, cp_attention),
        has_aux=True)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1,
                           rng_key=jax.random.key_data(key))
    return new_state, {"loss": loss, "acc": m["acc"]}


def make_video_train_step(cfg: Config, model: VideoFVTAModel, cp_attention=None):
    """(state, shared, vi) → (state, {loss, acc}); state buffers donated.
    cp_attention is static by identity — build it once per run."""
    return _functools.partial(_video_train_step_jit, _opt_key(cfg), model,
                              cp_attention)


@_functools.partial(jax.jit, static_argnums=(0, 1))
def _video_eval_step_jit(model, cp_attention, params, shared, vi):
    """Task-appropriate accumulators: correct / sq_err / count (TGIF-QA
    reports acc for mc/frameqa and MSE + rounded exact-match for count;
    frameqa OOV ground truths, label -1, always count wrong)."""
    out = model.apply(params, shared, vi, train=False, cp_attention=cp_attention)
    w = vi.ex_mask.astype(jnp.float32)
    if model.task == "count":
        pred = out.logits[:, 0]
        err = pred - vi.label.astype(pred.dtype)
        rounded = jnp.clip(jnp.round(pred), COUNT_MIN, COUNT_MAX).astype(jnp.int32)
        return {"correct": ((rounded == vi.label) * w).sum(),
                "sq_err": (err * err * w).sum(), "count": w.sum()}
    hit = jnp.argmax(out.logits, -1) == vi.label
    if model.task == "frameqa":
        hit = hit & (vi.label >= 0)
    return {"correct": (hit * w).sum(), "sq_err": jnp.zeros(()),
            "count": w.sum()}


def make_video_eval_step(model: VideoFVTAModel, cp_attention=None):
    return _functools.partial(_video_eval_step_jit, model, cp_attention)


def evaluate_video(eval_step, params, shared, dataset, batch_size: int,
                   task: str) -> dict:
    """Full-split eval → {"acc", "count", "score"[, "mse"]}. Accumulates on
    device, one host fetch at the end (train.evaluate's tunnel-safety rule).
    "score" is the keep-best key: acc, or -mse for count."""
    totals = None
    for vi in dataset.get_batches(batch_size):
        m = eval_step(params, shared, jax.tree.map(jnp.asarray, vi))
        totals = m if totals is None else jax.tree.map(jnp.add, totals, m)
    totals = jax.tree.map(float, totals or
                          {"correct": 0.0, "sq_err": 0.0, "count": 0.0})
    n = max(totals["count"], 1.0)
    out = {"acc": totals["correct"] / n, "count": int(totals["count"])}
    if task == "count":
        out["mse"] = totals["sq_err"] / n
        out["score"] = -out["mse"]
    else:
        out["score"] = out["acc"]
    return out


def _run_meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, "video_run.json")


def train_video(cfg: Config, pack_dir: str, out_dir: str, num_steps: int,
                encoder: str = "dilated_conv", cp: int = 1,
                metrics_path: str | None = None, echo: bool = True,
                prefetch: int = 0) -> dict:
    """Train over a video-prepro pack with the full driver contract.

    Returns {"best_val_score", "steps", "state", "model", "shared", "task"}.
    Resumable: rerunning with the same out_dir continues from the latest
    checkpoint, bit-identically mid-epoch (streaming order is deterministic
    given (seed, epoch); position = step mod batches-per-epoch). On a resumed
    run "best_val_score" covers THIS segment only — the checkpoint manager
    still tracks the global best across segments (restore best=True gets it)."""
    from fvta_memexqa_tpu.data.stream import Prefetcher
    from fvta_memexqa_tpu.data.video_pack import (VideoDataset, load_video_meta,
                                                  video_shared_tables)

    maybe_enable_debug_nans()
    dcfg, meta, shared_np = load_video_meta(pack_dir)
    cfg = cfg.replace(data=dcfg)
    task = meta.get("task", "mc")
    model = video_model_from_meta(cfg, meta, encoder)
    shared = video_shared_tables(dcfg, shared_np)
    train_ds = VideoDataset(pack_dir, "train")
    if train_ds.n == 0:
        raise ValueError("the pack's train split is empty "
                         "(check --test-ids / --val-fraction)")
    try:
        val_ds = VideoDataset(pack_dir, "val")
        if val_ds.n == 0:
            val_ds = None
    except FileNotFoundError:
        val_ds = None
    cp_attn = None
    if cp > 1:
        if meta["max_frames"] % cp:
            raise ValueError(f"cp={cp} requires max_frames ({meta['max_frames']})"
                             " to be divisible by it")
        from fvta_memexqa_tpu.config import MeshConfig
        from fvta_memexqa_tpu.parallel.cp import make_cp_attention
        from fvta_memexqa_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(MeshConfig(data_parallel=1, context_parallel=cp))
        cp_attn = make_cp_attention(mesh, cfg.model.similarity)

    t = cfg.train
    first = jax.tree.map(jnp.asarray,
                         next(iter(train_ds.get_batches(t.batch_size))))
    key = jax.random.split(jax.random.key(t.seed))
    params = jax.jit(lambda k: model.init(k, shared, first, train=False))(key[0])
    opt = _optimizer_from_key(_opt_key(cfg))
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.asarray(0, jnp.int32),
                       rng_key=jax.random.key_data(key[1]))
    # same canonical placement rule as train.train: orbax restores COMMITTED
    # arrays, fresh init leaves them uncommitted, and committed-ness is part
    # of the jit cache key — normalize both paths to one placement
    state = jax.device_put(state, jax.devices()[0])

    ckpt = CheckpointManager(out_dir, cfg, max_to_keep=t.keep_checkpoints)
    with open(_run_meta_path(out_dir), "w") as f:
        json.dump({"task": task, "encoder": encoder,
                   "num_choices": meta["num_choices"],
                   "num_answers": len(meta.get("answer_vocab", [])),
                   "max_frames": meta["max_frames"], "cp": cp,
                   "pack_dir": os.path.abspath(pack_dir)}, f)
    nb = max(train_ds.num_batches(t.batch_size), 1)
    start_epoch = skip_batches = 0
    if ckpt.latest_step() is not None:
        state = jax.device_put(ckpt.restore(state), jax.devices()[0])
        start_epoch = int(state.step) // nb
        skip_batches = int(state.step) % nb

    train_step = make_video_train_step(cfg, model, cp_attn)
    eval_step = make_video_eval_step(model, cp_attn)
    log = MetricsLogger(metrics_path, echo=echo)
    timer = Timer()
    best_val = float("-inf")
    steps_done = int(state.step)
    window_steps = 0
    done = steps_done >= num_steps
    xfer = lambda vi: jax.tree.map(jnp.asarray, vi)
    epoch = start_epoch
    while not done:
        batch_it = train_ds.get_batches(t.batch_size, shuffle=True,
                                        seed=t.seed, epoch=epoch)
        if epoch == start_epoch and skip_batches:
            import itertools

            batch_it = itertools.islice(batch_it, skip_batches, None)
        if prefetch > 0:
            batch_it = Prefetcher(batch_it, depth=prefetch, transfer=xfer)
        try:
            for vi in batch_it:
                if prefetch <= 0:
                    vi = xfer(vi)
                if not timer.samples and timer._t0 is None:
                    timer.start()
                state, m = train_step(state, shared, vi)
                steps_done += 1
                window_steps += 1
                if steps_done % t.log_period == 0:
                    jax.block_until_ready(m["loss"])
                    check_finite_loss(float(m["loss"]), steps_done)
                    timer.stop()
                    window = timer.samples[-1]
                    n_steps = max(window_steps, 1)
                    log.log("train", step=steps_done, epoch=epoch,
                            loss=float(m["loss"]), acc=float(m["acc"]),
                            qa_pairs_per_sec=t.batch_size * n_steps
                            / max(window, 1e-9),
                            p50_step_ms=window / n_steps * 1e3)
                    timer.reset()
                    window_steps = 0
                if val_ds is not None and steps_done % t.val_period == 0:
                    vm = evaluate_video(eval_step, state.params, shared,
                                        val_ds, t.eval_batch_size, task)
                    log.log("val", step=steps_done, **{k: v for k, v in
                                                       vm.items() if k != "score"})
                    best_val = max(best_val, vm["score"])
                    ckpt.save(steps_done, state, val_acc=vm["score"])
                    timer.reset()
                    window_steps = 0
                elif steps_done % t.save_period == 0:
                    ckpt.save(steps_done, state)
                if steps_done >= num_steps:
                    done = True
                    break
        finally:
            if prefetch > 0:
                batch_it.close()
        epoch += 1

    if val_ds is not None:
        vm = evaluate_video(eval_step, state.params, shared, val_ds,
                            t.eval_batch_size, task)
        log.log("val", step=steps_done,
                **{k: v for k, v in vm.items() if k != "score"})
        best_val = max(best_val, vm["score"])
        ckpt.save(steps_done, state, val_acc=vm["score"])
    else:
        ckpt.save(steps_done, state)
    ckpt.wait()
    log.close()
    return {"best_val_score": best_val, "steps": steps_done, "state": state,
            "model": model, "shared": shared, "task": task}


def dump_video_attention(model: VideoFVTAModel, params, shared, dataset,
                         batch_size: int, path: str) -> int:
    """Per-question video attention maps + predictions → .npz, in the same
    schema train.dump_attention writes (qid/pred/label/probs/time_attn/
    seq_attn) so `cli attention-report` reads both; seq_names=["frames"]
    replaces the memexqa (album, modality) cell naming. For count tasks,
    pred is the rounded/clipped count and probs carries the raw prediction
    (the report prints p only for classification dumps)."""
    import numpy as np

    @_functools.partial(jax.jit, static_argnums=0)
    def _step(m, p, vi):
        out = m.apply(p, shared, vi, train=False)
        if m.task == "count":
            pred = jnp.clip(jnp.round(out.logits[:, 0]), COUNT_MIN,
                            COUNT_MAX).astype(jnp.int32)
            probs = out.logits
        else:
            pred = jnp.argmax(out.logits, -1)
            probs = jax.nn.softmax(out.logits)
        return (pred, probs, out.attention.time_attn, out.attention.seq_attn)

    rows = {"qid": [], "pred": [], "label": [], "probs": [],
            "time_attn": [], "seq_attn": []}
    qids = dataset.qids
    seen = 0
    for vi in dataset.get_batches(batch_size):
        vi = jax.tree.map(jnp.asarray, vi)
        pred, probs, ta, sa = jax.tree.map(
            np.asarray, _step(model, params, vi))
        keep = np.asarray(vi.ex_mask)
        n = int(keep.sum())
        rows["qid"].append(qids[seen: seen + n])
        rows["pred"].append(pred[keep])
        rows["label"].append(np.asarray(vi.label)[keep])
        rows["probs"].append(probs[keep])
        rows["time_attn"].append(ta[keep])
        rows["seq_attn"].append(sa[keep])
        seen += n
    out = {k: np.concatenate(v) for k, v in rows.items()}
    out["seq_names"] = np.asarray(["frames"], dtype="U16")
    np.savez_compressed(path, **out)
    return seen


def test_video(out_dir: str, pack_dir: str | None = None, split: str = "test",
               load_best: bool = True, batch_size: int | None = None,
               metrics_path: str | None = None, echo: bool = True,
               attention_path: str | None = None) -> dict:
    """Reference --is_test for the video family: rebuild the model from the
    run dir (config.json + video_run.json), restore the best-on-val (default)
    or latest checkpoint, evaluate a split of the pack."""
    from fvta_memexqa_tpu.config import load_config
    from fvta_memexqa_tpu.data.video_pack import (VideoDataset, load_video_meta,
                                                  video_shared_tables)

    cfg = load_config(os.path.join(out_dir, "config.json"))
    with open(_run_meta_path(out_dir)) as f:
        run = json.load(f)
    pack_dir = pack_dir or run["pack_dir"]
    dcfg, meta, shared_np = load_video_meta(pack_dir)
    cfg = cfg.replace(data=dcfg)
    task = run["task"]
    model = VideoFVTAModel(cfg=cfg, num_choices=run["num_choices"],
                           temporal_encoder=run["encoder"], task=task,
                           num_answers=run["num_answers"])
    shared = video_shared_tables(dcfg, shared_np)
    ds = VideoDataset(pack_dir, split)
    bs = batch_size or cfg.train.eval_batch_size
    first = jax.tree.map(jnp.asarray, next(iter(ds.get_batches(bs))))
    key = jax.random.split(jax.random.key(cfg.train.seed))
    params = jax.jit(lambda k: model.init(k, shared, first, train=False))(key[0])
    opt = _optimizer_from_key(_opt_key(cfg))
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.asarray(0, jnp.int32),
                       rng_key=jax.random.key_data(key[1]))
    ckpt = CheckpointManager(out_dir)
    state = jax.device_put(ckpt.restore(state, best=load_best), jax.devices()[0])
    timer = Timer()
    timer.start()
    eval_step = make_video_eval_step(model)
    m = evaluate_video(eval_step, state.params, shared, ds, bs, task)
    timer.stop()
    log = MetricsLogger(metrics_path, echo=echo)
    log.log("test", split=split, wall_s=timer.samples[0],
            **{k: v for k, v in m.items() if k != "score"})
    if attention_path:
        n = dump_video_attention(model, state.params, shared, ds, bs,
                                 attention_path)
        log.log("attention_dump", split=split, path=attention_path, count=n)
    log.close()
    return m
