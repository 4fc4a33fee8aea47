"""CLI: the reference's 3-stage `prepro → train → test` surface, plus serve/synth.

Reference surface being mirrored (SURVEY.md section 1, L1/L4):
    python prepro.py qas.json album_info.json testids glove photos.npz outdir
    python main.py prepro/ modelname --is_train
    python main.py prepro/ modelname --is_test --load_best
here:
    python -m fvta_memexqa_tpu.cli prepro <qas> <album_info> <testids> <glove> <npz> <outdir>
    python -m fvta_memexqa_tpu.cli train  <packdir> <rundir> [flags]
    python -m fvta_memexqa_tpu.cli test   <packdir> <rundir> [--load-best/--load-latest]
    python -m fvta_memexqa_tpu.cli ablate <packdir> <rundir>   (fvta|flat|none sweep)
    python -m fvta_memexqa_tpu.cli serve  <packdir> <rundir> [--port]
    python -m fvta_memexqa_tpu.cli synth  <outdir>   (write synthetic raw files)
    python -m fvta_memexqa_tpu.cli video  [--encoder dilated_conv|bilstm]

All flags round-trip through the frozen Config and are saved to <rundir>/config.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

from fvta_memexqa_tpu.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig


def _add_dataclass_flags(p: argparse.ArgumentParser, dc_type, prefix: str = ""):
    for f in dataclasses.fields(dc_type):
        name = f"--{prefix}{f.name.replace('_', '-')}"
        if f.type in ("int", int):
            p.add_argument(name, type=int, default=None)
        elif f.type in ("float", float):
            p.add_argument(name, type=float, default=None)
        elif f.type in ("bool", bool):
            p.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=None)
        else:
            p.add_argument(name, type=str, default=None)


def _dc_from_args(args, dc_type, base=None, prefix: str = ""):
    base = base if base is not None else dc_type()
    updates = {}
    for f in dataclasses.fields(dc_type):
        v = getattr(args, f"{prefix}{f.name}", None)
        if v is not None:
            updates[f.name] = v
    return dataclasses.replace(base, **updates)


def _config_from_args(args, base: Config | None = None) -> Config:
    base = base or Config()
    return Config(
        data=_dc_from_args(args, DataConfig, base.data),
        model=_dc_from_args(args, ModelConfig, base.model),
        train=_dc_from_args(args, TrainConfig, base.train),
        mesh=_dc_from_args(args, MeshConfig, base.mesh),
    )


def cmd_prepro(argv):
    p = argparse.ArgumentParser(prog="fvta prepro")
    p.add_argument("qas")
    p.add_argument("album_info")
    p.add_argument("test_ids")
    p.add_argument("glove", help="GloVe txt path, or 'none' to train all embeddings")
    p.add_argument("photo_npz")
    p.add_argument("outdir")
    p.add_argument("--val-fraction", type=float, default=0.1)
    p.add_argument("--val-ids", default=None,
                   help="explicit val question-id file (e.g. an album-level "
                        "holdout); overrides --val-fraction carving")
    p.add_argument("--seed", type=int, default=0)
    _add_dataclass_flags(p, DataConfig)
    args = p.parse_args(argv)

    from fvta_memexqa_tpu.data import load_glove, pack, parse_album_info, parse_qas

    cfg = _dc_from_args(args, DataConfig)
    qas, qerr = parse_qas(args.qas)
    albums, aerr = parse_album_info(args.album_info)
    for e in (qerr + aerr)[:20]:
        print(f"prepro warning: {e}", file=sys.stderr)
    with open(args.test_ids) as f:
        test_ids = {line.strip() for line in f if line.strip()}
    val_ids = None
    if args.val_ids:
        with open(args.val_ids) as f:
            val_ids = {line.strip() for line in f if line.strip()}
    glove = None if args.glove == "none" else load_glove(args.glove, cfg.word_emb_dim)
    feats = dict(np.load(args.photo_npz))
    meta = pack(qas, albums, feats, test_ids, glove, args.outdir, cfg,
                val_fraction=args.val_fraction, seed=args.seed, val_ids=val_ids)
    print(json.dumps({"splits": meta["split_sizes"], "num_albums": meta["num_albums"],
                      "num_photos": meta["num_photos"],
                      "vocab": meta["data_config"]["word_vocab_size"]}))


def _train_test_parser(prog):
    p = argparse.ArgumentParser(prog=prog)
    p.add_argument("packdir")
    p.add_argument("rundir")
    for dc in (ModelConfig, TrainConfig, MeshConfig):
        _add_dataclass_flags(p, dc)
    return p


def cmd_train(argv):
    p = _train_test_parser("fvta train")
    p.add_argument("--num-steps", type=int, default=None,
                   help="stop after N optimizer steps (overrides epochs)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of steps 10-15 into rundir/profile")
    p.add_argument("--stream-shard-size", type=int, default=0,
                   help="stream splits from shard files of this many rows "
                        "(memory-bounded loading; 0 = in-memory Dataset)")
    p.add_argument("--prefetch", type=int, default=0,
                   help="prefetch depth: prep+transfer batches in a background "
                        "thread this many ahead (0 = inline)")
    args = p.parse_args(argv)
    from fvta_memexqa_tpu.data import load_pack
    from fvta_memexqa_tpu.train import train

    datasets = None
    if args.stream_shard_size > 0:
        from fvta_memexqa_tpu.data.stream import StreamingDataset, ensure_split_shards

        # streaming: never materialize the split arrays in host memory; the
        # one-time shard conversion is skipped when a matching index exists
        packed = load_pack(args.packdir, load_splits=False)
        ensure_split_shards(args.packdir, "train", args.stream_shard_size)
        datasets = (StreamingDataset(args.packdir, "train"), None)
        if packed.meta["split_sizes"].get("val", 0) > 0:
            ensure_split_shards(args.packdir, "val", args.stream_shard_size)
            datasets = (datasets[0], StreamingDataset(args.packdir, "val"))
    else:
        packed = load_pack(args.packdir)
    cfg = _config_from_args(args).replace(data=packed.cfg)
    import dataclasses as _dc

    import jax as _jax

    on_tpu = _jax.default_backend() == "tpu"
    if args.use_pallas is None:
        # fused LSTM kernels win the TRAIN step (~+15% measured, BASELINE.md
        # "Fused LSTM v2") but interpret-mode on CPU is slow — default by backend
        cfg = cfg.replace(model=_dc.replace(cfg.model, use_pallas=on_tpu))
    if args.dedup_albums is None and on_tpu:
        # train-time album dedup measured +25% on the v5e (8905 vs 7138 qa/s,
        # BENCH r3 / BASELINE.md "Train-time album dedup") but -10% on the
        # bandwidth-poor CPU stand-in — default by backend, --dedup-albums
        # false opts out
        cfg = cfg.replace(train=_dc.replace(cfg.train, dedup_albums=True))
    os.makedirs(args.rundir, exist_ok=True)
    res = train(cfg, packed, args.rundir, num_steps=args.num_steps,
                metrics_path=os.path.join(args.rundir, "metrics.jsonl"),
                profile_dir=os.path.join(args.rundir, "profile") if args.profile else None,
                datasets=datasets, prefetch=args.prefetch)
    print(json.dumps({"best_val_acc": res["best_val_acc"], "steps": res["steps"]}))


def cmd_ablate(argv):
    """BASELINE.json config 3: FVTA vs flat soft-attention vs no-attention sweep."""
    p = _train_test_parser("fvta ablate")
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--variants", default="fvta,flat,none")
    p.add_argument("--seeds", default=None, metavar="S0[,S1...]",
                   help="train each variant at every seed and report per-seed "
                        "accuracies + the mean (one seed proves nothing — the "
                        "BASELINE.md focal-ablation lesson, now a first-class "
                        "sweep axis); default: the single configured seed")
    args = p.parse_args(argv)
    import dataclasses as _dc

    from fvta_memexqa_tpu.data import load_pack
    from fvta_memexqa_tpu.train import test as run_test, train as run_train

    packed = load_pack(args.packdir)
    base = _config_from_args(args).replace(data=packed.cfg)
    if args.use_pallas is None:
        # same backend-based default as cmd_train (fused kernels win the
        # train step on TPU; interpret mode on CPU is pathological)
        import jax as _jax

        base = base.replace(model=_dc.replace(
            base.model, use_pallas=_jax.default_backend() == "tpu"))
    seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
             else [base.train.seed])
    results = {}
    for variant in args.variants.split(","):
        per_seed = {}
        for seed in seeds:
            cfg = base.replace(
                model=_dc.replace(base.model, attention=variant),
                train=_dc.replace(base.train, seed=seed))
            # single-seed keeps the historical rundir layout (rundir/<variant>)
            leaf = variant if len(seeds) == 1 else f"{variant}_s{seed}"
            rundir = os.path.join(args.rundir, leaf)
            os.makedirs(rundir, exist_ok=True)
            res = run_train(cfg, packed, rundir, num_steps=args.num_steps,
                            metrics_path=os.path.join(rundir, "metrics.jsonl"),
                            echo=False)
            m = run_test(cfg, packed, rundir, load_best=True, echo=False)
            per_seed[str(seed)] = {"val_acc": res["best_val_acc"],
                                   "test_acc": m["acc"], "steps": res["steps"]}
            print(f"[ablate] {variant} seed={seed}: "
                  f"val={res['best_val_acc']:.4f} test={m['acc']:.4f}",
                  file=sys.stderr)
        n = len(per_seed)
        results[variant] = {
            "val_acc": sum(v["val_acc"] for v in per_seed.values()) / n,
            "test_acc": sum(v["test_acc"] for v in per_seed.values()) / n,
            "steps": per_seed[str(seeds[0])]["steps"],
        }
        if n > 1:  # per-seed detail only in the multi-seed regime
            results[variant]["per_seed"] = per_seed
    print(json.dumps(results))


def cmd_test(argv):
    p = _train_test_parser("fvta test")
    p.add_argument("--load-latest", action="store_true",
                   help="use latest instead of best-on-val checkpoint")
    p.add_argument("--split", default="test")
    p.add_argument("--no-album-cache", action="store_true",
                   help="disable album-encoding dedup (reference-shaped eval)")
    p.add_argument("--shard-cache", action="store_true",
                   help="row-shard the album cache over the --data-parallel "
                        "mesh (eval capacity scales with the mesh, like "
                        "serve --shard-cache); identical metrics")
    p.add_argument("--dump-attention", default=None, metavar="PATH",
                   help="write per-question FVTA attention maps + predictions "
                        "to this .npz (qualitative-analysis tensors)")
    p.add_argument("--by-category", action="store_true",
                   help="also report accuracy per question category "
                        "(what/who/when/where/how-many — the papers' table)")
    p.add_argument("--ensemble", default=None, metavar="RUNDIR[,RUNDIR...]",
                   help="average choice probabilities with these extra runs "
                        "(each restored under its own saved config)")
    args = p.parse_args(argv)
    from fvta_memexqa_tpu.config import load_config
    from fvta_memexqa_tpu.data import load_pack
    from fvta_memexqa_tpu.train import test, test_ensemble

    packed = load_pack(args.packdir)
    saved = load_config(os.path.join(args.rundir, "config.json"))
    cfg = _config_from_args(args, base=saved).replace(data=packed.cfg)
    if args.use_pallas is None and cfg.model.use_pallas:
        # The fused kernels ship the TRAIN step; inference ships XLA
        # (BASELINE.md), and a TPU-trained run evaluated on CPU would hit
        # interpret-mode Pallas. Evaluate with XLA unless explicitly asked.
        import dataclasses as _dc

        cfg = cfg.replace(model=_dc.replace(cfg.model, use_pallas=False))
    if args.ensemble:
        # --data-parallel IS honored (test_ensemble builds the mesh from
        # cfg.mesh); the cache/attention toggles have no ensemble equivalent —
        # say so instead of silently evaluating something else (ADVICE r4).
        if args.no_album_cache or args.dump_attention:
            print("test --ensemble always evaluates through the album cache "
                  "and has no attention dump; ignoring "
                  "--no-album-cache/--dump-attention", file=sys.stderr)
        dirs = [args.rundir] + [d for d in args.ensemble.split(",") if d]
        m = test_ensemble(cfg, packed, dirs, load_best=not args.load_latest,
                          split=args.split,
                          metrics_path=os.path.join(args.rundir, "metrics.jsonl"),
                          by_category=args.by_category,
                          shard_cache=args.shard_cache)
        out = {"split": args.split, "accuracy": m["acc"],
               "count": m["count"], "members": m["members"]}
        if args.by_category:
            out["by_category"] = m["by_category"]
        print(json.dumps(out))
        return
    m = test(cfg, packed, args.rundir, load_best=not args.load_latest, split=args.split,
             metrics_path=os.path.join(args.rundir, "metrics.jsonl"),
             album_cache=not args.no_album_cache,
             attention_path=args.dump_attention,
             by_category=args.by_category, shard_cache=args.shard_cache)
    out = {"split": args.split, "accuracy": m["acc"], "loss": m["loss"],
           "count": m["count"]}
    if args.by_category:
        out["by_category"] = m["by_category"]
    print(json.dumps(out))


def cmd_serve(argv):
    from fvta_memexqa_tpu.serve import main as serve_main

    serve_main(argv)


def cmd_predict(argv):
    """One-shot QA from the command line: load pack + checkpoint, ingest the
    referenced albums, answer a single question (no HTTP server)."""
    p = argparse.ArgumentParser(prog="fvta predict")
    p.add_argument("packdir")
    p.add_argument("rundir")
    p.add_argument("--question", required=True)
    p.add_argument("--choices", required=True,
                   help="the 4 candidate answers, separated by '|'")
    p.add_argument("--album-ids", default="",
                   help="comma-separated raw album ids (as in album_info.json)")
    p.add_argument("--raw-albums", default=None,
                   help="album_info.json to ingest from (with --raw-photo-npz)")
    p.add_argument("--raw-photo-npz", default=None)
    p.add_argument("--load-latest", action="store_true")
    args = p.parse_args(argv)

    from fvta_memexqa_tpu.serve import build_engine

    # preingest=False: a one-shot predict only needs the referenced albums,
    # which the store lazily encodes from their pack rows on first use
    engine, store, packed = build_engine(args.packdir, args.rundir,
                                         load_best=not args.load_latest,
                                         batch_size=1, preingest=False)
    try:
        album_ids = [a for a in args.album_ids.split(",") if a]
        if args.raw_albums and args.raw_photo_npz:
            from fvta_memexqa_tpu.data.schema import parse_album_info

            albums, _ = parse_album_info(args.raw_albums)
            feats = dict(np.load(args.raw_photo_npz))
            for aid in album_ids:
                if aid in albums:
                    store.ingest(albums[aid], feats)
        choices = args.choices.split("|")
        res = engine.ask(args.question, choices, album_ids)
        print(json.dumps(res))
    finally:
        engine.close()


def cmd_import_tf(argv):
    """Import a TF1 (tf.train.Saver) or Keras-layout checkpoint into an orbax
    run dir, so `cli test <packdir> <rundir>` evaluates the imported weights —
    the day the reference's pretrained weights appear, accuracy parity is:
    import-tf-checkpoint + test (round-2 verdict missing #4)."""
    p = argparse.ArgumentParser(prog="fvta import-tf-checkpoint")
    p.add_argument("ckpt", help="TF checkpoint prefix (Saver V2 format)")
    p.add_argument("packdir", help="pack providing shapes/vocab for the model")
    p.add_argument("rundir", help="orbax run dir to write (step 0)")
    p.add_argument("--map", dest="map_file", default=None,
                   help="JSON name mapping (our leaf path -> tf var name); "
                        "default: tf_import.default_tf1_map(--tf-prefix)")
    p.add_argument("--dump-map", default=None, metavar="PATH",
                   help="write the default mapping JSON for hand-editing, then exit")
    p.add_argument("--list", action="store_true",
                   help="list the checkpoint's variables + shapes, then exit")
    p.add_argument("--tf-prefix", default="model",
                   help="scope prefix for the default name mapping")
    for dc in (ModelConfig, TrainConfig, MeshConfig):
        _add_dataclass_flags(p, dc)
    args = p.parse_args(argv)
    from fvta_memexqa_tpu.tf_import import (convert_params, default_tf1_map,
                                            read_tf_checkpoint)

    if args.dump_map:
        with open(args.dump_map, "w") as f:
            json.dump(default_tf1_map(args.tf_prefix), f, indent=2)
        print(json.dumps({"dumped": args.dump_map}))
        return
    tfvars = read_tf_checkpoint(args.ckpt)
    if args.list:
        for name in sorted(tfvars):
            print(f"{name}  {list(tfvars[name].shape)}")
        return

    from fvta_memexqa_tpu.checkpoint import CheckpointManager
    from fvta_memexqa_tpu.data import load_pack
    from fvta_memexqa_tpu.data.device_prepro import SharedTables, device_put_batch
    from fvta_memexqa_tpu.data.pipeline import Dataset
    from fvta_memexqa_tpu.train import init_state

    packed = load_pack(args.packdir)
    cfg = _config_from_args(args).replace(data=packed.cfg)
    from fvta_memexqa_tpu.models import FVTAModel

    shared = SharedTables.from_packed(packed.shared)
    model = FVTAModel(cfg=cfg)
    any_split = next(s for s in ("train", "val", "test") if s in packed.splits)
    batch = device_put_batch(next(iter(
        Dataset(packed, any_split).get_batches(cfg.train.eval_batch_size))))
    state = init_state(cfg, model, shared, batch)

    mapping = default_tf1_map(args.tf_prefix)
    if args.map_file:
        with open(args.map_file) as f:
            mapping = json.load(f)
    new_inner, report = convert_params(state.params["params"], tfvars, mapping,
                                       forget_bias=cfg.model.forget_bias)
    import jax
    import jax.numpy as jnp

    state = state.replace(params={"params": jax.tree.map(jnp.asarray, new_inner)})
    ckpt = CheckpointManager(args.rundir, cfg)
    ckpt.save(0, state)
    ckpt.close()
    print(json.dumps({"rundir": args.rundir, **report,
                      "tf_variables": len(tfvars)}))


def cmd_export_tf(argv):
    """Inverse of import-tf-checkpoint: write a trained run's params as a
    TF1-layout tf.train.Saver checkpoint (fused LSTM kernels, (i,j,f,o)
    gates, in-cell forget bias), so weights trained here can be handed back
    to a TF consumer. Round-trip (export → import) is bitwise-tested."""
    p = argparse.ArgumentParser(prog="fvta export-tf-checkpoint")
    p.add_argument("packdir", help="pack providing shapes/vocab for the model")
    p.add_argument("rundir", help="orbax run dir holding the checkpoint")
    p.add_argument("out_prefix", help="TF checkpoint prefix to write")
    p.add_argument("--load-latest", action="store_true",
                   help="export latest instead of best-on-val checkpoint")
    p.add_argument("--tf-prefix", default="model",
                   help="scope prefix for the TF variable names")
    p.add_argument("--map", dest="map_file", default=None,
                   help="JSON name mapping (our leaf path -> tf var name); "
                        "default: tf_import.default_tf1_map(--tf-prefix)")
    args = p.parse_args(argv)
    import jax

    from fvta_memexqa_tpu.checkpoint import CheckpointManager
    from fvta_memexqa_tpu.config import load_config
    from fvta_memexqa_tpu.data import load_pack
    from fvta_memexqa_tpu.data.device_prepro import SharedTables, device_put_batch
    from fvta_memexqa_tpu.data.pipeline import Dataset
    from fvta_memexqa_tpu.models import FVTAModel
    from fvta_memexqa_tpu.tf_import import default_tf1_map, export_tf1_checkpoint
    from fvta_memexqa_tpu.train import init_state

    packed = load_pack(args.packdir)
    cfg = load_config(os.path.join(args.rundir, "config.json")).replace(
        data=packed.cfg)
    shared = SharedTables.from_packed(packed.shared)
    model = FVTAModel(cfg=cfg)
    any_split = next(s for s in ("train", "val", "test") if s in packed.splits)
    batch = device_put_batch(next(iter(
        Dataset(packed, any_split).get_batches(cfg.train.eval_batch_size))))
    state = init_state(cfg, model, shared, batch)
    ckpt = CheckpointManager(args.rundir, cfg)
    state = ckpt.restore(state, best=not args.load_latest)
    ckpt.close()

    mapping = default_tf1_map(args.tf_prefix)
    if args.map_file:
        with open(args.map_file) as f:
            mapping = json.load(f)
    prefix = export_tf1_checkpoint(
        jax.tree.map(np.asarray, state.params["params"]), args.out_prefix,
        prefix=args.tf_prefix, mapping=mapping)
    print(json.dumps({"tf_checkpoint": prefix, "step": int(state.step),
                      "from": "latest" if args.load_latest else "best"}))


def cmd_video_prepro(argv):
    """Pack raw video QA (qas.jsonl + frame_feats.npz [+ test ids + GloVe])
    into streaming shards (BASELINE config 4 real-data path)."""
    p = argparse.ArgumentParser(prog="fvta video-prepro")
    p.add_argument("qas", help="qas.jsonl (see data/video_pack.py for schema)")
    p.add_argument("frame_npz", help="frame_feats.npz: video_id -> [T, F]")
    p.add_argument("outdir")
    p.add_argument("--test-ids", default=None)
    p.add_argument("--glove", default=None)
    p.add_argument("--num-choices", type=int, default=5)
    p.add_argument("--task", default="mc", choices=["mc", "count", "frameqa"],
                   help="TGIF-QA task: mc (Action/Transition: choices + "
                        "answer_idx), count (answer_count regression), "
                        "frameqa (answer-string classification)")
    p.add_argument("--max-frames", type=int, default=64)
    p.add_argument("--shard-size", type=int, default=256)
    p.add_argument("--val-fraction", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    _add_dataclass_flags(p, DataConfig)
    args = p.parse_args(argv)
    from fvta_memexqa_tpu.data.video_pack import pack_video, parse_video_qas
    from fvta_memexqa_tpu.data.vocab import load_glove

    cfg = _dc_from_args(args, DataConfig)
    qas, errs = parse_video_qas(args.qas, task=args.task)
    for e in errs[:20]:
        print(f"video-prepro warning: {e}", file=sys.stderr)
    test_ids = set()
    if args.test_ids:
        with open(args.test_ids) as f:
            test_ids = {line.strip() for line in f if line.strip()}
    glove = load_glove(args.glove, cfg.word_emb_dim) if args.glove else None
    feats = dict(np.load(args.frame_npz))
    meta = pack_video(qas, feats, test_ids, glove, args.outdir, cfg,
                      num_choices=args.num_choices, max_frames=args.max_frames,
                      shard_size=args.shard_size,
                      val_fraction=args.val_fraction, seed=args.seed,
                      task=args.task)
    print(json.dumps({"splits": meta["split_sizes"],
                      "dropped": meta["dropped"],
                      "task": meta["task"],
                      "answer_vocab_size": len(meta["answer_vocab"]),
                      "vocab": meta["data_config"]["word_vocab_size"],
                      "max_frames": meta["max_frames"]}))


def cmd_video(argv):
    """TGIF-QA-style video QA (BASELINE.json config 4): train FVTA over frame
    sequences — synthetic by default, or a video-prepro pack via --data — and
    report held-out accuracy."""
    p = argparse.ArgumentParser(prog="fvta video")
    p.add_argument("--data", default=None,
                   help="packed video dir (video-prepro output); omit for the "
                        "synthetic demo world")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-videos", type=int, default=96)
    p.add_argument("--num-frames", type=int, default=64)
    p.add_argument("--num-choices", type=int, default=5)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--encoder", default="dilated_conv",
                   choices=["dilated_conv", "bilstm"])
    p.add_argument("--task", default="mc", choices=["mc", "count", "frameqa"],
                   help="TGIF-QA task head (synthetic demo; --data packs "
                        "carry their task in meta.json)")
    p.add_argument("--attention", default="fvta",
                   choices=["fvta", "flat", "none"],
                   help="attention variant (config-3 ablation registry "
                        "applied to the video path; recorded in the run "
                        "config so video-test restores it)")
    p.add_argument("--hidden-dim", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cp", type=int, default=1,
                   help="context-parallel degree: shard the FVTA attention "
                        "over the frame axis across N devices (frame count "
                        "must be divisible by N)")
    p.add_argument("--out", default=None,
                   help="run dir (requires --data): enables the full driver — "
                        "keep-best orbax checkpoints, JSONL metrics, exact "
                        "resume — and the final test eval restores the "
                        "best-on-val state (see also: video-test)")
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--lr-schedule", default="constant",
                   choices=["constant", "cosine", "linear"])
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--decay-steps", type=int, default=0)
    p.add_argument("--grad-accum", type=int, default=1,
                   help="microbatches averaged per optimizer update")
    p.add_argument("--val-period", type=int, default=50)
    p.add_argument("--log-period", type=int, default=50)
    p.add_argument("--save-period", type=int, default=200)
    p.add_argument("--prefetch", type=int, default=0)
    args = p.parse_args(argv)
    if args.out and not args.data:
        raise SystemExit("--out needs --data (the synthetic demo world is "
                         "in-memory; nothing to resume)")
    if args.data:
        return _video_from_pack(args)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from fvta_memexqa_tpu.config import Config, DataConfig, ModelConfig
    from fvta_memexqa_tpu.data.device_prepro import SharedTables
    from fvta_memexqa_tpu.models.video import (VideoFVTAModel, make_synthetic_video,
                                               video_loss)

    cfg = Config(
        data=DataConfig(max_question_len=8, max_answer_len=3, max_word_len=6,
                        image_feat_dim=2537, word_emb_dim=50, word_vocab_size=64,
                        char_vocab_size=16, num_glove_words=0),
        model=ModelConfig(hidden_dim=args.hidden_dim, char_emb_dim=4,
                          char_cnn_filters=8, keep_prob=1.0, vocab_embed=False,
                          attention=args.attention),
    )
    vi, _ = make_synthetic_video(cfg, num_videos=args.num_videos,
                                 num_frames=args.num_frames,
                                 num_choices=args.num_choices, seed=args.seed,
                                 task=args.task)
    vi_test, _ = make_synthetic_video(cfg, num_videos=max(args.num_videos // 4, 8),
                                      num_frames=args.num_frames,
                                      num_choices=args.num_choices,
                                      seed=args.seed + 1, task=args.task)
    rng = np.random.default_rng(args.seed)
    d = cfg.data
    shared = SharedTables(
        word_emb=jnp.asarray(rng.normal(0, 0.3, (d.word_vocab_size, d.word_emb_dim))
                             .astype(np.float32)),
        vocab_chars=jnp.zeros((d.word_vocab_size, d.max_word_len), jnp.int32),
        photo_feats=jnp.zeros((1, d.image_feat_dim)),
        album_photo_idx=jnp.zeros((1, 1), jnp.int32),
        album_photo_mask=jnp.zeros((1, 1), bool),
        photo_title_words=jnp.zeros((1, 1, 1), jnp.int32),
        photo_title_chars=jnp.zeros((1, 1, 1, 1), jnp.int32),
        photo_title_mask=jnp.zeros((1, 1, 1), bool),
        album_text_words=jnp.zeros((1, 4, 1), jnp.int32),
        album_text_chars=jnp.zeros((1, 4, 1, 1), jnp.int32),
        album_text_mask=jnp.zeros((1, 4, 1), bool),
    )
    model = VideoFVTAModel(cfg=cfg, num_choices=args.num_choices,
                           temporal_encoder=args.encoder, task=args.task,
                           num_answers=8 if args.task == "frameqa" else 0)
    params = jax.jit(lambda k: model.init(k, shared, vi, train=False))(
        jax.random.key(args.seed))
    cp_attn = _make_video_cp(args.cp, args.num_frames, cfg)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        (l, aux), g = jax.value_and_grad(
            lambda pp: video_loss(model, pp, shared, vi, None, False, cp_attn),
            has_aux=True)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l, aux["acc"]

    loss = acc = 0.0
    for i in range(args.steps):
        params, opt_state, loss, acc = step(params, opt_state)
        if (i + 1) % 50 == 0:
            print(f"[video] step={i+1} loss={float(loss):.4f} "
                  f"train_acc={float(acc):.4f}", file=sys.stderr)
    test_l, test_m = video_loss(model, params, shared, vi_test, None, False,
                                cp_attn)
    out = {
        "encoder": args.encoder, "task": args.task,
        "num_frames": args.num_frames,
        "train_acc": float(acc), "heldout_acc": float(test_m["acc"]),
        "cp": args.cp,
    }
    if args.task == "count":
        out["heldout_mse"] = float(test_l)
    elif args.task == "frameqa":
        out["chance"] = 1.0 / 8
    else:
        out["chance"] = 1.0 / args.num_choices
    print(json.dumps(out))


def cmd_synth_video(argv):
    """Write a synthetic raw video-QA corpus (qas.jsonl + frame_feats.npz +
    test_qa.ids) for driving the video-prepro → video --data path."""
    p = argparse.ArgumentParser(prog="fvta synth-video")
    p.add_argument("outdir")
    p.add_argument("--num-videos", type=int, default=48)
    p.add_argument("--num-frames", type=int, default=32)
    p.add_argument("--feat-dim", type=int, default=64)
    p.add_argument("--num-choices", type=int, default=5)
    p.add_argument("--task", default="mc", choices=["mc", "count", "frameqa"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    from fvta_memexqa_tpu.data.video_pack import (make_synthetic_video_raw,
                                                  write_raw_video_files)

    qas, feats, test_ids = make_synthetic_video_raw(
        num_videos=args.num_videos, num_frames=args.num_frames,
        feat_dim=args.feat_dim, num_choices=args.num_choices, seed=args.seed,
        task=args.task)
    write_raw_video_files(args.outdir, qas, feats, test_ids)
    print(json.dumps({"outdir": args.outdir, "videos": args.num_videos,
                      "task": args.task, "test": len(test_ids)}))


def _make_video_cp(cp: int, num_frames: int, cfg):
    """cp>1 → a shard_map-wrapped context-parallel attention over a (1, cp)
    mesh for the video frame axis; None for the single-device path."""
    if cp <= 1:
        return None
    if num_frames % cp:
        raise SystemExit(f"--cp {cp} requires the frame count ({num_frames}) "
                         f"to be divisible by it")
    from fvta_memexqa_tpu.config import MeshConfig
    from fvta_memexqa_tpu.parallel.cp import make_cp_attention
    from fvta_memexqa_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data_parallel=1, context_parallel=cp))
    return make_cp_attention(mesh, cfg.model.similarity)


def _video_driver_from_pack(args):
    """--out path: full-driver training (train_video) + best-on-val test eval."""
    from fvta_memexqa_tpu.config import Config, ModelConfig, TrainConfig
    from fvta_memexqa_tpu.train_video import test_video, train_video

    cfg = Config(
        model=ModelConfig(hidden_dim=args.hidden_dim, char_emb_dim=8,
                          char_cnn_filters=16, keep_prob=1.0, vocab_embed=True,
                          attention=args.attention),
        train=TrainConfig(batch_size=args.batch_size,
                          eval_batch_size=args.batch_size,
                          learning_rate=args.lr, seed=args.seed,
                          lr_schedule=args.lr_schedule,
                          warmup_steps=args.warmup_steps,
                          decay_steps=args.decay_steps,
                          grad_accum=args.grad_accum,
                          val_period=args.val_period,
                          log_period=args.log_period,
                          save_period=args.save_period),
    )
    r = train_video(cfg, args.data, args.out, num_steps=args.steps,
                    encoder=args.encoder, cp=args.cp, prefetch=args.prefetch,
                    metrics_path=os.path.join(args.out, "metrics.jsonl"))
    m = test_video(args.out, split="test", load_best=True,
                   batch_size=args.batch_size, echo=False)
    out = {
        "encoder": args.encoder, "task": r["task"], "data": args.data,
        "out": args.out, "steps": r["steps"],
        "best_val_score": r["best_val_score"],
        "heldout_acc": m["acc"], "test_count": m["count"],
    }
    if r["task"] == "count":
        out["heldout_mse"] = m["mse"]
    print(json.dumps(out))


def cmd_video_test(argv):
    """Evaluate a video run dir (cli video --out) on a pack split, restoring
    the best-on-val checkpoint (reference --is_test --load_best, video family)."""
    p = argparse.ArgumentParser(prog="fvta video-test")
    p.add_argument("out", help="run dir written by `video --data ... --out`")
    p.add_argument("--data", default=None,
                   help="pack dir (default: the one recorded in the run)")
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--latest", action="store_true",
                   help="restore the latest checkpoint instead of best-on-val")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--dump-attention", default=None, metavar="PATH",
                   help="also write per-question frame-attention maps + "
                        "predictions to PATH (.npz; readable by "
                        "attention-report)")
    args = p.parse_args(argv)
    from fvta_memexqa_tpu.train_video import test_video

    m = test_video(args.out, pack_dir=args.data, split=args.split,
                   load_best=not args.latest, batch_size=args.batch_size,
                   echo=False, attention_path=args.dump_attention)
    print(json.dumps({"split": args.split, **{k: v for k, v in m.items()
                                              if k != "score"}}))


def _video_from_pack(args):
    """Train/eval the video model over a video-prepro pack (streaming loader)."""
    if args.out:
        return _video_driver_from_pack(args)
    import jax
    import numpy as np
    import optax

    from fvta_memexqa_tpu.config import Config, ModelConfig
    from fvta_memexqa_tpu.data.video_pack import (VideoDataset, load_video_meta,
                                                  video_shared_tables)
    from fvta_memexqa_tpu.models.video import VideoFVTAModel, video_loss

    dcfg, meta, shared_np = load_video_meta(args.data)
    task = meta.get("task", "mc")  # packs predating task heads are mc
    cfg = Config(data=dcfg,
                 model=ModelConfig(hidden_dim=args.hidden_dim, char_emb_dim=8,
                                   char_cnn_filters=16, keep_prob=1.0,
                                   vocab_embed=True,
                                   attention=args.attention))
    shared = video_shared_tables(dcfg, shared_np)
    model = VideoFVTAModel(cfg=cfg, num_choices=meta["num_choices"],
                           temporal_encoder=args.encoder, task=task,
                           num_answers=len(meta.get("answer_vocab", [])))
    train_ds = VideoDataset(args.data, "train")
    test_ds = VideoDataset(args.data, "test")

    import jax.numpy as jnp

    if train_ds.n == 0:
        print("error: the pack's train split is empty (check --test-ids / "
              "--val-fraction)", file=sys.stderr)
        return 2
    first = next(iter(train_ds.get_batches(args.batch_size)))
    first = jax.tree.map(jnp.asarray, first)
    params = jax.jit(lambda k: model.init(k, shared, first, train=False))(
        jax.random.key(args.seed))
    cp_attn = _make_video_cp(args.cp, meta["max_frames"], cfg)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, vi):
        (l, aux), g = jax.value_and_grad(
            lambda pp: video_loss(model, pp, shared, vi, None, False, cp_attn),
            has_aux=True)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l, aux["acc"]

    @jax.jit
    def eval_counts(p, vi):
        """→ (correct, sq_err, count): task-appropriate exact-match numerator
        plus the count-task squared error (MSE is TGIF-QA's count metric)."""
        out = model.apply(p, shared, vi, train=False, cp_attention=cp_attn)
        w = vi.ex_mask.astype(jnp.float32)
        if task == "count":
            from fvta_memexqa_tpu.models.video import COUNT_MAX, COUNT_MIN

            pred = out.logits[:, 0]
            err = pred - vi.label.astype(pred.dtype)
            rounded = jnp.clip(jnp.round(pred), COUNT_MIN,
                               COUNT_MAX).astype(jnp.int32)
            correct = ((rounded == vi.label) * w).sum()
            return correct, (err * err * w).sum(), w.sum()
        hit = jnp.argmax(out.logits, -1) == vi.label
        if task == "frameqa":
            hit = hit & (vi.label >= 0)  # OOV answers always score wrong
        return (hit * w).sum(), jnp.zeros(()), w.sum()

    done, epoch = 0, 0
    loss = acc = 0.0
    while done < args.steps:
        for vi in train_ds.get_batches(args.batch_size, shuffle=True,
                                       seed=args.seed, epoch=epoch):
            params, opt_state, loss, acc = step(params, opt_state,
                                                jax.tree.map(jnp.asarray, vi))
            done += 1
            if done % 50 == 0:
                print(f"[video] step={done} loss={float(loss):.4f} "
                      f"train_acc={float(acc):.4f}", file=sys.stderr)
            if done >= args.steps:
                break
        epoch += 1
    correct = sq_err = total = 0.0
    for vi in test_ds.get_batches(args.batch_size):
        c, se, t = eval_counts(params, jax.tree.map(jnp.asarray, vi))
        correct += float(c)
        sq_err += float(se)
        total += float(t)
    out = {
        "encoder": args.encoder, "task": task, "data": args.data,
        "steps": done, "train_acc": float(acc),
        "heldout_acc": correct / max(total, 1.0), "test_count": int(total),
    }
    if task == "count":
        out["heldout_mse"] = sq_err / max(total, 1.0)
    elif task == "frameqa":
        out["answer_vocab_size"] = len(meta.get("answer_vocab", []))
    else:
        out["chance"] = 1.0 / meta["num_choices"]
    print(json.dumps(out))


def cmd_synth(argv):
    p = argparse.ArgumentParser(prog="fvta synth")
    p.add_argument("outdir")
    p.add_argument("--num-albums", type=int, default=6)
    p.add_argument("--photos-per-album", type=int, default=4)
    p.add_argument("--num-questions", type=int, default=24)
    p.add_argument("--feat-dim", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--focal", action="store_true",
                   help="emit the focality-discriminating corpus (answers "
                        "hidden at single photo positions behind decoy-"
                        "saturated album text) instead of the derivable one")
    args = p.parse_args(argv)
    from fvta_memexqa_tpu.data.synthetic import (make_focal_synthetic,
                                                 make_synthetic,
                                                 write_raw_files)

    gen = make_focal_synthetic if args.focal else make_synthetic
    out = gen(num_albums=args.num_albums,
              photos_per_album=args.photos_per_album,
              num_questions=args.num_questions,
              feat_dim=args.feat_dim, seed=args.seed)
    write_raw_files(args.outdir, *out)
    print(json.dumps({"outdir": args.outdir, "questions": args.num_questions,
                      "albums": args.num_albums, "focal": args.focal}))


def cmd_attention_report(argv):
    """Readable report over a `test --dump-attention` npz: per question, the
    across-sequence focus (seq_attn) and the top within-sequence time cells
    (time_attn) with (album, modality) names — the tensors behind the paper's
    qualitative attention figures, without leaving the terminal."""
    p = argparse.ArgumentParser(prog="fvta attention-report")
    p.add_argument("npz", help="output of `cli test --dump-attention PATH`")
    p.add_argument("--qid", default=None, help="report only this question id")
    p.add_argument("--top", type=int, default=3,
                   help="top-K (sequence, time) cells per question")
    p.add_argument("--limit", type=int, default=10,
                   help="max questions in the report (0 = all)")
    p.add_argument("--json", action="store_true", dest="as_json",
                   help="machine-readable JSONL instead of the text table")
    p.add_argument("--wrong-only", action="store_true",
                   help="only questions the model got wrong")
    args = p.parse_args(argv)

    from fvta_memexqa_tpu.config import MODALITIES

    z = np.load(args.npz, allow_pickle=True)
    qids = [str(q) for q in z["qid"]]
    ta, sa = z["time_attn"], z["seq_attn"]          # [N,S,T], [N,S]
    pred, label, probs = z["pred"], z["label"], z["probs"]
    n_mod = len(MODALITIES)
    # video dumps name their sequences directly (seq_names=["frames"]) —
    # the (album, modality) decomposition is memexqa-shaped only
    seq_names = ([str(x) for x in z["seq_names"]]
                 if "seq_names" in getattr(z, "files", []) else None)
    rows = range(len(qids))
    if args.qid is not None:
        if args.qid not in qids:
            print(f"error: qid {args.qid!r} not in {args.npz}", file=sys.stderr)
            return 2
        rows = [qids.index(args.qid)]
    reported = 0
    for i in rows:
        if args.wrong_only and int(pred[i]) == int(label[i]):
            continue
        if args.limit and reported >= args.limit:
            break
        reported += 1
        # joint focal weight of cell (s, t) = seq_attn[s] * time_attn[s, t]
        joint = sa[i][:, None] * ta[i]
        flat = joint.reshape(-1)
        top = np.argsort(flat)[::-1][: args.top]
        cells = []
        for k in top:
            s, t = divmod(int(k), ta.shape[2])
            cell = {
                "t": t,
                "weight": float(flat[k]),
                "seq_weight": float(sa[i][s]),
            }
            if seq_names is not None:
                cell["seq"] = seq_names[s % len(seq_names)]
            else:
                cell["album"] = s // n_mod
                cell["modality"] = MODALITIES[s % n_mod]
            cells.append(cell)
        rec = {
            "qid": qids[i], "pred": int(pred[i]), "label": int(label[i]),
            "correct": bool(pred[i] == label[i]),
            # count dumps carry the raw regression value in probs[:, 0],
            # not class probabilities — no p to report then
            "p_pred": (float(probs[i][int(pred[i])])
                       if int(pred[i]) < probs.shape[1] else None),
            "focus": cells,
        }
        if args.as_json:
            print(json.dumps(rec))
        else:
            mark = "✓" if rec["correct"] else f"✗ (gold {rec['label']})"
            p_str = f"p={rec['p_pred']:.2f} " if rec["p_pred"] is not None else ""
            print(f"{rec['qid']}: pred choice {rec['pred']} {p_str}{mark}")
            for c in cells:
                name = (c["seq"] if "seq" in c
                        else f"album {c['album']} · {c['modality']:<12s}")
                print(f"    {name} t={c['t']:<3d} "
                      f"joint={c['weight']:.3f} (seq {c['seq_weight']:.3f})")
    if not args.as_json:
        print(f"[{reported} question(s) reported from {args.npz}]",
              file=sys.stderr)
    return 0


def cmd_report(argv):
    """Post-hoc summary of a run dir's metrics.jsonl: training progress, best
    val, every recorded test/by-category/ensemble result. The reference's only
    observability was live print/tqdm (SURVEY.md §5 metrics row); here the
    JSONL record is the source of truth and this renders it."""
    p = argparse.ArgumentParser(prog="fvta report")
    p.add_argument("rundir")
    p.add_argument("--json", action="store_true",
                   help="machine-readable summary instead of the table")
    args = p.parse_args(argv)
    path = os.path.join(args.rundir, "metrics.jsonl")
    if not os.path.exists(path):
        print(f"no metrics.jsonl under {args.rundir}", file=sys.stderr)
        return 1
    with open(path) as f:
        events = [json.loads(line) for line in f if line.strip()]
    by = lambda ev: [e for e in events if e.get("event") == ev]  # noqa: E731
    trains, vals, tests = by("train"), by("val"), by("test")
    bycat, ens = by("test_by_category"), by("test_ensemble")
    strip = lambda e, drop=("event", "time"): {  # noqa: E731
        k: v for k, v in e.items() if k not in drop}
    # video count-task runs record "mse" (lower is better) instead of "acc"
    accs = [v for v in vals if "acc" in v]
    mses = [v for v in vals if "acc" not in v and "mse" in v]
    best_val = (max(accs, key=lambda v: v["acc"]) if accs
                else min(mses, key=lambda v: v["mse"]) if mses else None)
    summary = {
        # .get throughout: a foreign/partial metrics.jsonl may lack any of
        # these keys, and "tolerate foreign schemas" is this command's contract
        "steps": trains[-1].get("step", 0) if trains else 0,
        "final_train_loss": trains[-1].get("loss") if trains else None,
        "train_qa_pairs_per_sec": (trains[-1].get("qa_pairs_per_sec")
                                   if trains else None),
        "best_val_acc": best_val.get("acc") if best_val else None,
        "best_val_mse": best_val.get("mse") if best_val else None,
        "best_val_step": best_val.get("step") if best_val else None,
        "val_evals": len(vals),
        "tests": [strip(t) for t in tests],
        "by_category": strip(bycat[-1], ("event", "time", "split"))
        if bycat else None,
        "ensembles": [strip(e) for e in ens],
    }
    if args.json:
        print(json.dumps(summary))
        return 0
    print(f"run: {args.rundir}")
    cfg_path = os.path.join(args.rundir, "config.json")
    if os.path.exists(cfg_path):
        try:
            from fvta_memexqa_tpu.config import load_config

            c = load_config(cfg_path)
            print(f"model: attention={c.model.attention} "
                  f"hidden={c.model.hidden_dim}"
                  f" | train: bs={c.train.batch_size} "
                  f"lr={c.train.learning_rate} opt={c.train.optimizer}")
        except Exception:
            pass  # video run dirs carry a different config schema
    if trains:
        loss = summary["final_train_loss"]
        print(f"train: {summary['steps']} steps"
              + (f", final loss {loss:.4f}" if loss is not None else "")
              + (f", {summary['train_qa_pairs_per_sec']:.0f} qa/s"
                 if summary["train_qa_pairs_per_sec"] else ""))
    if best_val:
        metric = ("best acc " + format(best_val["acc"], ".4f")
                  if "acc" in best_val
                  else "best mse " + format(best_val["mse"], ".4f"))
        print(f"val:   {metric} @ step {best_val.get('step', '?')} "
              f"({len(vals)} evals)")
    for t in summary["tests"]:
        score = (f"acc {t['acc']:.4f}" if "acc" in t
                 else f"mse {t['mse']:.4f}" if "mse" in t else "?")
        print(f"test:  {t.get('split', '?')}: {score} "
              f"({t.get('count', '?')} questions)")
    if summary["by_category"]:
        print("by category: " + "  ".join(
            f"{k}={v:.4f}" for k, v in summary["by_category"].items()))
    for e in summary["ensembles"]:
        acc = e.get("acc")
        print(f"ensemble: {e.get('split', '?')}: "
              + (f"acc {acc:.4f} " if acc is not None else "acc ? ")
              + f"(members {e.get('member_accs')})")
    return 0


COMMANDS = {
    "prepro": cmd_prepro,
    "train": cmd_train,
    "test": cmd_test,
    "ablate": cmd_ablate,
    "serve": cmd_serve,
    "predict": cmd_predict,
    "synth": cmd_synth,
    "video": cmd_video,
    "video-test": cmd_video_test,
    "video-prepro": cmd_video_prepro,
    "synth-video": cmd_synth_video,
    "import-tf-checkpoint": cmd_import_tf,
    "export-tf-checkpoint": cmd_export_tf,
    "attention-report": cmd_attention_report,
    "report": cmd_report,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    # Reliable platform pinning: some TPU plugins (axon) ignore JAX_PLATFORMS, but the
    # jax.config knob is always honored. FVTA_PLATFORM=cpu forces CPU (tests, CI).
    if os.environ.get("FVTA_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["FVTA_PLATFORM"])
    # Persistent XLA compile cache on every production surface (round-4 fix:
    # only the test suite had it; real runs paid multi-minute cold compiles).
    # Opt out with FVTA_NO_COMPILE_CACHE=1; relocate with FVTA_CACHE_DIR.
    if not os.environ.get("FVTA_NO_COMPILE_CACHE"):
        from fvta_memexqa_tpu.utils.jit_cache import enable_compile_cache

        enable_compile_cache()
    if argv and argv[0] in ("train", "test", "ablate"):
        from fvta_memexqa_tpu.parallel.mesh import maybe_initialize_distributed

        maybe_initialize_distributed()
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        print(f"usage: python -m fvta_memexqa_tpu.cli {{{'|'.join(COMMANDS)}}} ...",
              file=sys.stderr)
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    return COMMANDS[argv[0]](argv[1:]) or 0


if __name__ == "__main__":
    sys.exit(main())
