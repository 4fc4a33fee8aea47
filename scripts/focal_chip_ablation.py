#!/usr/bin/env python
"""Chip-scale focal ablation on the DECORRELATED corpus (ROADMAP #5).

The round-3 session-3 correction (BASELINE.md "Focal ablation") retired the
original 240-album accuracy table: the corpus was confounded (object
index-locked to trip name), so fvta's win there was a text shortcut. On the
fixed generator the MECHANISM discriminates (fvta localizes the planted
evidence 2-3.3x chance while flat sits at chance —
tests/test_slow_regression.py::test_focal_corpus_mechanism) but neither
variant converted localization into accuracy at 96-album CPU scale. This
harness re-runs the ablation honestly at chip scale / longer budgets /
optionally higher evidence SNR, and reports BOTH stories per variant x
budget: the accuracy table (total + per question kind) and the mechanism
metrics (evidence-localization rate, photo-modality sequence mass).

Prints ONE JSON line on stdout; per-run progress goes to stderr.

Usage (on the chip):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/focal_chip_ablation.py \
      /tmp/focal_chip --num-albums 240 --num-questions 2400 --epochs 15,40
CPU smoke:
  FVTA_PLATFORM=cpu python scripts/focal_chip_ablation.py /tmp/focal_smoke \
      --num-albums 12 --num-questions 120 --epochs 2 --hidden 16
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KIND_NAMES = {0: "focal", 1: "focal", 2: "album_say", 3: "where", 4: "year"}


def main():
    p = argparse.ArgumentParser(prog="focal_chip_ablation")
    p.add_argument("outdir")
    p.add_argument("--num-albums", type=int, default=240)
    p.add_argument("--num-questions", type=int, default=2400)
    p.add_argument("--photos-per-album", type=int, default=8)
    p.add_argument("--epochs", default="15,40",
                   help="comma-separated training budgets (epochs)")
    p.add_argument("--variants", default="fvta,flat")
    p.add_argument("--hidden", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--train-seed", type=int, default=None,
                   help="init/shuffle seed (default: --seed). Decoupling it "
                        "from the corpus seed separates corpus-draw variance "
                        "from init variance across repeats.")
    p.add_argument("--albums-per-question", type=int, default=1,
                   help="K>1 = the multi-album regime: K-1 same-split "
                        "distractor albums per question, wrong choices drawn "
                        "from their planted facts (see make_focal_synthetic)")
    p.add_argument("--noise-scale", type=float, default=0.3,
                   help="evidence-SNR knob (generator default 0.3; lower = "
                        "stronger planted signal)")
    p.add_argument("--decoy-repeats", type=int, default=12)
    p.add_argument("--corpus", default="focal", choices=["focal", "evidence"],
                   help="focal = make_focal_synthetic (round-3/4 tables); "
                        "evidence = make_evidence_only_synthetic, the round-5 "
                        "evidence-is-the-ONLY-signal corpus (K=1 only)")
    args = p.parse_args()
    if args.corpus == "evidence" and args.albums_per_question != 1:
        raise SystemExit("--corpus evidence is K=1 by design (the K>1 "
                         "composition was measured beyond both variants; "
                         "BASELINE.md)")

    if os.environ.get("FVTA_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["FVTA_PLATFORM"])
    from fvta_memexqa_tpu.utils.jit_cache import enable_compile_cache
    enable_compile_cache()  # seeds/variants share shapes; skip repeat compiles

    import jax
    import numpy as np

    from fvta_memexqa_tpu.config import (Config, DataConfig, ModelConfig,
                                         TrainConfig)
    from fvta_memexqa_tpu.data import load_pack, pack
    from fvta_memexqa_tpu.data.synthetic import (focal_kind,
                                                 make_evidence_only_synthetic,
                                                 make_focal_synthetic)
    from fvta_memexqa_tpu.train import test as run_test, train as run_train

    if args.corpus == "evidence":
        qas, albums, feats, test_ids, glove, val_ids, meta = \
            make_evidence_only_synthetic(
                num_albums=args.num_albums,
                photos_per_album=args.photos_per_album,
                num_questions=args.num_questions, seed=args.seed,
                decoy_repeats=args.decoy_repeats,
                noise_scale=args.noise_scale, return_meta=True)
    else:
        qas, albums, feats, test_ids, glove, val_ids, meta = make_focal_synthetic(
            num_albums=args.num_albums, photos_per_album=args.photos_per_album,
            num_questions=args.num_questions, seed=args.seed,
            decoy_repeats=args.decoy_repeats, noise_scale=args.noise_scale,
            albums_per_question=args.albums_per_question, return_meta=True)
    packdir = os.path.join(args.outdir, "pack")
    cfg_d = DataConfig(max_albums=args.albums_per_question,
                       max_photos=args.photos_per_album, max_question_len=12,
                       max_answer_len=4, max_sent_len=8, max_album_text_len=24,
                       max_word_len=10, image_feat_dim=64)
    pack(qas, albums, feats, test_ids, glove, packdir, cfg_d, seed=args.seed,
         val_ids=val_ids)
    packed = load_pack(packdir)
    # Per-question ground truth: the OWNER album (the trip the question names)
    # and its slot in the (shuffled) album_ids order — pack assigns context
    # slots in album_ids order, and album slot a's photo sequence is context
    # sequence index a*6 (models/fvta.py: S groups album-major).
    qid2owner, qid2slot = {}, {}
    for qi, q in enumerate(qas):
        owner = f"album{qi % args.num_albums}"
        qid2owner[q.question_id] = owner
        qid2slot[q.question_id] = q.album_ids.index(owner)
    # fused kernels ship the train step on TPU (same default as cmd_train)
    use_pallas = jax.default_backend() == "tpu"

    results = {}
    for variant in args.variants.split(","):
        for ep in (int(e) for e in args.epochs.split(",")):
            cfg = Config().replace(
                data=packed.cfg,
                model=ModelConfig(hidden_dim=args.hidden, char_emb_dim=8,
                                  char_cnn_filters=16, keep_prob=0.9,
                                  attention=variant, use_pallas=use_pallas),
                train=TrainConfig(batch_size=args.batch_size,
                                  eval_batch_size=args.batch_size,
                                  learning_rate=args.lr, num_epochs=ep,
                                  val_period=100, save_period=2000,
                                  log_period=200,
                                  seed=(args.train_seed if args.train_seed
                                        is not None else args.seed)))
            rundir = os.path.join(args.outdir, f"{variant}_ep{ep}")
            os.makedirs(rundir, exist_ok=True)
            run_train(cfg, packed, rundir, echo=False)
            att = os.path.join(rundir, "att.npz")
            m = run_test(cfg, packed, rundir, load_best=True, echo=False,
                         attention_path=att)
            z = np.load(att)
            kinds = np.array([focal_kind(int(q[1:]), args.num_albums)
                              for q in z["qid"]])
            correct = z["pred"] == z["label"]
            sel = kinds <= 1
            ev = np.array([meta[qid2owner[str(q)]]["evidence_pos"]
                           for q in z["qid"]])
            # evidence album slot a -> its photo sequence is context seq a*6
            pseq = np.array([qid2slot[str(q)] * 6 for q in z["qid"]])
            rows = np.arange(len(pseq))
            t_arg = z["time_attn"][rows, pseq, :].argmax(-1)
            seq_arg = z["seq_attn"].argmax(-1)
            entry = {
                "test_acc": float(m["acc"]),
                "count": int(m["count"]),
                "loc_rate": float((t_arg[sel] == ev[sel]).mean()),
                "photo_mass": float(z["seq_attn"][rows[sel], pseq[sel]].mean()),
                # top sequence lies anywhere in the OWNER album's 6 sequences
                "album_sel_rate": float(
                    ((seq_arg[sel] // 6) == (pseq[sel] // 6)).mean()),
            }
            for k in (2, 3, 4):
                entry[f"{KIND_NAMES[k]}_acc"] = float(
                    correct[kinds == k].mean()) if (kinds == k).any() else None
            entry["focal_acc"] = float(correct[sel].mean())
            if args.corpus == "evidence":
                # where/year also route through the marked evidence photo —
                # report their localization rates too
                for k in (3, 4):
                    ksel = kinds == k
                    entry[f"{KIND_NAMES[k]}_loc"] = float(
                        (t_arg[ksel] == ev[ksel]).mean()) if ksel.any() else None
            results[f"{variant}_ep{ep}"] = entry
            print(f"[focal-ablate] {variant} ep{ep}: {json.dumps(entry)}",
                  file=sys.stderr, flush=True)
    print(json.dumps({
        "corpus": args.corpus,
        "num_albums": args.num_albums, "num_questions": args.num_questions,
        "noise_scale": args.noise_scale, "decoy_repeats": args.decoy_repeats,
        "albums_per_question": args.albums_per_question,
        "hidden": args.hidden, "seed": args.seed,
        "train_seed": (args.train_seed if args.train_seed is not None
                       else args.seed),
        "chance_loc": 1.0 / args.photos_per_album, "chance_acc": 0.25,
        "backend": jax.default_backend(), "results": results,
    }))


if __name__ == "__main__":
    main()
