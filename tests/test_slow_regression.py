"""Slow accuracy-regression tests (SURVEY.md section 4 item 5): real MemexQA is not
in the sandbox, so the stand-in is GENERALIZATION on a larger synthetic set — the
model must answer held-out questions about seen albums well above chance (questions
are derivable from album content; chance = 25%)."""

import os

import pytest

from fvta_memexqa_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from fvta_memexqa_tpu.data import load_pack, make_synthetic, pack
from fvta_memexqa_tpu.train import test as run_test, train as run_train

slow = pytest.mark.skipif(
    not os.environ.get("FVTA_RUN_SLOW"),
    reason="slow regression test; set FVTA_RUN_SLOW=1",
)


@slow
def test_focal_corpus_fvta_beats_flat(tmp_path):
    """The focality-discriminating corpus (BASELINE.md "Focal ablation"):
    hierarchical focal attention must beat flat attention on unseen-album
    test questions — the mechanism the model family exists for (SURVEY.md
    "What the reference is" item 3). At the recorded 240-album scale the gap
    is 0.72 vs 0.57 total / 0.93 vs 0.78 focal; this gate runs a 96-album
    version (measured: fvta 0.979 vs flat 0.879 total, both saturating the
    focal kind — the diversity-driven focal gap needs the full 240-album run,
    kept as the recorded chip experiment) and pins the total-accuracy
    ordering plus fvta's near-perfect focal accuracy. Training is
    deterministic (pinned seed, CPU), so these are regression pins, not
    statistical claims."""
    import numpy as np

    from fvta_memexqa_tpu.data.synthetic import make_focal_synthetic

    qas, albums, feats, test_ids, glove, val_ids = make_focal_synthetic(
        num_albums=96, photos_per_album=8, num_questions=960, seed=2)
    packdir = str(tmp_path / "focal_pack")
    cfg_d = DataConfig(max_photos=8, max_question_len=12,
                       max_answer_len=4, max_sent_len=8, max_album_text_len=24,
                       max_word_len=10, image_feat_dim=64)
    pack(qas, albums, feats, test_ids, glove, packdir, cfg_d, seed=2,
         val_ids=val_ids)
    packed = load_pack(packdir)
    total_acc, focal_acc = {}, {}
    for variant in ("fvta", "flat"):
        cfg = Config().replace(
            data=packed.cfg,
            model=ModelConfig(hidden_dim=32, char_emb_dim=8, char_cnn_filters=16,
                              keep_prob=0.9, attention=variant),
            train=TrainConfig(batch_size=32, eval_batch_size=32,
                              learning_rate=1e-3, num_epochs=30, val_period=100,
                              save_period=400, log_period=100, seed=2))
        rundir = str(tmp_path / f"focal_{variant}")
        run_train(cfg, packed, rundir, echo=False)
        att = os.path.join(rundir, "att.npz")
        m = run_test(cfg, packed, rundir, load_best=True, echo=False,
                     attention_path=att)
        z = np.load(att)
        kinds = np.array([int(q[1:]) % 5 for q in z["qid"]])
        acc = z["pred"] == z["label"]
        total_acc[variant] = float(m["acc"])
        focal_acc[variant] = float(acc[kinds <= 1].mean())
    assert focal_acc["fvta"] >= 0.9, (focal_acc, total_acc)
    assert total_acc["fvta"] >= 0.93, (focal_acc, total_acc)
    assert total_acc["fvta"] >= total_acc["flat"] + 0.05, (focal_acc, total_acc)


@slow
def test_generalizes_to_heldout_questions(tmp_path):
    qas, albums, feats, test_ids, glove = make_synthetic(
        num_albums=8, photos_per_album=6, num_questions=240, feat_dim=64, seed=1,
        test_fraction=0.2,
    )
    packdir = str(tmp_path / "pack")
    cfg_d = DataConfig(max_albums=2, max_photos=8, max_question_len=12,
                       max_answer_len=4, max_sent_len=6, max_album_text_len=10,
                       max_word_len=10, image_feat_dim=64)
    pack(qas, albums, feats, test_ids, glove, packdir, cfg_d, seed=1)
    packed = load_pack(packdir)
    cfg = Config().replace(
        data=packed.cfg,
        model=ModelConfig(hidden_dim=24, char_emb_dim=8, char_cnn_filters=16,
                          keep_prob=0.9),
        train=TrainConfig(batch_size=16, eval_batch_size=16, learning_rate=2e-3,
                          num_epochs=40, val_period=60, save_period=200,
                          log_period=60, seed=1),
    )
    rundir = str(tmp_path / "run")
    run_train(cfg, packed, rundir, echo=False)
    m = run_test(cfg, packed, rundir, load_best=True, echo=False)
    assert m["count"] == 48
    assert m["acc"] >= 0.7, f"held-out accuracy {m['acc']:.3f} < 0.7 (chance 0.25)"
