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
def test_focal_corpus_mechanism(tmp_path):
    """The focality-discriminating corpus (BASELINE.md "Focal ablation"):
    the focal mechanism must LOCALIZE planted photo evidence that flat
    attention cannot (SURVEY.md "What the reference is" item 3 — the paper's
    attention-figure claim as a testable property).

    History matters here: the original gate asserted an ACCURACY ordering
    (fvta > flat), but the corpus had a confound — objects were index-locked
    to trip names/cities, so the trip name IN THE QUESTION revealed the
    answer and the trained model aced focal questions with seq_attn ~0 on
    photos (measured; fixed in make_focal_synthetic, see its in-generator
    comment). On the decorrelated corpus neither variant converts photo
    evidence into accuracy at this CPU scale (both ~0.30-0.39 focal vs 0.25
    chance at 30-100 epochs; the chip-scale re-run is a ROADMAP item), but
    the MECHANISM discriminates sharply:
      - fvta's within-photo time attention peaks AT the planted evidence
        position for 0.25-0.42 of focal questions (chance 0.125; the value
        depends on the runtime environment — training is chaotic enough that
        the suite's 8-virtual-device CPU client and a plain single-device
        client reach different deterministic endpoints, 0.25 vs 0.417);
      - flat's sits at/below chance (0.042-0.125) — its joint softmax cannot
        localize against the decoy mass;
      - both put most sequence mass on the photo modality (no text shortcut
        exists anymore).
    Deterministic per environment (pinned seed, CPU): regression pins with
    cross-environment margins, not statistical claims."""
    import numpy as np

    from fvta_memexqa_tpu.data.synthetic import focal_kind, make_focal_synthetic

    num_albums = 96
    qas, albums, feats, test_ids, glove, val_ids, meta = make_focal_synthetic(
        num_albums=num_albums, photos_per_album=8, num_questions=960, seed=2,
        return_meta=True)
    packdir = str(tmp_path / "focal_pack")
    cfg_d = DataConfig(max_photos=8, max_question_len=12,
                       max_answer_len=4, max_sent_len=8, max_album_text_len=24,
                       max_word_len=10, image_feat_dim=64)
    pack(qas, albums, feats, test_ids, glove, packdir, cfg_d, seed=2,
         val_ids=val_ids)
    packed = load_pack(packdir)
    qid2album = {q.question_id: q.album_ids[0] for q in qas}
    loc, photo_mass, total_acc = {}, {}, {}
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
        # kind via the generator's OWN formula (focal_kind): a bare qi % 5
        # mislabels every question past the first album cycle since the
        # sweep offset landed (commit b578102)
        kinds = np.array([focal_kind(int(q[1:]), num_albums)
                          for q in z["qid"]])
        sel = kinds <= 1
        ev = np.array([meta[qid2album[str(q)]]["evidence_pos"]
                       for q in z["qid"]])
        t_arg = z["time_attn"][:, 0, :].argmax(-1)  # photo seq of album 0
        loc[variant] = float((t_arg[sel] == ev[sel]).mean())
        photo_mass[variant] = float(z["seq_attn"][sel, 0].mean())
        total_acc[variant] = float(m["acc"])
    report = (loc, photo_mass, total_acc)
    # mechanism: fvta localizes the planted evidence well above chance ...
    assert loc["fvta"] >= 0.20, report    # measured 0.25 (suite env) / 0.417
    # ... flat attention cannot localize at all ...
    assert loc["flat"] <= 0.15, report    # measured 0.042-0.125 (chance 0.125)
    assert loc["fvta"] >= loc["flat"] + 0.10, report
    # ... and attention actually engages the photo modality (no text shortcut)
    assert photo_mass["fvta"] >= 0.6, report    # measured 0.82-0.86
    # sanity: the non-focal kinds keep both models well above 4-way chance
    assert total_acc["fvta"] >= 0.55, report    # measured 0.63-0.68
    assert total_acc["flat"] >= 0.50, report    # measured 0.61-0.63


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
