"""End-to-end: overfit the synthetic mini-dataset (SURVEY.md section 4 item 3),
checkpoint save/restore/resume, and the 3-command CLI flow."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from fvta_memexqa_tpu.config import Config, ModelConfig, TrainConfig
from fvta_memexqa_tpu.data import Dataset, load_pack
from fvta_memexqa_tpu.train import (
    evaluate,
    make_eval_step,
    test as run_test,
    train as run_train,
)


def overfit_config(packed, num_epochs=60) -> Config:
    cfg = Config()
    return cfg.replace(
        data=packed.cfg,
        model=ModelConfig(hidden_dim=16, char_emb_dim=8, char_cnn_filters=16,
                          keep_prob=1.0),
        train=TrainConfig(batch_size=8, eval_batch_size=8, learning_rate=2e-3,
                          num_epochs=num_epochs, val_period=50, save_period=100,
                          log_period=50, seed=0),
    )


@pytest.fixture(scope="module")
def trained(packed_synth, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    cfg = overfit_config(packed_synth)
    res = run_train(cfg, packed_synth, out, metrics_path=os.path.join(out, "m.jsonl"),
                    echo=False)
    return cfg, res, out


class TestOverfit:
    def test_train_accuracy_reaches_100(self, packed_synth, trained):
        cfg, res, out = trained
        eval_step = make_eval_step(cfg, res["model"])
        m = evaluate(eval_step, res["state"].params, res["shared"],
                     Dataset(packed_synth, "train"), 8)
        assert m["acc"] == 1.0, f"failed to overfit: train acc {m['acc']}"

    def test_val_acc_recorded(self, trained):
        _, res, out = trained
        assert res["best_val_acc"] >= 0.0
        lines = [json.loads(l) for l in open(os.path.join(out, "m.jsonl"))]
        assert any(r["event"] == "val" for r in lines)
        assert any(r["event"] == "train" and "qa_pairs_per_sec" in r for r in lines)

    def test_checkpoint_restore_and_test_fn(self, packed_synth, trained):
        cfg, res, out = trained
        m = run_test(cfg, packed_synth, out, load_best=True, split="train", echo=False)
        assert m["acc"] == 1.0  # restored params reproduce the overfit exactly
        assert m["count"] == Dataset(packed_synth, "train").n

    def test_report_cli(self, packed_synth, trained, capsys):
        """cli report renders the run's JSONL record (train/val/test rows,
        by-category table), JSON and human views."""
        import shutil

        cfg, res, out = trained
        # the fixture logs to m.jsonl; report reads the standard name
        shutil.copyfile(os.path.join(out, "m.jsonl"),
                        os.path.join(out, "metrics.jsonl"))
        run_test(cfg, packed_synth, out, load_best=True, split="train",
                 echo=False, by_category=True,
                 metrics_path=os.path.join(out, "metrics.jsonl"))
        from fvta_memexqa_tpu.cli import cmd_report

        assert cmd_report([out, "--json"]) == 0
        s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert 0 < s["steps"] <= res["steps"]
        assert s["best_val_acc"] == res["best_val_acc"]
        assert s["tests"] and s["tests"][-1]["acc"] == 1.0
        assert s["by_category"]
        assert cmd_report([out]) == 0  # human view renders
        assert "best acc" in capsys.readouterr().out
        assert cmd_report([str(out) + "_nope"]) == 1  # missing dir → rc 1

    def test_report_cli_video_mse(self, tmp_path, capsys):
        """report degrades to mse rows (video count-task run dirs)."""
        run = tmp_path / "vrun"
        run.mkdir()
        rows = [
            {"event": "train", "time": 0, "step": 10, "loss": 1.0},
            {"event": "val", "time": 0, "step": 10, "mse": 2.5, "count": 8},
            {"event": "val", "time": 0, "step": 20, "mse": 1.5, "count": 8},
            {"event": "test", "time": 0, "split": "test", "mse": 1.6,
             "count": 8},
        ]
        (run / "metrics.jsonl").write_text(
            "\n".join(json.dumps(r) for r in rows))
        from fvta_memexqa_tpu.cli import cmd_report

        assert cmd_report([str(run), "--json"]) == 0
        s = json.loads(capsys.readouterr().out.strip())
        assert s["best_val_mse"] == 1.5 and s["best_val_acc"] is None
        assert cmd_report([str(run)]) == 0
        out2 = capsys.readouterr().out
        assert "best mse 1.5000" in out2 and "mse 1.6000" in out2

    def test_report_cli_foreign_partial_rows(self, tmp_path, capsys):
        """report tolerates train rows without 'loss'/'step' and ensemble rows
        without 'acc' — a foreign/partial metrics.jsonl must render, not
        KeyError (ADVICE r4)."""
        run = tmp_path / "frun"
        run.mkdir()
        rows = [
            {"event": "train", "time": 0, "step": 5},          # no loss
            {"event": "train", "time": 0},                     # no step either
            {"event": "val", "time": 0, "acc": 0.5, "loss": 1.0},  # no step
            {"time": 0, "note": "rogue row"},                  # no event at all
            {"event": "test_ensemble", "time": 0, "split": "test",
             "count": 8},                                      # no acc
        ]
        (run / "metrics.jsonl").write_text(
            "\n".join(json.dumps(r) for r in rows))
        from fvta_memexqa_tpu.cli import cmd_report

        assert cmd_report([str(run), "--json"]) == 0
        s = json.loads(capsys.readouterr().out.strip())
        assert s["final_train_loss"] is None and s["steps"] == 0
        assert cmd_report([str(run)]) == 0  # human view renders without crash
        out2 = capsys.readouterr().out
        assert "train: 0 steps" in out2 and "ensemble" in out2

    def test_by_category_breakdown(self, packed_synth, trained):
        """--by-category: the paper-table split must aggregate back to the
        overall accuracy (data/categories.py)."""
        cfg, res, out = trained
        m = run_test(cfg, packed_synth, out, load_best=True, split="train",
                     echo=False, by_category=True)
        bc = m["by_category"]
        assert sum(v["count"] for v in bc.values()) == m["count"]
        overall = sum(v["acc"] * v["count"] for v in bc.values()) / m["count"]
        np.testing.assert_allclose(overall, m["acc"], rtol=1e-6)

    def test_self_ensemble_matches_single(self, packed_synth, trained):
        """Averaging a run with itself is the run: ensemble plumbing exact."""
        from fvta_memexqa_tpu.train import test_ensemble

        cfg, res, out = trained
        single = run_test(cfg, packed_synth, out, load_best=True, split="train",
                          echo=False)
        ens = test_ensemble(cfg, packed_synth, [out, out], load_best=True,
                            split="train", echo=False, by_category=True)
        assert ens["acc"] == single["acc"]
        assert [mm["acc"] for mm in ens["members"]] == [single["acc"]] * 2
        assert ens["count"] == single["count"]
        # the two features compose: category rows over the ensembled preds
        bc = ens["by_category"]
        assert sum(v["count"] for v in bc.values()) == ens["count"]
        overall = sum(v["acc"] * v["count"] for v in bc.values()) / ens["count"]
        np.testing.assert_allclose(overall, ens["acc"], rtol=1e-6)

    def test_ensemble_honors_data_parallel(self, packed_synth, trained):
        """test_ensemble with cfg.mesh.data_parallel>1 evaluates DP-sharded
        and matches the single-device ensemble exactly (ADVICE r4: the flag
        was silently ignored)."""
        from fvta_memexqa_tpu.config import MeshConfig
        from fvta_memexqa_tpu.train import test_ensemble

        cfg, res, out = trained
        single = test_ensemble(cfg, packed_synth, [out, out], load_best=True,
                               split="train", echo=False)
        dp_cfg = cfg.replace(mesh=MeshConfig(data_parallel=2))
        dp = test_ensemble(dp_cfg, packed_synth, [out, out], load_best=True,
                           split="train", echo=False)
        assert dp["acc"] == single["acc"]
        assert [m["acc"] for m in dp["members"]] == [m["acc"]
                                                     for m in single["members"]]

    def test_ensemble_member_odd_saved_batch(self, packed_synth, trained,
                                             tmp_path):
        """A member whose SAVED config carries an eval_batch_size that does
        not divide the DP mesh must not crash mid-eval: eval batching follows
        the CALLER's config (what --eval-batch-size/--data-parallel
        validated); the member's config owns only the architecture."""
        import dataclasses as _dc
        import shutil

        from fvta_memexqa_tpu.config import (MeshConfig, load_config,
                                             save_config)
        from fvta_memexqa_tpu.train import test_ensemble

        cfg, res, out = trained
        odd = str(tmp_path / "odd_member")
        shutil.copytree(out, odd)
        cfg_path = os.path.join(odd, "config.json")
        mcfg = load_config(cfg_path)
        save_config(mcfg.replace(
            train=_dc.replace(mcfg.train, eval_batch_size=3)), cfg_path)
        single = test_ensemble(cfg, packed_synth, [out, out], load_best=True,
                               split="train", echo=False)
        dp_cfg = cfg.replace(mesh=MeshConfig(data_parallel=2))
        dp = test_ensemble(dp_cfg, packed_synth, [out, odd], load_best=True,
                           split="train", echo=False)
        # odd is a byte-copy of out, so the ensemble is the self-ensemble
        assert dp["acc"] == single["acc"]
        assert dp["count"] == single["count"]

    def test_attention_dump(self, packed_synth, trained, tmp_path, capsys):
        """test(attention_path=...) writes the qualitative-analysis tensors,
        consistent with the reported metrics."""
        cfg, res, out = trained
        path = str(tmp_path / "attn.npz")
        m = run_test(cfg, packed_synth, out, load_best=True, split="train",
                     echo=False, attention_path=path)
        z = np.load(path)
        n = Dataset(packed_synth, "train").n
        d, s = cfg.data, cfg.data.max_albums * 6
        assert z["time_attn"].shape == (n, s, d.max_context_time)
        assert z["seq_attn"].shape == (n, s)
        assert z["probs"].shape == (n, 4)
        np.testing.assert_allclose(z["probs"].sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(z["seq_attn"].sum(-1), 1.0, rtol=1e-4)
        assert (z["pred"] == z["label"]).mean() == pytest.approx(m["acc"], abs=1e-6)
        assert len(set(z["qid"])) == n

        # the attention-report CLI renders it (in-process; JSON mode)
        from fvta_memexqa_tpu.cli import cmd_attention_report
        qid0 = str(z["qid"][0])
        rc = cmd_attention_report([path, "--qid", qid0, "--json", "--top", "2"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        rec = json.loads(out[-1])
        assert rec["qid"] == qid0 and len(rec["focus"]) == 2
        # cells are sorted by joint focal weight; weights are probabilities
        w = [c["weight"] for c in rec["focus"]]
        assert w[0] >= w[1] >= 0.0 and w[0] <= 1.0
        assert rec["focus"][0]["modality"] in (
            "photo", "photo_title", "album_title", "album_desc", "when", "where")
        assert cmd_attention_report([path, "--qid", "no-such-qid"]) == 2

    def test_resume_continues_from_checkpoint(self, packed_synth, tmp_path):
        # minimal budgets: this asserts only that a second train() RESUMES
        # (bitwise continuation is test_checkpoint's fault-injection job)
        out = str(tmp_path / "resume_run")
        cfg = overfit_config(packed_synth, num_epochs=1)
        res1 = run_train(cfg, packed_synth, out, echo=False)
        steps1 = res1["steps"]
        cfg2 = overfit_config(packed_synth, num_epochs=2)
        res2 = run_train(cfg2, packed_synth, out, echo=False)
        assert res2["steps"] > steps1  # resumed, not restarted


class TestCLI:
    def test_full_cli_flow(self, tmp_path):
        """synth → prepro → train → test through the real CLI surface."""
        raw = str(tmp_path / "raw")
        packdir = str(tmp_path / "pack")
        rundir = str(tmp_path / "run")
        env = {**os.environ, "FVTA_PLATFORM": "cpu"}
        py = sys.executable

        def run(args):
            r = subprocess.run([py, "-m", "fvta_memexqa_tpu.cli", *args],
                               capture_output=True, text=True, env=env,
                               cwd="/root/repo", timeout=900)
            assert r.returncode == 0, f"{args}: {r.stderr[-2000:]}"
            return r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""

        run(["synth", raw, "--num-questions", "12", "--num-albums", "3"])
        out = json.loads(run([
            "prepro", f"{raw}/qas.json", f"{raw}/album_info.json",
            f"{raw}/test_question.ids", f"{raw}/glove.txt", f"{raw}/photo_feats.npz",
            packdir, "--max-albums", "2", "--max-photos", "4",
            "--max-question-len", "10", "--max-answer-len", "4", "--max-sent-len", "6",
            "--max-album-text-len", "8", "--max-word-len", "8", "--image-feat-dim", "64",
        ]))
        assert out["splits"]["train"] > 0 and out["splits"]["test"] > 0
        out = json.loads(run([
            "train", packdir, rundir, "--hidden-dim", "8", "--char-emb-dim", "4",
            "--char-cnn-filters", "8", "--num-epochs", "2", "--batch-size", "4",
            "--val-period", "5", "--log-period", "5",
        ]))
        assert out["steps"] > 0
        out = json.loads(run(["test", packdir, rundir, "--by-category"]))
        assert 0.0 <= out["accuracy"] <= 1.0 and out["count"] == 3
        assert sum(v["count"] for v in out["by_category"].values()) == out["count"]
        assert os.path.exists(os.path.join(rundir, "config.json"))
        assert os.path.exists(os.path.join(rundir, "metrics.jsonl"))
        # cached and uncached eval agree through the CLI too
        out2 = json.loads(run(["test", packdir, rundir, "--no-album-cache"]))
        assert out2["accuracy"] == out["accuracy"]
        # a self-ensemble reproduces the single-run accuracy through the CLI
        out5 = json.loads(run(["test", packdir, rundir, "--ensemble", rundir]))
        assert out5["accuracy"] == out["accuracy"]
        assert [m["acc"] for m in out5["members"]] == [out["accuracy"]] * 2
        # one-shot prediction against an ingested raw album
        out3 = json.loads(run([
            "predict", packdir, rundir, "--question", "where did we go ?",
            "--choices", "a|b|c|d", "--album-ids", "album0",
            "--raw-albums", f"{raw}/album_info.json",
            "--raw-photo-npz", f"{raw}/photo_feats.npz",
        ]))
        assert out3["albums_found"] == 1 and len(out3["probs"]) == 4
        # ...and against the pack's own album with NO raw side channel: the
        # store lazily encodes it from its pack row (used to silently answer
        # with zero context, albums_found=0)
        out4 = json.loads(run([
            "predict", packdir, rundir, "--question", "where did we go ?",
            "--choices", "a|b|c|d", "--album-ids", "album0",
        ]))
        assert out4["albums_found"] == 1
        assert np.allclose(out4["probs"], out3["probs"], atol=1e-4)

    def test_ablate_cli(self, tmp_path):
        raw = str(tmp_path / "raw")
        packdir = str(tmp_path / "pack")
        env = {**os.environ, "FVTA_PLATFORM": "cpu"}
        py = sys.executable

        def run(args, timeout=1200):
            r = subprocess.run([py, "-m", "fvta_memexqa_tpu.cli", *args],
                               capture_output=True, text=True, env=env,
                               cwd="/root/repo", timeout=timeout)
            assert r.returncode == 0, f"{args}: {r.stderr[-2000:]}"
            return r.stdout.strip().splitlines()[-1]

        run(["synth", raw, "--num-questions", "12", "--num-albums", "3"])
        run(["prepro", f"{raw}/qas.json", f"{raw}/album_info.json",
             f"{raw}/test_question.ids", "none", f"{raw}/photo_feats.npz",
             str(tmp_path / "pack"), "--max-albums", "2", "--max-photos", "4",
             "--max-question-len", "10", "--max-answer-len", "4",
             "--max-sent-len", "6", "--max-album-text-len", "8",
             "--max-word-len", "8", "--image-feat-dim", "64"])
        out = json.loads(run(["ablate", packdir, str(tmp_path / "abl"),
                              "--hidden-dim", "8", "--char-emb-dim", "4",
                              "--char-cnn-filters", "8", "--num-epochs", "1",
                              "--batch-size", "4", "--val-period", "50",
                              "--variants", "fvta,none"]))
        assert set(out) == {"fvta", "none"}
        assert all("test_acc" in v and "per_seed" not in v
                   for v in out.values())
        # multi-seed sweep axis: per-seed detail + the mean
        out2 = json.loads(run(["ablate", packdir, str(tmp_path / "abl2"),
                               "--hidden-dim", "8", "--char-emb-dim", "4",
                               "--char-cnn-filters", "8", "--num-steps", "2",
                               "--batch-size", "4", "--val-period", "50",
                               "--variants", "none", "--seeds", "0,1"]))
        v = out2["none"]
        assert set(v["per_seed"]) == {"0", "1"}
        want = sum(s["test_acc"] for s in v["per_seed"].values()) / 2
        assert v["test_acc"] == pytest.approx(want, abs=1e-9)

    def test_video_cli(self, tmp_path):
        # --cp 2: the context-parallel training surface (frame axis sharded
        # over 2 of the conftest's 8 virtual devices) through the real CLI
        env = {**os.environ, "FVTA_PLATFORM": "cpu"}
        r = subprocess.run(
            [sys.executable, "-m", "fvta_memexqa_tpu.cli", "video",
             "--num-videos", "16", "--num-frames", "8", "--steps", "30",
             "--hidden-dim", "8", "--cp", "2"],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=1200)
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert 0.0 <= out["heldout_acc"] <= 1.0 and out["chance"] == 0.2
        assert out["cp"] == 2
        # indivisible frame count → clean one-line error, not a traceback
        r2 = subprocess.run(
            [sys.executable, "-m", "fvta_memexqa_tpu.cli", "video",
             "--num-videos", "8", "--num-frames", "9", "--steps", "1",
             "--hidden-dim", "8", "--cp", "2"],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=600)
        assert r2.returncode != 0
        assert "divisible" in (r2.stderr + r2.stdout)
