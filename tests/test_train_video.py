"""Video-family training driver (train_video.py): exact resume, keep-best
checkpointing, run-dir test eval — the train.py driver contract applied to
BASELINE config 4."""

import json
import os

import jax
import numpy as np
import pytest

from fvta_memexqa_tpu.config import Config, ModelConfig, TrainConfig
from fvta_memexqa_tpu.data.video_pack import (make_synthetic_video_raw,
                                              pack_video)
# alias: a bare `test_video` at module level would be collected as a test
from fvta_memexqa_tpu.train_video import test_video as eval_video_run
from fvta_memexqa_tpu.train_video import train_video


def small_cfg(**train_kw):
    from fvta_memexqa_tpu.config import DataConfig

    kw = dict(batch_size=4, eval_batch_size=4, learning_rate=2e-3,
              val_period=1000, save_period=1000, log_period=100, seed=3)
    kw.update(train_kw)
    return Config(
        data=DataConfig(max_question_len=8, max_answer_len=3, max_word_len=6,
                        word_emb_dim=16),
        model=ModelConfig(hidden_dim=8, char_emb_dim=4, char_cnn_filters=8,
                          keep_prob=1.0, vocab_embed=True),
        train=TrainConfig(**kw),
    )


@pytest.fixture(scope="module")
def video_pack(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vdrv"))
    qas, feats, test_ids = make_synthetic_video_raw(
        num_videos=40, num_frames=16, feat_dim=32, seed=0)
    pack_video(qas, feats, test_ids, None, out, small_cfg().data,
               max_frames=16, shard_size=7)
    return out


@pytest.fixture(scope="module")
def count_pack(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vdrvc"))
    qas, feats, test_ids = make_synthetic_video_raw(
        num_videos=24, num_frames=16, feat_dim=16, seed=1, task="count")
    pack_video(qas, feats, test_ids, None, out, small_cfg().data,
               max_frames=16, shard_size=7, task="count")
    return out


class TestVideoDriver:
    def test_killed_run_resumes_bit_identically(self, video_pack, tmp_path):
        """num_steps=6 straight vs (stop at 3 → resume to 6): params and
        optimizer state bitwise identical — the same exact-resume gate the
        memexqa driver pins (tests/test_checkpoint.py)."""
        cfg = small_cfg()
        res_a = train_video(cfg, video_pack, str(tmp_path / "straight"),
                            num_steps=6, echo=False)
        killed = str(tmp_path / "killed")
        res_k1 = train_video(cfg, video_pack, killed, num_steps=3, echo=False)
        assert res_k1["steps"] == 3
        res_k2 = train_video(cfg, video_pack, killed, num_steps=6, echo=False)
        assert res_k2["steps"] == res_a["steps"] == 6
        for a, b in zip(jax.tree.leaves(res_a["state"].params),
                        jax.tree.leaves(res_k2["state"].params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(res_a["state"].opt_state),
                        jax.tree.leaves(res_k2["state"].opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_keep_best_and_run_dir_eval(self, video_pack, tmp_path):
        """Periodic val records best-on-val; test_video rebuilds the model
        from the run dir alone and evaluates best (default) or latest."""
        out = str(tmp_path / "run")
        cfg = small_cfg(val_period=4, log_period=4)
        r = train_video(cfg, video_pack, out, num_steps=8, echo=False,
                        metrics_path=os.path.join(out, "metrics.jsonl"))
        assert r["best_val_score"] > -np.inf
        assert os.path.exists(os.path.join(out, "video_run.json"))
        m = eval_video_run(out, split="test", echo=False)
        assert 0.0 <= m["acc"] <= 1.0 and m["count"] == 10
        m_latest = eval_video_run(out, split="test", load_best=False, echo=False)
        assert 0.0 <= m_latest["acc"] <= 1.0
        # metrics JSONL carries the driver metric set
        events = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
        kinds = {e["event"] for e in events}
        assert {"train", "val"} <= kinds
        tr = next(e for e in events if e["event"] == "train")
        assert {"loss", "acc", "qa_pairs_per_sec", "p50_step_ms"} <= set(tr)

    def test_attention_dump_schema(self, video_pack, tmp_path):
        """video-test --dump-attention writes the train.dump_attention npz
        schema plus seq_names (attention-report reads both shapes)."""
        out = str(tmp_path / "adump")
        train_video(small_cfg(), video_pack, out, num_steps=2, echo=False)
        path = os.path.join(out, "attn.npz")
        m = eval_video_run(out, split="test", echo=False, attention_path=path)
        z = np.load(path, allow_pickle=True)
        n = m["count"]
        assert list(z["seq_names"]) == ["frames"]
        assert z["time_attn"].shape[:2] == (n, 1) and z["seq_attn"].shape == (n, 1)
        assert z["probs"].shape[0] == n and len(z["qid"]) == n
        np.testing.assert_allclose(z["seq_attn"], 1.0, atol=1e-6)  # S=1

    def test_count_task_driver_and_score(self, count_pack, tmp_path):
        """count runs: keep-best key is NEGATIVE val MSE; test_video reports
        mse alongside rounded exact-match acc."""
        out = str(tmp_path / "cnt")
        cfg = small_cfg(val_period=4)
        r = train_video(cfg, count_pack, out, num_steps=6, echo=False)
        assert r["task"] == "count" and r["best_val_score"] <= 0.0
        m = eval_video_run(out, split="test", echo=False)
        assert "mse" in m and m["mse"] >= 0.0 and m["score"] == -m["mse"]

    def test_empty_train_split_raises(self, tmp_path):
        qas, feats, _ = make_synthetic_video_raw(num_videos=8, num_frames=8,
                                                 feat_dim=8, seed=2)
        out = str(tmp_path / "allp")
        pack_video(qas, feats, {q["qa_id"] for q in qas}, None, out,
                   small_cfg().data, max_frames=8, shard_size=4)
        with pytest.raises(ValueError, match="train split is empty"):
            train_video(small_cfg(), out, str(tmp_path / "r"), num_steps=1,
                        echo=False)
