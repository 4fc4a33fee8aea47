"""Video-QA data path: raw schema parse, pack → streaming shards → VideoInputs
batches, frame subsample/pad, and learnability end-to-end (BASELINE config 4
real-data path)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fvta_memexqa_tpu.config import DataConfig
from fvta_memexqa_tpu.data.video_pack import (VideoDataset, _subsample_frames,
                                              load_video_meta,
                                              make_synthetic_video_raw,
                                              pack_video, parse_video_qas,
                                              video_shared_tables,
                                              write_raw_video_files)


def small_cfg():
    return DataConfig(max_question_len=8, max_answer_len=3, max_word_len=6,
                      word_emb_dim=16)


@pytest.fixture(scope="module")
def video_pack_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vpack"))
    qas, feats, test_ids = make_synthetic_video_raw(
        num_videos=40, num_frames=16, feat_dim=32, seed=0)
    pack_video(qas, feats, test_ids, None, out, small_cfg(),
               max_frames=16, shard_size=7)
    return out


class TestSubsample:
    def test_long_video_subsampled(self):
        feats = np.arange(40, dtype=np.float32).reshape(20, 2)
        out, mask = _subsample_frames(feats, 8)
        assert out.shape == (8, 2) and mask.all()
        assert out[0, 0] == 0 and out[-1, 0] == feats[-1, 0]  # endpoints kept
        assert (np.diff(out[:, 0]) > 0).all()                 # order preserved

    def test_short_video_padded(self):
        feats = np.ones((3, 2), np.float32)
        out, mask = _subsample_frames(feats, 8)
        assert mask[:3].all() and not mask[3:].any()
        assert (out[3:] == 0).all()


class TestParse:
    def test_malformed_rows_reported(self, tmp_path):
        path = str(tmp_path / "qas.jsonl")
        rows = [
            {"qa_id": "a", "video_id": "v", "question": "q ?",
             "choices": ["x", "y"], "answer_idx": 0},
            {"qa_id": "b", "video_id": "v", "question": "",
             "choices": ["x", "y"], "answer_idx": 0},          # no question
            {"qa_id": "c", "video_id": "v", "question": "q",
             "choices": ["x"], "answer_idx": 0},               # 1 choice
            {"qa_id": "d", "video_id": "v", "question": "q",
             "choices": ["x", "y"], "answer_idx": 5},          # label range
            {"qa_id": "e", "question": "q",
             "choices": ["x", "y"], "answer_idx": 0},          # no video_id
        ]
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        good, errs = parse_video_qas(path)
        assert [q["qa_id"] for q in good] == ["a"]
        assert len(errs) == 4

    def test_per_task_validation(self, tmp_path):
        """Each TGIF-QA task validates its own label field (video_pack.
        parse_video_qas docstring)."""
        path = str(tmp_path / "qas.jsonl")
        rows = [
            {"qa_id": "a", "video_id": "v", "question": "q ?",
             "answer_count": 3, "answer": "jump"},
            {"qa_id": "b", "video_id": "v", "question": "q ?",
             "answer_count": -1},                         # negative count
            {"qa_id": "c", "video_id": "v", "question": "q ?",
             "answer": "  "},                             # blank answer
            {"qa_id": "d", "video_id": "v", "question": "q ?",
             "answer_count": "four"},                     # non-integer count
        ]
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        good, errs = parse_video_qas(path, task="count")
        assert [q["qa_id"] for q in good] == ["a"] and len(errs) == 3
        good, errs = parse_video_qas(path, task="frameqa")  # b,d: no answer
        assert [q["qa_id"] for q in good] == ["a"] and len(errs) == 3
        good, errs = parse_video_qas(path, task="mc")   # none carry choices
        assert good == [] and len(errs) == 4
        with pytest.raises(ValueError, match="unknown task"):
            parse_video_qas(path, task="nope")


class TestVideoPack:
    def test_splits_and_shapes(self, video_pack_dir):
        cfg, meta, shared = load_video_meta(video_pack_dir)
        assert meta["split_sizes"]["test"] == 10  # 25% of 40
        assert meta["split_sizes"]["train"] + meta["split_sizes"]["val"] == 30
        assert shared["word_emb_init"].shape[1] == 16
        assert cfg.image_feat_dim == 32

        ds = VideoDataset(video_pack_dir, "train")
        vi = next(iter(ds.get_batches(4)))
        assert vi.frame_feats.shape == (4, 16, 32)
        assert vi.choice_words.shape == (4, 5, cfg.max_answer_len)
        assert vi.ex_mask.all()

    def test_dropped_rows_counted(self, tmp_path):
        """Rows dropped for missing frame feats or a mismatched choice count
        must be COUNTED in meta — a bad frame_feats.npz must not shrink the
        dataset silently."""
        qas, feats, test_ids = make_synthetic_video_raw(
            num_videos=12, num_frames=8, feat_dim=8, seed=1)
        del feats["video0"], feats["video1"]          # 2 rows lose their video
        qas[2]["choices"] = qas[2]["choices"][:3]     # 1 row wrong choice count
        meta = pack_video(qas, feats, test_ids, None,
                          str(tmp_path / "drop"), small_cfg(),
                          max_frames=8, shard_size=4)
        assert meta["dropped"] == {"missing_video_feats": 2,
                                   "wrong_choice_count": 1}
        assert sum(meta["split_sizes"].values()) == 9

    def test_pack_count_labels(self, tmp_path):
        """count packs answer_count as the label and collapses the unused
        choice arrays to C=1 (minimal static shapes)."""
        qas, feats, test_ids = make_synthetic_video_raw(
            num_videos=12, num_frames=16, feat_dim=8, seed=2, task="count")
        out = str(tmp_path / "cnt")
        meta = pack_video(qas, feats, test_ids, None, out, small_cfg(),
                          max_frames=16, shard_size=5, task="count")
        assert meta["task"] == "count" and meta["num_choices"] == 1
        _, meta2, _ = load_video_meta(out)
        assert meta2["task"] == "count"
        by_id = {q["qa_id"]: q["answer_count"] for q in qas}
        ds = VideoDataset(out, "test")
        labels = np.concatenate(  # unshuffled batches follow shard order
            [np.asarray(vi.label)[np.asarray(vi.ex_mask)]
             for vi in ds.get_batches(4)])
        np.testing.assert_array_equal(
            labels, [by_id[str(q)] for q in ds.qids])
        assert next(iter(ds.get_batches(4))).choice_words.shape[1] == 1

    def test_pack_frameqa_vocab_train_only_oov(self, tmp_path):
        """frameqa's answer vocabulary comes from the TRAIN split alone;
        answers outside it (val/test only) pack as label -1."""
        qas, feats, test_ids = make_synthetic_video_raw(
            num_videos=16, num_frames=16, feat_dim=8, seed=3, task="frameqa")
        # force an OOV: every test answer becomes a word absent from train
        for q in qas:
            if q["qa_id"] in test_ids:
                q["answer"] = "zzzunseen"
        out = str(tmp_path / "fq")
        meta = pack_video(qas, feats, test_ids, None, out, small_cfg(),
                          max_frames=16, shard_size=5, task="frameqa")
        vocab = meta["answer_vocab"]
        assert "zzzunseen" not in vocab and len(vocab) >= 2
        train_answers = {str(q["answer"]).strip().lower() for q in qas
                         if q["qa_id"] not in test_ids}
        assert set(vocab) <= train_answers
        ds = VideoDataset(out, "test")
        for vi in ds.get_batches(4):
            assert (np.asarray(vi.label)[np.asarray(vi.ex_mask)] == -1).all()
        ds_tr = VideoDataset(out, "train")
        for vi in ds_tr.get_batches(4):
            lab = np.asarray(vi.label)[np.asarray(vi.ex_mask)]
            assert ((lab >= 0) & (lab < len(vocab))).all()

    def test_streaming_covers_split(self, video_pack_dir):
        ds = VideoDataset(video_pack_dir, "train")
        seen = set()
        total = 0
        for vi in ds.get_batches(4, shuffle=True, seed=1):
            keep = np.asarray(vi.ex_mask)
            total += int(keep.sum())
            seen.update(np.asarray(vi.q_words)[keep].tobytes()
                        for _ in range(1))
        assert total == ds.n
        assert sorted(ds.qids) == sorted(set(ds.qids))  # unique qa ids

    def test_model_trains_on_pack(self, video_pack_dir):
        """A few hundred steps must beat chance solidly on held-out data —
        the pack preserved the learnable event structure."""
        import jax
        import jax.numpy as jnp
        import optax

        from fvta_memexqa_tpu.config import Config, ModelConfig
        from fvta_memexqa_tpu.models.video import VideoFVTAModel, video_loss

        dcfg, meta, shared_np = load_video_meta(video_pack_dir)
        cfg = Config(data=dcfg, model=ModelConfig(
            hidden_dim=16, char_emb_dim=4, char_cnn_filters=8, keep_prob=1.0))
        shared = video_shared_tables(dcfg, shared_np)
        model = VideoFVTAModel(cfg=cfg, num_choices=meta["num_choices"])
        ds = VideoDataset(video_pack_dir, "train")
        first = jax.tree.map(jnp.asarray, next(iter(ds.get_batches(6))))
        params = jax.jit(lambda k: model.init(k, shared, first, train=False))(
            jax.random.key(0))
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s, vi):
            (l, aux), g = jax.value_and_grad(
                lambda pp: video_loss(model, pp, shared, vi, None, False),
                has_aux=True)(p)
            up, s = opt.update(g, s, p)
            return optax.apply_updates(p, up), s, l, aux["acc"]

        done = 0
        for epoch in range(60):
            for vi in ds.get_batches(6, shuffle=True, seed=0, epoch=epoch):
                params, opt_state, loss, acc = step(
                    params, opt_state, jax.tree.map(jnp.asarray, vi))
                done += 1
        assert float(acc) == 1.0, f"failed to fit train split (acc={float(acc)})"

        test_ds = VideoDataset(video_pack_dir, "test")
        correct = total = 0.0
        efwd = jax.jit(lambda p, v: model.apply(p, shared, v, train=False))
        for vi in test_ds.get_batches(6):
            vi = jax.tree.map(jnp.asarray, vi)
            out = efwd(params, vi)
            w = np.asarray(vi.ex_mask)
            correct += ((np.argmax(np.asarray(out.logits), -1)
                         == np.asarray(vi.label)) * w).sum()
            total += w.sum()
        # 2x chance on 10 held-out examples: binomial P(>=4/10 | p=0.2) ~ 0.12,
        # and the fixed seed makes the run deterministic
        assert correct / total >= 0.4, f"held-out acc {correct / total} ~ chance"


def test_video_cli_pack_flow(tmp_path):
    """synth-video → video-prepro → video --data through the real CLI."""
    env = {**os.environ, "FVTA_PLATFORM": "cpu"}
    py = sys.executable
    raw = str(tmp_path / "raw")
    packd = str(tmp_path / "vpack")

    def run(args, timeout=1200):
        r = subprocess.run([py, "-m", "fvta_memexqa_tpu.cli", *args],
                           capture_output=True, text=True, env=env,
                           cwd="/root/repo", timeout=timeout)
        assert r.returncode == 0, f"{args}: {r.stderr[-2000:]}"
        return json.loads(r.stdout.strip().splitlines()[-1])

    run(["synth-video", raw, "--num-videos", "20", "--num-frames", "12",
         "--feat-dim", "16"])
    out = run(["video-prepro", f"{raw}/qas.jsonl", f"{raw}/frame_feats.npz",
               packd, "--test-ids", f"{raw}/test_qa.ids", "--max-frames", "12",
               "--shard-size", "6", "--max-question-len", "8",
               "--max-answer-len", "3", "--max-word-len", "6",
               "--word-emb-dim", "16"])
    assert out["splits"]["train"] > 0 and out["splits"]["test"] == 5
    out = run(["video", "--data", packd, "--steps", "40", "--hidden-dim", "8",
               "--batch-size", "5"])
    assert 0.0 <= out["heldout_acc"] <= 1.0
    assert out["test_count"] == 5
