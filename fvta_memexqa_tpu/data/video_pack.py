"""Video-QA data path: raw TGIF-style files → packed shards → streaming loader.

BASELINE.json config 4 ("TGIF-QA-style video QA: FVTA over frame-feature
sequences") needs a real data path, not just the synthetic generator in
models/video.py. Raw schema (generic multiple-choice video QA; TGIF-QA's
tsv exports map onto it 1:1):

    qas.jsonl        one JSON object per line:
                     {"qa_id", "video_id", "question", "choices": [C strings],
                      "answer_idx": int}
    frame_feats.npz  video_id → f32 [T_i, F] per-frame features (any CNN)
    test_qa.ids      optional: qa_ids of the test split (one per line);
                     val is carved from the remainder (as in MemexQA prepro)

Pack layout (out_dir): meta.json (resolved DataConfig, vocab maps, split
sizes), shared.npz (word_emb_init, vocab_chars), and video_{split} shard
files written via data/stream.write_shards — frame features dominate the
bytes (N × max_frames × F), so video packs are ALWAYS sharded and loaded
through the streaming machinery (VideoDataset) rather than pack-once.

Frames longer than max_frames are uniformly subsampled (TGIF-QA practice);
shorter ones are zero-padded with frame_mask. Words absent from the train
vocab map to UNK (no extended lexicon here — video questions share one small
vocab; revisit if a real corpus shows heavy eval OOV).
"""

from __future__ import annotations

import json
import os

import numpy as np

from fvta_memexqa_tpu.config import DataConfig
from fvta_memexqa_tpu.data.pack import BatchEncoder
from fvta_memexqa_tpu.data.stream import StreamingDataset, write_shards
from fvta_memexqa_tpu.data.tokenize import tokenize, word_to_char_ids
from fvta_memexqa_tpu.data.vocab import Vocab


def parse_video_qas(path: str, task: str = "mc") -> tuple[list[dict], list[str]]:
    """qas.jsonl → (valid rows, error strings), validated per TGIF-QA task:

    - task="mc"      rows carry choices (>=2) + in-range answer_idx
                     (Action/Transition exports).
    - task="count"   rows carry an integer answer_count >= 0.
    - task="frameqa" rows carry a non-empty answer string.
    """
    if task not in ("mc", "count", "frameqa"):
        raise ValueError(f"unknown task {task!r} (expected mc | count | frameqa)")
    rows, errs = [], []
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            try:
                r = json.loads(line)
                if not r.get("video_id"):
                    raise ValueError("missing video_id")
                if not r.get("question"):
                    raise ValueError("missing question")
                if task == "mc":
                    ch = r.get("choices") or []
                    if len(ch) < 2:
                        raise ValueError("need >= 2 choices")
                    ai = int(r.get("answer_idx", -1))
                    if not 0 <= ai < len(ch):
                        raise ValueError(f"answer_idx {ai} out of range")
                elif task == "count":
                    if int(r.get("answer_count", -1)) < 0:
                        raise ValueError("missing/negative answer_count")
                elif not str(r.get("answer", "")).strip():
                    raise ValueError("missing answer")
                r.setdefault("qa_id", f"qa{ln}")
                rows.append(r)
            except (ValueError, KeyError, TypeError, json.JSONDecodeError) as e:
                errs.append(f"line {ln}: {e!r}")
    return rows, errs


def _subsample_frames(feats: np.ndarray, max_frames: int) -> tuple[np.ndarray, np.ndarray]:
    """[T_i, F] → ([max_frames, F], mask [max_frames]); uniform subsample when
    T_i > max_frames, zero-pad + mask when shorter."""
    t_i, f_dim = feats.shape
    out = np.zeros((max_frames, f_dim), np.float32)
    mask = np.zeros(max_frames, bool)
    if t_i >= max_frames:
        idx = np.linspace(0, t_i - 1, max_frames).round().astype(int)
        out[:] = feats[idx]
        mask[:] = True
    else:
        out[:t_i] = feats
        mask[:t_i] = True
    return out, mask


def pack_video(qas: list[dict], frame_feats: dict[str, np.ndarray],
               test_ids: set[str], glove: dict[str, np.ndarray] | None,
               out_dir: str, cfg: DataConfig, num_choices: int = 5,
               max_frames: int = 64, shard_size: int = 256,
               val_fraction: float = 0.1, seed: int = 0,
               task: str = "mc") -> dict:
    """Pack raw video QA into streaming shards. Returns the meta dict.

    task selects the TGIF-QA label treatment (models/video.VideoFVTAModel):
    mc packs choice text + answer_idx labels; count packs the integer
    repetition count as the label (no choice text); frameqa builds the
    answer vocabulary from the TRAIN split's answer strings (meta
    "answer_vocab"), labels val/test answers outside it -1 (always scored
    wrong — TGIF-QA's open-vocab classification treatment)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    feat_dim = int(next(iter(frame_feats.values())).shape[-1])

    # Dropped rows are COUNTED, not silent: a mismatched frame_feats.npz (or a
    # corpus with a different choice count) must not shrink the dataset with
    # split_sizes as the only clue — the counts ship in meta and the CLI prints
    # them alongside split sizes.
    no_feats = sum(1 for q in qas if q["video_id"] not in frame_feats)
    bad_choices = 0
    if task == "mc":
        bad_choices = sum(1 for q in qas if q["video_id"] in frame_feats
                          and len(q["choices"]) != num_choices)
        qas = [q for q in qas if q["video_id"] in frame_feats
               and len(q["choices"]) == num_choices]
    else:
        num_choices = 1  # choice arrays unused by the model; minimal shapes
        qas = [q for q in qas if q["video_id"] in frame_feats]
    test = [q for q in qas if q["qa_id"] in test_ids]
    rest = [q for q in qas if q["qa_id"] not in test_ids]
    order = rng.permutation(len(rest))
    n_val = int(len(rest) * val_fraction)
    splits = {
        "train": [rest[i] for i in order[n_val:]],
        "val": [rest[i] for i in order[:n_val]],
        "test": test,
    }

    answer_vocab: dict[str, int] = {}
    if task == "frameqa":
        for q in splits["train"]:
            answer_vocab.setdefault(str(q["answer"]).strip().lower(), len(answer_vocab))

    def _labels(rows) -> np.ndarray:
        if task == "count":
            return np.asarray([int(q["answer_count"]) for q in rows], np.int32)
        if task == "frameqa":
            return np.asarray(
                [answer_vocab.get(str(q["answer"]).strip().lower(), -1)
                 for q in rows], np.int32)
        return np.asarray([q["answer_idx"] for q in rows], np.int32)

    train_tokens = [t for q in splits["train"]
                    for t in tokenize(q["question"])
                    + [t for c in q.get("choices", []) for t in tokenize(c)]]
    vocab = Vocab.build(train_tokens, glove, cfg.word_emb_dim, seed=seed)
    cfg = DataConfig(**{
        **cfg.__dict__,
        "word_vocab_size": vocab.size,
        "char_vocab_size": vocab.char_size,
        "num_glove_words": vocab.num_glove,
        "extended_vocab_size": vocab.size,
        "image_feat_dim": feat_dim,
    })
    vocab_chars = np.zeros((vocab.size, cfg.max_word_len), np.int32)
    for w, wid in vocab.word2idx.items():
        vocab_chars[wid] = word_to_char_ids(w, vocab.char2idx, cfg.max_word_len)
    np.savez_compressed(os.path.join(out_dir, "shared.npz"),
                        word_emb_init=vocab.emb_init, vocab_chars=vocab_chars)

    enc = BatchEncoder(vocab)
    split_sizes = {}
    for name, rows in splits.items():
        n = len(rows)
        split_sizes[name] = n
        qw, qc, qm = enc.encode([q["question"] for q in rows],
                                cfg.max_question_len, cfg.max_word_len)
        cw, cc, cm = enc.encode(
            [c for q in rows for c in (q["choices"] if task == "mc" else [""])],
            cfg.max_answer_len, cfg.max_word_len)
        ff = np.zeros((n, max_frames, feat_dim), np.float32)
        fm = np.zeros((n, max_frames), bool)
        for i, q in enumerate(rows):
            ff[i], fm[i] = _subsample_frames(
                np.asarray(frame_feats[q["video_id"]], np.float32), max_frames)
        arrays = {
            "frame_feats": ff, "frame_mask": fm,
            "q_words": qw, "q_chars": qc, "q_mask": qm,
            "choice_words": cw.reshape(n, num_choices, cfg.max_answer_len),
            "choice_chars": cc.reshape(n, num_choices, cfg.max_answer_len,
                                       cfg.max_word_len),
            "choice_mask": cm.reshape(n, num_choices, cfg.max_answer_len),
            "label": _labels(rows),
            "qid": np.asarray([q["qa_id"] for q in rows], dtype="U64"),
        }
        write_shards(out_dir, f"video_{name}", arrays, shard_size)

    meta = {
        "data_config": cfg.__dict__,
        "task": task,
        "num_choices": num_choices,
        "answer_vocab": sorted(answer_vocab, key=answer_vocab.get),
        "max_frames": max_frames,
        "word2idx": vocab.word2idx,
        "char2idx": vocab.char2idx,
        "split_sizes": split_sizes,
        "dropped": {"missing_video_feats": no_feats,
                    "wrong_choice_count": bad_choices},
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def load_video_meta(out_dir: str) -> tuple[DataConfig, dict, dict[str, np.ndarray]]:
    """→ (resolved DataConfig, meta dict, shared arrays {word_emb_init, vocab_chars})."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    cfg = DataConfig(**meta["data_config"])
    with np.load(os.path.join(out_dir, "shared.npz")) as z:
        shared = {k: z[k] for k in z.files}
    return cfg, meta, shared


def video_shared_tables(cfg: DataConfig, shared: dict[str, np.ndarray]):
    """SharedTables for the video model (photo-album fields are unused dummies)."""
    import jax.numpy as jnp

    from fvta_memexqa_tpu.data.device_prepro import SharedTables

    return SharedTables(
        word_emb=jnp.asarray(shared["word_emb_init"]),
        vocab_chars=jnp.asarray(shared["vocab_chars"]),
        photo_feats=jnp.zeros((1, cfg.image_feat_dim)),
        album_photo_idx=jnp.zeros((1, 1), jnp.int32),
        album_photo_mask=jnp.zeros((1, 1), bool),
        photo_title_words=jnp.zeros((1, 1, 1), jnp.int32),
        photo_title_chars=jnp.zeros((1, 1, 1, 1), jnp.int32),
        photo_title_mask=jnp.zeros((1, 1, 1), bool),
        album_text_words=jnp.zeros((1, 4, 1), jnp.int32),
        album_text_chars=jnp.zeros((1, 4, 1, 1), jnp.int32),
        album_text_mask=jnp.zeros((1, 4, 1), bool),
    )


class VideoDataset(StreamingDataset):
    """Streaming loader over video_{split} shards, yielding VideoInputs.

    Video packs are shard-only by design: frame features are the dominant
    bytes and must not require the whole split in host memory."""

    FILE_PREFIX = "video"
    KEYS = ("frame_feats", "frame_mask", "q_words", "q_chars", "q_mask",
            "choice_words", "choice_chars", "choice_mask", "label")

    def _make_batch(self, ex_mask, fields):
        from fvta_memexqa_tpu.models.video import VideoInputs

        return VideoInputs(ex_mask=ex_mask, **fields)


# ---------------------------------------------------------------------------
# Synthetic raw corpus (same learnable "event" world as make_synthetic_video,
# but emitted in the RAW schema so the full pack → stream → train path is
# exercised end-to-end without real TGIF assets).
# ---------------------------------------------------------------------------

EVENTS = ["jump", "spin", "wave", "fall", "clap", "run", "nod", "point"]


def make_synthetic_video_raw(num_videos: int = 48, num_frames: int = 32,
                             feat_dim: int = 64, num_choices: int = 5,
                             test_fraction: float = 0.25, seed: int = 0,
                             task: str = "mc"):
    """→ (qas list[dict], frame_feats {video_id: [T, F]}, test_ids set), in the
    per-task raw schema (parse_video_qas): mc choices+answer_idx, count
    answer_count with a planted-k + independent-distractor world (total event
    mass is uninformative), frameqa answer strings over the EVENTS vocabulary.
    Event directions come from a FIXED generator so different seeds share one
    visual world (same reasoning as models/video.make_synthetic_video)."""
    rng = np.random.default_rng(seed)
    dir_rng = np.random.default_rng(20260816)
    dirs = {e: dir_rng.normal(0, 1, feat_dim).astype(np.float32) for e in EVENTS}
    qas, feats = [], {}
    span_w = 2
    for i in range(num_videos):
        vid = f"video{i}"
        if task == "count":
            t_i = num_frames  # fixed length: count is a magnitude readout
        else:
            t_i = int(rng.integers(num_frames // 2, num_frames * 2))
        x = 0.1 * rng.normal(0, 1, (t_i, feat_dim)).astype(np.float32)
        ev_idx = int(rng.integers(len(EVENTS)))
        ev = EVENTS[ev_idx]
        row = {"qa_id": f"qa{i}", "video_id": vid}
        if task == "count":
            # clamp to TGIF-QA's repetition-count answer range (models/video
            # COUNT_MIN..COUNT_MAX — eval rounds+clips predictions into it)
            count_max = min(10, max(t_i // (2 * span_w) - 1, 2))
            k = int(rng.integers(1, count_max + 1))
            k2 = int(rng.integers(1, count_max + 1))
            # DISJOINT slots for the asked vs distractor event (same rule as
            # models/video.make_synthetic_video): an overlapping frame would
            # carry a normalized MIXTURE of both directions — ambiguous for
            # any per-frame detector
            slots = rng.permutation(t_i // span_w)
            other = EVENTS[(ev_idx + 1 + int(rng.integers(len(EVENTS) - 1)))
                           % len(EVENTS)]
            for sl in slots[:k]:
                x[sl * span_w: (sl + 1) * span_w] += dirs[ev]
            for sl in slots[k: k + k2]:
                x[sl * span_w: (sl + 1) * span_w] += dirs[other]
            row |= {"question": f"how many times did the person {ev} ?",
                    "answer_count": k}
        else:
            start = int(rng.integers(0, max(t_i // 2, 1)))
            span = int(rng.integers(2, max(t_i // 2, 3)))
            x[start: start + span] += dirs[ev]
            if task == "frameqa":
                row |= {"question": "what did the person do ?", "answer": ev}
            else:
                others = [e for e in EVENTS if e != ev]
                pick = rng.choice(len(others), num_choices - 1, replace=False)
                choices = [ev] + [others[int(p)] for p in pick]
                order = rng.permutation(num_choices)
                row |= {"question": "what did the person do ?",
                        "choices": [choices[int(o)] for o in order],
                        "answer_idx": int(np.argwhere(order == 0)[0, 0])}
        x /= np.linalg.norm(x, axis=-1, keepdims=True) + 1e-6
        feats[vid] = x
        qas.append(row)
    n_test = int(num_videos * test_fraction)
    test_ids = {f"qa{i}" for i in range(num_videos - n_test, num_videos)}
    return qas, feats, test_ids


def write_raw_video_files(outdir: str, qas: list[dict],
                          frame_feats: dict[str, np.ndarray],
                          test_ids: set[str]) -> None:
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "qas.jsonl"), "w") as f:
        for q in qas:
            f.write(json.dumps(q) + "\n")
    np.savez_compressed(os.path.join(outdir, "frame_feats.npz"), **frame_feats)
    with open(os.path.join(outdir, "test_qa.ids"), "w") as f:
        for qid in sorted(test_ids):
            f.write(qid + "\n")
