"""Frozen, JSON-serializable configuration for the whole framework.

The reference threads a mutable argparse namespace through every module and mutates
max-length fields *after* seeing data (SURVEY.md section 2 "CLI / flag system",
section 5 "Config": a footgun this rebuild deliberately avoids). Here every shape is
fixed at pack time, recorded in the pack's metadata, and the resolved `Config` is
immutable and serialized next to every checkpoint for exact reproducibility.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any

# Context modalities, in canonical order. Each album contributes one time-ordered
# sequence per modality (reference: per-modality bi-LSTM encoders over album
# sequences of photos/titles/descriptions/time/GPS — SURVEY.md section 2
# "Per-modality bi-LSTM encoders").
#   photo       : pre-extracted CNN feature per photo, time-ordered   (T axis = photos)
#   photo_title : per-photo title summary vector, time-ordered        (T axis = photos)
#   album_title : word sequence of the album title                    (T axis = words)
#   album_desc  : word sequence of the album description              (T axis = words)
#   when        : word sequence of the album timestamp text           (T axis = words)
#   where       : word sequence of the album location/GPS text        (T axis = words)
MODALITIES: tuple[str, ...] = (
    "photo",
    "photo_title",
    "album_title",
    "album_desc",
    "when",
    "where",
)
NUM_MODALITIES: int = len(MODALITIES)

NUM_CHOICES: int = 4  # MemexQA is 4-way multiple choice (SURVEY.md "What the reference is")


@dataclass(frozen=True)
class DataConfig:
    """Static shapes. Chosen at pack time from dataset stats, never mutated at runtime."""

    max_albums: int = 4          # albums per question (extra albums dropped, fewer padded)
    max_photos: int = 12         # photos per album
    max_question_len: int = 30   # words
    max_answer_len: int = 8      # words per candidate answer
    max_sent_len: int = 10       # words per photo title (word-level encode of one title)
    max_album_text_len: int = 24 # words for album_title/album_desc/when/where sequences
    max_word_len: int = 16       # chars per word (char-CNN input)
    image_feat_dim: int = 2537   # Inception-ResNet-v2 pool+logits, L2-normalized
    word_emb_dim: int = 100      # GloVe 6B.100d
    # Vocab sizes are resolved by the packer and stored in pack metadata.
    word_vocab_size: int = 0
    char_vocab_size: int = 0
    num_glove_words: int = 0     # rows [2, num_glove_words+2) are frozen GloVe rows
    # Rows [word_vocab_size, extended_vocab_size) of vocab_chars are the packer's
    # extended lexicon: eval-time OOV words, embedded as UNK word + REAL chars so
    # the char-CNN keeps its OOV signal on val/test (0 = no extension).
    extended_vocab_size: int = 0

    @property
    def num_context_seqs(self) -> int:
        """S axis of the context tensor: one sequence per (album, modality)."""
        return self.max_albums * NUM_MODALITIES

    @property
    def max_context_time(self) -> int:
        """T axis of the context tensor: max over per-modality time lengths."""
        return max(self.max_photos, self.max_album_text_len)


@dataclass(frozen=True)
class ModelConfig:
    hidden_dim: int = 100        # LSTM hidden size per direction (encoder output dim = 2H)
    char_emb_dim: int = 20
    char_cnn_filters: int = 100
    char_cnn_width: int = 5
    keep_prob: float = 0.9       # dropout keep probability (reference-style input dropout)
    attention: str = "fvta"      # fvta | flat | none  (ablation registry, SURVEY.md B-config 3)
    similarity: str = "trilinear"  # trilinear | dot | bilinear  (correlation kernel)
    use_pallas: bool = False     # fused Pallas LSTM scans (ops/lstm_fused.py)
    pallas_attention: bool = False  # fused FVTA attention kernel (loses to XLA at
                                 # MemexQA shapes — BASELINE.md; engine for long-T)
    vocab_embed: bool = True     # compute word+char+highway embedding once per VOCAB
                                 # word and gather per token (identical math, ~5x less
                                 # embed compute); False = per-token (parity testing)
    dtype: str = "float32"       # compute dtype for encoders/attention ("bfloat16" on TPU)
    forget_bias: float = 1.0     # TF1 BasicLSTMCell forget-gate bias (parity-critical)

    def __post_init__(self):
        # the dtype dispatch compares against the exact string "bfloat16";
        # any other spelling ("bf16", "half") would SILENTLY select fp32 —
        # the user would benchmark fp32 believing they measured bf16
        if self.dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown dtype {self.dtype!r}: use 'float32' "
                             "or 'bfloat16'")
        if self.attention not in ("fvta", "flat", "none"):
            raise ValueError(f"unknown attention {self.attention!r}")
        if self.similarity not in ("trilinear", "dot", "bilinear"):
            raise ValueError(f"unknown similarity {self.similarity!r}")


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64
    eval_batch_size: int = 128  # cached-album eval peaks at 128 on v5e (BASELINE.md);
    #                             256 regresses (cache-gather bandwidth)
    learning_rate: float = 1e-3
    optimizer: str = "adam"      # adam | adadelta (reference offered both; adam default)
    grad_clip_norm: float = 5.0
    # LR schedule over optimizer steps (constant | cosine | linear). The
    # schedule's step counter lives in the optimizer state, so checkpoint
    # resume continues it exactly. warmup_steps ramp linearly 0 → lr first;
    # cosine/linear then decay to 0 over decay_steps (required > 0 for them).
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    decay_steps: int = 0
    # Gradient accumulation: average grads over this many microbatches per
    # optimizer update (optax.MultiSteps) — the TPU-native route to effective
    # batches past one device's memory without touching the train loop; the
    # accumulator lives in the optimizer state (exact resume holds).
    grad_accum: int = 1
    num_epochs: int = 20
    val_period: int = 200        # steps between val evals
    save_period: int = 500       # steps between periodic checkpoints
    seed: int = 0
    keep_checkpoints: int = 3
    log_period: int = 20         # steps between metric lines
    # Train-time album dedup (the train-side twin of eval_cache.py): batches
    # re-encode each distinct album once and gather per-question context from
    # the unique rows. Gradients scatter-add back through the gather, so the
    # update is exact at keep_prob=1.0 (parity-tested); with dropout on,
    # duplicate slots share one noise draw instead of independent draws —
    # the overfit gate in tests/test_dedup_train.py covers that variant.
    dedup_albums: bool = False
    # Static size of the unique-album buffer as a fraction of the N*A slots;
    # a batch with more distinct albums falls back to the plain step (both
    # variants compile once). MemexQA batches measure ~18-32% duplicate slots.
    dedup_cap: float = 0.875


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh. DP over batch; CP over context time for long-sequence configs.

    The reference is single-process single-device (SURVEY.md section 2 "Parallelism":
    ABSENT). Here the mesh IS the communication backend: pjit/shard_map emit XLA
    collectives (psum / all_gather / ppermute) over ICI; no user-level comm code.
    """

    data_parallel: int = 1       # mesh axis "data"
    context_parallel: int = 1    # mesh axis "ctx" (time-axis sharding of the context)

    @property
    def num_devices(self) -> int:
        return self.data_parallel * self.context_parallel


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # ---- JSON round-trip ----------------------------------------------------

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        return cls(
            data=DataConfig(**d.get("data", {})),
            model=ModelConfig(**d.get("model", {})),
            train=TrainConfig(**d.get("train", {})),
            mesh=MeshConfig(**d.get("mesh", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def replace(self, **sections: Any) -> "Config":
        return dataclasses.replace(self, **sections)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        f.write(cfg.to_json())


def load_config(path: str) -> Config:
    with open(path) as f:
        return Config.from_json(f.read())
