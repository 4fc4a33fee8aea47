"""fvta_memexqa_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of JunweiLiang/FVTA_MemexQA.

Focal Visual-Text Attention (FVTA, CVPR'18 / TPAMI'19) for MemexQA: multiple-choice
question answering over a user's personal photo albums. This package is a from-scratch
TPU-first rebuild, NOT a port:

- the GloVe + char-CNN text embedder and photo-feature loader run as a fused
  device-side preprocessing stage feeding HBM-resident batches (`data/`, `models/embed.py`)
- the per-modality bidirectional LSTM encoders are a Pallas fused recurrent scan
  (`ops/lstm_pallas.py`) with a TF1-numerics `lax.scan` reference (`ops/lstm_ref.py`)
- the FVTA core — the question x context correlation tensor and the hierarchical focal
  softmax over (time, modality) — is a single fused Pallas attention kernel
  (`ops/fvta_pallas.py`) with an einsum reference (`ops/fvta_ref.py`)
- the 4-way multiple-choice scorer is one batched matmul over all candidates
- parallelism is mesh-native: DP over the batch axis and CP over the context-time axis
  via `shard_map` + XLA collectives (`parallel/`)

Reference provenance: the upstream mount at /root/reference was empty at build time;
SURVEY.md (repo root) records the reconstruction of the reference's structure, and all
"reference parity" claims are against that documented contract (SURVEY.md section 2).
"""

__version__ = "0.1.0"

from fvta_memexqa_tpu.config import (  # noqa: F401
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
