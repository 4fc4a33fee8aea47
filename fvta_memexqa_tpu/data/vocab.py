"""Word/char vocabularies and the GloVe-initialized embedding layout.

Reference behavior being matched (SURVEY.md section 2 "Preprocessing" /
"Word+char embedding"): the word vocab is built from TRAIN tokens, intersected with
GloVe; in-GloVe words get fixed GloVe rows, out-of-GloVe words get trainable rows.

Embedding id layout (parity-critical, recorded in pack metadata):
    0                     PAD   (fixed zero row)
    1                     UNK   (trainable)
    2 .. 2+G              GloVe words, frozen rows
    2+G .. 2+G+O          OOV train-vocab words, trainable rows
so `id >= NUM_SPECIAL + num_glove` <=> trainable (plus UNK at id 1).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from typing import Iterable

import numpy as np

from fvta_memexqa_tpu.data.tokenize import NUM_SPECIAL, PAD_ID, UNK_ID


def load_glove(path: str, dim: int) -> dict[str, np.ndarray]:
    """Parse a GloVe text file (`word v1 v2 ... vD` per line) → {word: float32[D]}."""
    table: dict[str, np.ndarray] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) != dim + 1:
                continue
            vec = np.asarray(parts[1:], dtype=np.float32)
            table[parts[0]] = vec
    return table


@dataclass
class Vocab:
    word2idx: dict[str, int]
    char2idx: dict[str, int]
    num_glove: int                 # count of frozen GloVe rows
    emb_init: np.ndarray           # float32 [vocab_size, dim]; rows per layout above

    @property
    def size(self) -> int:
        return len(self.word2idx) + NUM_SPECIAL

    @property
    def char_size(self) -> int:
        return len(self.char2idx) + NUM_SPECIAL

    def word_id(self, w: str) -> int:
        return self.word2idx.get(w, UNK_ID)

    @classmethod
    def build(
        cls,
        train_tokens: Iterable[str],
        glove: dict[str, np.ndarray] | None,
        dim: int,
        seed: int = 0,
        min_count: int = 1,
    ) -> "Vocab":
        counts = Counter(train_tokens)
        words = [w for w, c in counts.items() if c >= min_count]
        in_glove = sorted(w for w in words if glove and w in glove)
        oov = sorted(w for w in words if not (glove and w in glove))

        word2idx: dict[str, int] = {}
        for w in in_glove + oov:
            word2idx[w] = NUM_SPECIAL + len(word2idx)

        chars = sorted({c for w in words for c in w})
        char2idx = {c: NUM_SPECIAL + i for i, c in enumerate(chars)}

        rng = np.random.default_rng(seed)
        emb = np.zeros((NUM_SPECIAL + len(word2idx), dim), dtype=np.float32)
        emb[UNK_ID] = rng.normal(0, 0.1, size=dim).astype(np.float32)
        for w in in_glove:
            emb[word2idx[w]] = glove[w]  # type: ignore[index]
        for w in oov:
            emb[word2idx[w]] = rng.normal(0, 0.1, size=dim).astype(np.float32)
        emb[PAD_ID] = 0.0

        return cls(word2idx=word2idx, char2idx=char2idx, num_glove=len(in_glove), emb_init=emb)
