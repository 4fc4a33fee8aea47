"""Deterministic tokenizer + char-id encoding.

The reference tokenizes with a lowercase word tokenizer in `prepro.py` (SURVEY.md
section 2 "Preprocessing"; exact tokenizer unverifiable — mount empty). This module
defines the rebuild's canonical tokenizer spec, kept bit-stable because vocab ids,
char ids, and therefore trained checkpoints all depend on it:

- lowercase the input
- a token is either a maximal run of [a-z0-9] (with internal apostrophes kept, so
  "don't" is one token) or a single non-space, non-alphanumeric character
- chars are encoded per token, truncated/padded to `max_word_len`

A C++ fast path for the packer hot loop lives in `native/tokenizer.cc` (loaded via
ctypes when built); `tokenize()` below is the semantic definition and the fallback,
and a parity test pins the two together.
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"[a-z0-9]+(?:'[a-z0-9]+)*|[^a-z0-9\s]")

PAD_ID = 0
UNK_ID = 1
NUM_SPECIAL = 2  # PAD, UNK — shared by the word and char vocabularies


def tokenize(text: str) -> list[str]:
    """Lowercase word tokenization. The canonical spec — see module docstring."""
    return _WORD_RE.findall(text.lower())


def word_to_char_ids(word: str, char2idx: dict[str, int], max_word_len: int) -> list[int]:
    """Char ids for one token, padded/truncated to max_word_len."""
    ids = [char2idx.get(c, UNK_ID) for c in word[:max_word_len]]
    return ids + [PAD_ID] * (max_word_len - len(ids))


def try_load_native() -> "object | None":
    """Load the C++ tokenizer extension if built; None otherwise."""
    try:
        from fvta_memexqa_tpu.data import _native_tokenizer

        return _native_tokenizer
    except Exception:
        return None
