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


def tokenize_many(texts: list[str]) -> list[list[str]]:
    """Batch tokenization; routes ASCII documents through the native C++ scanner
    (one FFI call for the whole batch) and everything else through the regex spec.
    Results are bit-identical to [tokenize(t) for t in texts]."""
    native = try_load_native()
    if native is None:
        return [tokenize(t) for t in texts]
    ascii_idx = [i for i, t in enumerate(texts) if t.isascii()]
    out: list[list[str]] = [None] * len(texts)  # type: ignore[list-item]
    if ascii_idx:
        for i, toks in zip(ascii_idx, native.tokenize_batch([texts[i] for i in ascii_idx])):
            out[i] = toks
    for i, t in enumerate(texts):
        if out[i] is None:
            out[i] = tokenize(t)
    return out


def word_to_char_ids(word: str, char2idx: dict[str, int], max_word_len: int) -> list[int]:
    """Char ids for one token, padded/truncated to max_word_len."""
    ids = [char2idx.get(c, UNK_ID) for c in word[:max_word_len]]
    return ids + [PAD_ID] * (max_word_len - len(ids))


_NATIVE_CACHE: list = []  # [module_or_None], memoized


def try_load_native() -> "object | None":
    """Load (building if needed) the C++ tokenizer extension; None if unavailable
    or disabled via FVTA_NO_NATIVE=1 (used by parity tests)."""
    import os

    if os.environ.get("FVTA_NO_NATIVE"):
        return None
    if not _NATIVE_CACHE:
        try:
            from fvta_memexqa_tpu.data import _native_tokenizer

            _NATIVE_CACHE.append(_native_tokenizer)
        except Exception:
            _NATIVE_CACHE.append(None)
    return _NATIVE_CACHE[0]
