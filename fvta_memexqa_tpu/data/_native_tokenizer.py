"""ctypes binding for the native batch tokenizer (native/tokenizer.cc).

Auto-builds the shared library on first import if a compiler is available; callers
must treat import failure as "use the Python path" (data/tokenize.try_load_native).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_libfvta_tokenizer.so")
_SRC_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "tokenizer.cc")


def _ensure_built() -> str:
    src = os.path.abspath(_SRC_PATH)
    stale = (not os.path.exists(_LIB_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
    if stale:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True, capture_output=True,
        )
    return _LIB_PATH


_lib = ctypes.CDLL(_ensure_built())
_lib.fvta_tokenize_batch.restype = ctypes.c_int64
_lib.fvta_tokenize_batch.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_int64),
    ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32),
    ctypes.c_int64,
]


def tokenize_batch(texts: list[str]) -> list[list[str]]:
    """Tokenize many ASCII documents in one native call.

    Caller guarantees every text is ASCII (`str.isascii()`); text is lowercased
    here so semantics match data/tokenize.tokenize exactly.
    """
    lowered = [t.lower() for t in texts]
    blobs = [t.encode("ascii") for t in lowered]
    offsets = np.zeros(len(blobs) + 1, dtype=np.int64)
    for i, b in enumerate(blobs):
        offsets[i + 1] = offsets[i] + len(b)
    buf = b"".join(blobs)
    max_tokens = max(len(buf), 1)
    starts = np.zeros(max_tokens, dtype=np.int64)
    lens = np.zeros(max_tokens, dtype=np.int32)
    counts = np.zeros(len(blobs), dtype=np.int32)
    n = _lib.fvta_tokenize_batch(
        buf,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(blobs),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_tokens,
    )
    out: list[list[str]] = []
    pos = 0
    text = buf.decode("ascii")
    starts_l = starts[:n].tolist()
    lens_l = lens[:n].tolist()
    for c in counts.tolist():
        out.append(
            [text[starts_l[k] : starts_l[k] + lens_l[k]] for k in range(pos, pos + c)]
        )
        pos += c
    assert pos == n
    return out


def tokenize(text: str) -> list[str]:
    return tokenize_batch([text])[0]


_lib.fvta_vocab_create.restype = ctypes.c_void_p
_lib.fvta_vocab_create.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
]
_lib.fvta_vocab_destroy.argtypes = [ctypes.c_void_p]
_lib.fvta_encode_batch.restype = None
_lib.fvta_encode_batch.argtypes = [
    ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
    ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_uint8),
]


class NativeEncoder:
    """Tokenize + vocab/char-id encode entire text batches in one native call.

    Bit-identical to the Python path (pack._encode_text over data/tokenize.tokenize)
    for ASCII input; the caller routes non-ASCII docs to the Python fallback.
    """

    def __init__(self, word2idx: dict[str, int], char2idx: dict[str, int],
                 unk_id: int = 1):
        words = [w for w in word2idx if w.isascii()]
        blob = "".join(words).encode("ascii")
        offsets = np.zeros(len(words) + 1, dtype=np.int64)
        ids = np.zeros(len(words), dtype=np.int32)
        pos = 0
        for i, w in enumerate(words):
            pos += len(w)
            offsets[i + 1] = pos
            ids[i] = word2idx[w]
        self._handle = _lib.fvta_vocab_create(
            blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(words),
        )
        self._char_table = np.full(256, unk_id, dtype=np.int32)
        for ch, cid in char2idx.items():
            if len(ch) == 1 and ch.isascii():
                self._char_table[ord(ch)] = cid
        self._unk = unk_id

    def __del__(self):
        h = getattr(self, "_handle", None)
        lib = globals().get("_lib")   # may already be torn down at interpreter exit
        if h and lib is not None:
            lib.fvta_vocab_destroy(h)
            self._handle = None

    def encode_batch(self, texts: list[str], max_len: int, max_word_len: int):
        """→ (word_ids i32 [N, L], char_ids i32 [N, L, W], mask bool [N, L])."""
        lowered = [t.lower().encode("ascii") for t in texts]
        offsets = np.zeros(len(lowered) + 1, dtype=np.int64)
        pos = 0
        for i, b in enumerate(lowered):
            pos += len(b)
            offsets[i + 1] = pos
        buf = b"".join(lowered)
        n = len(lowered)
        words = np.zeros((n, max_len), dtype=np.int32)
        chars = np.zeros((n, max_len, max_word_len), dtype=np.int32)
        mask = np.zeros((n, max_len), dtype=np.uint8)
        _lib.fvta_encode_batch(
            self._handle, buf,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, max_len, max_word_len,
            self._char_table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._unk,
            words.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            chars.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return words, chars, mask.astype(bool)
