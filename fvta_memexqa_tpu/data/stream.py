"""Streaming input: memory-bounded sharded split loading + background prefetch.

MemexQA v1.1 fits in RAM after packing, so the default loader (pipeline.Dataset)
slices one in-memory array pack. Datasets that outgrow pack-once — TGIF-scale
video frames, or MemexQA-style corpora orders of magnitude larger (SURVEY.md §2
"Data runtime" row: the reference's utils.py loads the whole pickle, a ceiling
this rebuild must not inherit) — need a loader whose host footprint is bounded
by a shard window, not the split size. This module adds:

- write_split_shards(): re-shard a packed split file into fixed-row-count
  shard files (same npz field layout, plus a JSON index);
- StreamingDataset: pipeline.Dataset-compatible (num_batches/get_batches/qids)
  loader holding at most `cache_shards` shards in memory, with deterministic
  WINDOWED shuffle — shard order and intra-shard order are both shuffled from
  (seed, epoch), so the stream is reproducible for exact resume, but examples
  never cross shards (global-uniform shuffle would require the whole split in
  memory, the thing being avoided);
- Prefetcher: background-thread pipeline stage that overlaps next-batch host
  prep + host→device transfer with the device's current step.

Batches are bit-identical in layout to pipeline.Dataset's (same Batch struct,
same pad-by-repeat + ex_mask semantics for the final partial batch), so every
downstream consumer (train loop, evaluate, eval_cache) takes either loader.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Iterator

import numpy as np

from fvta_memexqa_tpu.data.pipeline import _BATCH_KEYS, Batch


def _index_path(pack_dir: str, base: str) -> str:
    return os.path.join(pack_dir, f"{base}.shards.json")


def _shard_path(pack_dir: str, base: str, i: int) -> str:
    return os.path.join(pack_dir, f"{base}.shard-{i:05d}.npz")


def write_shards(pack_dir: str, base: str, arrays: dict[str, np.ndarray],
                 shard_size: int) -> int:
    """Write `arrays` (equal leading dim) as {base}.shard-NNNNN.npz files of
    `shard_size` rows each (last shard ragged) + a JSON index. Returns the
    number of shards. Idempotent: overwrites any existing index/shards."""
    if shard_size <= 0:
        raise ValueError(f"shard_size must be positive, got {shard_size}")
    n = int(arrays["label"].shape[0])
    sizes = []
    for i, start in enumerate(range(0, max(n, 1), shard_size)):
        rows = {k: v[start: start + shard_size] for k, v in arrays.items()}
        np.savez_compressed(_shard_path(pack_dir, base, i), **rows)
        sizes.append(int(rows["label"].shape[0]))
    with open(_index_path(pack_dir, base), "w") as f:
        json.dump({"shard_size": shard_size, "sizes": sizes, "total": n}, f)
    return len(sizes)


def _source_fingerprint(path: str) -> list:
    st = os.stat(path)
    return [int(st.st_size), int(st.st_mtime_ns)]


def write_split_shards(pack_dir: str, split: str, shard_size: int) -> int:
    """Re-shard an in-memory-pack split file (data_{split}.npz) for streaming.

    The conversion itself needs one split array at a time in memory (npz offers
    no row slicing); packs too large even for that should be produced sharded
    at pack time (the video packer already is)."""
    src = os.path.join(pack_dir, f"data_{split}.npz")
    arrays = {}
    with np.load(src) as z:
        for k in z.files:
            arrays[k] = z[k]
    n = write_shards(pack_dir, f"data_{split}", arrays, shard_size)
    idx = _index_path(pack_dir, f"data_{split}")
    with open(idx) as f:
        index = json.load(f)
    index["source"] = _source_fingerprint(src)  # guards against stale reuse
    with open(idx, "w") as f:
        json.dump(index, f)
    return n


def ensure_split_shards(pack_dir: str, split: str, shard_size: int) -> int:
    """write_split_shards, skipped only when the index matches BOTH the
    requested shard_size and the current split file (size + mtime fingerprint)
    — a resume skips the re-shard, but a re-run of prepro into the same pack
    dir invalidates the shards instead of silently training on old data."""
    idx = _index_path(pack_dir, f"data_{split}")
    src = os.path.join(pack_dir, f"data_{split}.npz")
    if os.path.exists(idx):
        with open(idx) as f:
            existing = json.load(f)
        if (existing.get("shard_size") == shard_size
                and existing.get("source") == _source_fingerprint(src)):
            return len(existing["sizes"])
    return write_split_shards(pack_dir, split, shard_size)


class StreamingDataset:
    """pipeline.Dataset-compatible loader over sharded split files.

    Holds at most `cache_shards` decompressed shards in memory (LRU). Shuffle
    is windowed (see module docstring) and deterministic given (seed, epoch) —
    the exact-resume contract (train.train skips `step mod batches/epoch`
    already-consumed batches) holds for streaming runs too.

    Subclass hooks (used by the video path, data/video_pack.VideoDataset):
    FILE_PREFIX names the shard files ({prefix}_{split}.shard-NNNNN.npz), KEYS
    lists the array fields, and _make_batch builds the emitted struct."""

    FILE_PREFIX = "data"
    KEYS: tuple[str, ...] = _BATCH_KEYS

    def _make_batch(self, ex_mask: np.ndarray, fields: dict) -> Batch:
        return Batch(ex_mask=ex_mask, **fields)

    def __init__(self, pack_dir: str, split: str, cache_shards: int = 2):
        base = f"{self.FILE_PREFIX}_{split}"
        with open(_index_path(pack_dir, base)) as f:
            self.index = json.load(f)
        self.pack_dir = pack_dir
        self.split = split
        self._base = base
        self.n = int(self.index["total"])
        self.cache_shards = max(1, cache_shards)
        self._cache: dict[int, dict[str, np.ndarray]] = {}

    def _shard(self, i: int) -> dict[str, np.ndarray]:
        if i in self._cache:
            self._cache[i] = self._cache.pop(i)        # LRU touch
        else:
            if len(self._cache) >= self.cache_shards:
                self._cache.pop(next(iter(self._cache)))  # evict least-recent
            with np.load(_shard_path(self.pack_dir, self._base, i)) as z:
                self._cache[i] = {k: z[k] for k in z.files}
        return self._cache[i]

    @property
    def qids(self) -> np.ndarray:
        # read the (tiny) qid arrays directly, bypassing the shard cache so a
        # mid-iteration qids access doesn't flush the hot working set
        out = []
        for i in range(len(self.index["sizes"])):
            with np.load(_shard_path(self.pack_dir, self._base, i)) as z:
                out.append(z["qid"])
        return np.concatenate(out)

    def num_batches(self, batch_size: int, drop_remainder: bool = False) -> int:
        if drop_remainder:
            return self.n // batch_size
        return -(-self.n // batch_size)

    def get_batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        epoch: int = 0,
        drop_remainder: bool = False,
    ) -> Iterator[Batch]:
        """Yield numpy Batch structs; deterministic given (seed, epoch)."""
        num_shards = len(self.index["sizes"])
        shard_order = np.arange(num_shards)
        if shuffle:
            np.random.default_rng((seed, epoch)).shuffle(shard_order)

        pend: dict[str, list[np.ndarray]] = {k: [] for k in self.KEYS}
        pend_n = 0

        def emit(rows: dict[str, np.ndarray]):
            nonlocal pend_n
            for k in pend:
                pend[k].append(rows[k])
            pend_n += len(rows["label"])

        def pop_batch() -> Batch:
            nonlocal pend_n
            cat = {k: np.concatenate(v) if len(v) > 1 else v[0]
                   for k, v in pend.items()}
            fields = {k: cat[k][:batch_size] for k in self.KEYS}
            for k in pend:
                pend[k] = [cat[k][batch_size:]] if pend_n > batch_size else []
            pend_n = max(0, pend_n - batch_size)
            return self._make_batch(np.ones(batch_size, dtype=bool), fields)

        for si in shard_order:
            shard = self._shard(int(si))
            order = np.arange(len(shard["label"]))
            if shuffle:
                np.random.default_rng((seed, epoch, int(si))).shuffle(order)
            emit({k: shard[k][order] for k in self.KEYS})
            while pend_n >= batch_size:
                yield pop_batch()

        if pend_n and not drop_remainder:  # final partial batch: pad-by-repeat
            cat = {k: np.concatenate(v) if len(v) > 1 else v[0]
                   for k, v in pend.items()}
            k0 = int(pend_n)
            ex_mask = np.zeros(batch_size, dtype=bool)
            ex_mask[:k0] = True
            fields = {}
            for k in self.KEYS:
                pad = np.repeat(cat[k][:1], batch_size - k0, axis=0)
                fields[k] = np.concatenate([cat[k], pad])
            yield self._make_batch(ex_mask, fields)


class Prefetcher:
    """Background-thread prefetch: overlaps host batch prep (+ optional
    host→device transfer via `transfer`) with device compute.

    Wraps any Batch iterator; bounded queue (depth) caps host memory. The
    worker's exception, if any, is re-raised in the consumer. Call close()
    (or exit the `with` block) if iteration may stop early — otherwise the
    worker would keep preparing/transferring batches against a full queue.

        with Prefetcher(ds.get_batches(bs, ...), transfer=device_put_batch) as it:
            for batch in it:
                state, m = train_step(state, shared, batch)
    """

    _DONE = object()

    def __init__(self, it: Iterator[Batch], depth: int = 2, transfer=None):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err: BaseException | None = None
        self._stop = threading.Event()
        self._done = False

        def work():
            try:
                for item in it:
                    if self._stop.is_set():
                        return
                    item = transfer(item) if transfer else item
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    else:
                        return
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                # The DONE sentinel must not be dropped when the queue happens
                # to be full at exhaustion (the consumer would block forever on
                # the next get) — keep trying until it lands or close() stops us.
                while not self._stop.is_set():
                    try:
                        self._q.put(self._DONE, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._t = threading.Thread(target=work, daemon=True)
        self._t.start()

    def close(self):
        """Stop the worker and release queued batches. Idempotent."""
        self._stop.set()
        while True:  # drain so a blocked put wakes and the worker exits
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._t.join(timeout=5)
        self._done = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            raise StopIteration
        item = self._q.get()
        if item is self._DONE:
            self._done = True
            self._t.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
