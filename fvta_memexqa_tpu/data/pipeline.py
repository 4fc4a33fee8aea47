"""Host-side batching: packed arrays → fixed-shape id batches.

Rebuild of the reference's `utils.py` Dataset/get_batches (SURVEY.md section 2 "Data
runtime") with static shapes: the reference re-pads every batch in Python to per-batch
max lengths; here everything was padded once at pack time, so a batch is a pure slice +
(for the final partial batch) pad-by-repeat with `ex_mask=False` — shapes never change,
so one XLA executable serves every step. Batches carry only small integer id tensors;
the heavy photo-feature and album-text gathers run on device (`device_prepro.py`).
"""

from __future__ import annotations

from typing import Iterator

import flax.struct
import jax.numpy as jnp
import numpy as np

from fvta_memexqa_tpu.data.pack import PackedDataset


@flax.struct.dataclass
class Batch:
    """Device-feedable per-question record (ids only; see pack.py for shapes)."""

    q_words: jnp.ndarray       # i32 [N, Jq]
    q_chars: jnp.ndarray       # i32 [N, Jq, W]
    q_mask: jnp.ndarray        # bool [N, Jq]
    choice_words: jnp.ndarray  # i32 [N, 4, Ja]
    choice_chars: jnp.ndarray  # i32 [N, 4, Ja, W]
    choice_mask: jnp.ndarray   # bool [N, 4, Ja]
    album_idx: jnp.ndarray     # i32 [N, A] rows into shared album tables (0 = pad)
    album_mask: jnp.ndarray    # bool [N, A]
    label: jnp.ndarray         # i32 [N]
    ex_mask: jnp.ndarray       # bool [N]; False on pad rows of a partial final batch


_BATCH_KEYS = (
    "q_words", "q_chars", "q_mask",
    "choice_words", "choice_chars", "choice_mask",
    "album_idx", "album_mask", "label",
)


class Dataset:
    """One split of a PackedDataset, exposing shuffled fixed-shape batches."""

    def __init__(self, packed: PackedDataset, split: str):
        self.arrays = packed.splits[split]
        self.n = int(self.arrays["label"].shape[0])
        self.split = split

    @property
    def qids(self) -> np.ndarray:
        return self.arrays["qid"]

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
        """Yield numpy Batch structs. Deterministic given (seed, epoch)."""
        order = np.arange(self.n)
        if shuffle:
            np.random.default_rng((seed, epoch)).shuffle(order)
        nb = self.num_batches(batch_size, drop_remainder)
        for b in range(nb):
            idx = order[b * batch_size : (b + 1) * batch_size]
            ex_mask = np.ones(len(idx), dtype=bool)
            if len(idx) < batch_size:  # pad-by-repeat; masked out of loss/metrics
                pad = np.full(batch_size - len(idx), idx[0] if len(idx) else 0)
                ex_mask = np.concatenate([ex_mask, np.zeros(len(pad), dtype=bool)])
                idx = np.concatenate([idx, pad])
            fields = {k: self.arrays[k][idx] for k in _BATCH_KEYS}
            yield Batch(ex_mask=ex_mask, **fields)
