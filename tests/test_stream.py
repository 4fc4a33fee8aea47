"""Streaming input: shard round-trip, windowed-shuffle determinism, prefetch.

The streaming loader (data/stream.py) must be a drop-in for pipeline.Dataset:
identical Batch layout and pad-by-repeat semantics, deterministic order given
(seed, epoch), full split coverage — the memory-bounded path for datasets that
don't fit pack-once (SURVEY.md §2 data-runtime row)."""

import os
import threading

import numpy as np
import pytest

from fvta_memexqa_tpu.data import Dataset, StreamingDataset, write_split_shards
from fvta_memexqa_tpu.data.stream import Prefetcher


@pytest.fixture(scope="module")
def sharded(pack_dir, packed_synth):
    n_shards = write_split_shards(pack_dir, "train", shard_size=5)
    assert n_shards == -(-packed_synth.num_examples("train") // 5)
    return pack_dir


def _batches_equal(b1, b2):
    import jax

    for l1, l2 in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


class TestStreamingDataset:
    def test_covers_split(self, sharded, packed_synth):
        ds = StreamingDataset(sharded, "train")
        assert ds.n == packed_synth.num_examples("train")
        ref = Dataset(packed_synth, "train")
        assert sorted(ds.qids) == sorted(ref.qids)
        assert ds.num_batches(4) == ref.num_batches(4)

    def test_unshuffled_identical_to_in_memory(self, sharded, packed_synth):
        """Unshuffled, shards are split in pack order and the carry across
        shard boundaries preserves it — the stream must equal Dataset's."""
        ds = StreamingDataset(sharded, "train", cache_shards=1)
        ref = Dataset(packed_synth, "train")
        s_batches = list(ds.get_batches(4))
        r_batches = list(ref.get_batches(4))
        assert len(s_batches) == len(r_batches)
        for sb, rb in zip(s_batches, r_batches):
            _batches_equal(sb, rb)

    def test_shuffle_deterministic_and_complete(self, sharded, packed_synth):
        ds = StreamingDataset(sharded, "train")
        a = list(ds.get_batches(4, shuffle=True, seed=3, epoch=1))
        b = list(ds.get_batches(4, shuffle=True, seed=3, epoch=1))
        for x, y in zip(a, b):
            _batches_equal(x, y)
        c = list(ds.get_batches(4, shuffle=True, seed=3, epoch=2))
        assert any(
            not np.array_equal(np.asarray(x.q_words), np.asarray(y.q_words))
            for x, y in zip(a, c)
        ), "epoch must change the order"
        # every example appears exactly once (multiset over label+q_words rows)
        def rows(batches):
            out = []
            for bt in batches:
                for i in range(len(np.asarray(bt.label))):
                    if bt.ex_mask[i]:
                        out.append(np.asarray(bt.q_words)[i].tobytes())
            return sorted(out)

        assert rows(a) == rows(list(Dataset(packed_synth, "train").get_batches(4)))

    def test_partial_final_batch_masked(self, sharded, packed_synth):
        n = packed_synth.num_examples("train")
        bs = 7 if n % 7 else 6
        assert n % bs, "pick a bs that leaves a remainder"
        *_, last = StreamingDataset(sharded, "train").get_batches(bs)
        k = n % bs
        assert last.ex_mask[:k].all() and not last.ex_mask[k:].any()
        assert last.q_words.shape[0] == bs

    def test_ensure_split_shards_idempotent(self, sharded, packed_synth, tmp_path):
        """A resume must not pay the re-shard again: matching index → no-op,
        different shard_size → re-shard."""
        import shutil

        from fvta_memexqa_tpu.data.stream import ensure_split_shards

        d = str(tmp_path / "pack2")
        shutil.copytree(sharded, d)
        n1 = ensure_split_shards(d, "train", 5)
        marker = os.path.getmtime(os.path.join(d, "data_train.shard-00000.npz"))
        assert ensure_split_shards(d, "train", 5) == n1
        assert os.path.getmtime(
            os.path.join(d, "data_train.shard-00000.npz")) == marker  # untouched
        n2 = ensure_split_shards(d, "train", 3)
        assert n2 != n1  # size change re-shards

    def test_ensure_split_shards_invalidates_on_new_pack(self, sharded, tmp_path):
        """Re-running prepro into the same dir must invalidate old shards —
        the index fingerprints the split file (size+mtime)."""
        import shutil

        from fvta_memexqa_tpu.data.stream import ensure_split_shards

        d = str(tmp_path / "pack3")
        shutil.copytree(sharded, d)
        ensure_split_shards(d, "train", 5)
        m1 = os.path.getmtime(os.path.join(d, "data_train.shard-00000.npz"))
        # simulate a re-prepro: touch the split file with a new mtime
        src = os.path.join(d, "data_train.npz")
        os.utime(src, (os.path.getatime(src), os.path.getmtime(src) + 10))
        ensure_split_shards(d, "train", 5)
        m2 = os.path.getmtime(os.path.join(d, "data_train.shard-00000.npz"))
        assert m2 > m1  # shards rebuilt, not silently reused

    def test_lru_cache_touch_order(self, sharded):
        ds = StreamingDataset(sharded, "train", cache_shards=2)
        ds._shard(0)
        ds._shard(1)
        ds._shard(0)          # touch 0 → 1 is now least-recent
        ds._shard(2)          # evicts 1, not 0
        assert set(ds._cache) == {0, 2}
        _ = ds.qids           # must not disturb the shard cache
        assert set(ds._cache) == {0, 2}

    def test_drop_remainder(self, sharded, packed_synth):
        n = packed_synth.num_examples("train")
        bs = 7 if n % 7 else 6
        got = list(StreamingDataset(sharded, "train").get_batches(
            bs, drop_remainder=True))
        assert len(got) == n // bs


class TestPrefetcher:
    def test_equivalent_stream(self, sharded):
        ds = StreamingDataset(sharded, "train")
        direct = list(ds.get_batches(4, shuffle=True, seed=1))
        fetched = list(Prefetcher(ds.get_batches(4, shuffle=True, seed=1), depth=3))
        assert len(direct) == len(fetched)
        for d, f in zip(direct, fetched):
            _batches_equal(d, f)

    def test_transfer_applied(self, sharded):
        import jax.numpy as jnp

        from fvta_memexqa_tpu.data.device_prepro import device_put_batch

        ds = StreamingDataset(sharded, "train")
        b = next(iter(Prefetcher(ds.get_batches(4), transfer=device_put_batch)))
        assert isinstance(b.q_words, jnp.ndarray)

    def test_early_close_stops_worker(self, sharded):
        """Breaking out of iteration must not leave a blocked worker behind."""
        ds = StreamingDataset(sharded, "train")
        calls = []

        def slow_transfer(b):
            calls.append(1)
            return b

        pf = Prefetcher(ds.get_batches(2), depth=1, transfer=slow_transfer)
        next(pf)  # consume one, then abandon
        pf.close()
        assert not pf._t.is_alive()
        n_after_close = len(calls)
        import time

        time.sleep(0.3)
        assert len(calls) == n_after_close  # no further transfers
        with pytest.raises(StopIteration):
            next(pf)  # exhausted-after-close does not block

    def test_done_sentinel_survives_full_queue(self, sharded):
        """Regression: with a slow consumer the queue is FULL when the worker
        exhausts its iterator; the DONE sentinel must still land (it was
        dropped by a swallowed put_nowait, hanging the consumer forever —
        found by a full-scale training run's val evaluation)."""
        import time

        ds = StreamingDataset(sharded, "train")
        pf = Prefetcher(ds.get_batches(4), depth=1)
        out = []

        def consume():
            for b in pf:
                time.sleep(0.05)  # keep the queue full at worker exhaustion
                out.append(b)

        t = threading.Thread(target=consume, daemon=True)
        t.start()
        t.join(timeout=30)
        assert not t.is_alive(), "consumer hung: DONE sentinel was dropped"
        assert len(out) == ds.num_batches(4)

    def test_close_idempotent_and_after_exhaustion(self, sharded):
        ds = StreamingDataset(sharded, "train")
        pf = Prefetcher(ds.get_batches(50))
        list(pf)
        pf.close()
        pf.close()

    def test_worker_exception_propagates(self):
        def boom():
            yield 1
            raise RuntimeError("worker died")

        it = Prefetcher(boom())
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="worker died"):
            list(it)


def test_train_e2e_streaming(sharded, packed_synth, small_config, tmp_path):
    """A few optimizer steps through StreamingDataset + Prefetcher: the loop,
    val evaluation, and checkpointing all take the streaming loader."""
    import dataclasses

    from fvta_memexqa_tpu.data import StreamingDataset
    from fvta_memexqa_tpu.train import train

    write_split_shards(sharded, "val", shard_size=4)
    cfg = small_config.replace(train=dataclasses.replace(
        small_config.train, batch_size=4, num_epochs=1, val_period=3,
        log_period=2))
    res = train(cfg, packed_synth, str(tmp_path / "run"), num_steps=4,
                echo=False, datasets=(StreamingDataset(sharded, "train"),
                                      StreamingDataset(sharded, "val")),
                prefetch=2)
    assert res["steps"] == 4
    assert res["best_val_acc"] >= 0.0
