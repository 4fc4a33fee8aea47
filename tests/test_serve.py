"""Serving path: split-model equivalence, album ingestion + cached-context QA,
micro-batched concurrency, HTTP surface."""

import json
import os
import threading
import urllib.request

import jax
import numpy as np
import pytest

from fvta_memexqa_tpu.config import MODALITIES
from fvta_memexqa_tpu.data import Dataset, SharedTables, assemble, make_synthetic
from fvta_memexqa_tpu.data.device_prepro import device_put_batch
from fvta_memexqa_tpu.models import FVTAModel
from fvta_memexqa_tpu.serve import AlbumStore, QAEngine, vocab_view


@pytest.fixture(scope="module")
def served(packed_synth, small_config):
    """Model + params + store with all synthetic albums ingested."""
    shared = SharedTables.from_packed(packed_synth.shared)
    ds = Dataset(packed_synth, "train")
    batch = device_put_batch(next(iter(ds.get_batches(4))))
    mi = assemble(shared, batch)
    model = FVTAModel(cfg=small_config)
    params = jax.jit(lambda k: model.init(k, shared, mi, train=False))(
        jax.random.key(0))
    vocab = vocab_view(packed_synth.meta)
    store = AlbumStore(small_config, model, params, shared, vocab)
    _, albums, feats, _, _ = make_synthetic(seed=0)
    for a in albums.values():
        store.ingest(a, feats)
    return model, params, shared, store, albums, feats


class TestSplitModel:
    def test_split_equals_monolithic(self, served, packed_synth):
        model, params, shared, *_ = served
        ds = Dataset(packed_synth, "train")
        mi = assemble(shared, device_put_batch(next(iter(ds.get_batches(4)))))
        full = jax.jit(lambda p: model.apply(p, shared, mi, train=False))(params)
        h, m = jax.jit(lambda p: model.apply(
            p, shared, mi, train=False, method=model.encode_context))(params)
        split = jax.jit(lambda p, h, m: model.apply(
            p, shared, mi, h, m, train=False, method=model.answer))(params, h, m)
        np.testing.assert_allclose(np.asarray(full.logits), np.asarray(split.logits),
                                   rtol=1e-6, atol=1e-6)


class TestAlbumStore:
    def test_ingest_and_count(self, served):
        *_, store, albums, feats = served
        assert store.num_albums == len(albums)

    def test_cached_encoding_matches_batch_path(self, served, packed_synth,
                                                small_config):
        """Ingested album states must equal the training-path encode of that album."""
        model, params, shared, store, albums, feats = served
        ds = Dataset(packed_synth, "train")
        batch = device_put_batch(next(iter(ds.get_batches(1))))
        mi = assemble(shared, batch)
        h_all, m_all = jax.jit(lambda p: model.apply(
            p, shared, mi, train=False, method=model.encode_context))(params)
        n_mod = len(MODALITIES)
        # locate the example's first real album id
        aidx = int(batch.album_idx[0, 0])
        # find album_id by matching against the pack's album ordering
        used = sorted(albums.keys())
        album_id = used[aidx - 1]  # pack rows are 1-based over sorted used ids
        cached_h, cached_m = store._store[album_id]
        np.testing.assert_allclose(np.asarray(h_all[0, :n_mod]),
                                   np.asarray(cached_h), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(m_all[0, :n_mod]),
                                      np.asarray(cached_m))


class TestCacheDtype:
    """--cache-dtype bfloat16: half the cache footprint, answers preserved
    (only the CACHED states are rounded; encode + answer math stay f32)."""

    @pytest.fixture(scope="class")
    def bf16_store(self, served, small_config):
        model, params, shared, store, albums, feats = served
        s2 = AlbumStore(small_config, model, params, shared, store.vocab,
                        cache_dtype="bfloat16")
        for a in albums.values():
            s2.ingest(a, feats)
        return s2

    def test_halves_cache_bytes(self, served, bf16_store):
        *_, store, albums, feats = served
        assert bf16_store.num_albums == store.num_albums
        # h states (f32→bf16) dominate; bool masks are unchanged
        assert bf16_store.cache_bytes < 0.6 * store.cache_bytes

    def test_answers_match_f32_store(self, served, bf16_store):
        *_, store, albums, feats = served
        e1 = QAEngine(store, batch_size=4, batch_window_ms=1.0)
        e2 = QAEngine(bf16_store, batch_size=4, batch_window_ms=1.0)
        try:
            for aid in sorted(albums)[:4]:
                a = albums[aid]
                q = f"where did we go on {a.title} ?"
                ch = [a.where, "nowhere", "space", "atlantis"]
                r1, r2 = e1.ask(q, ch, [aid]), e2.ask(q, ch, [aid])
                assert r1["answer_index"] == r2["answer_index"]
                np.testing.assert_allclose(r1["probs"], r2["probs"], atol=0.05)
        finally:
            e1.close()
            e2.close()

    def test_reencode_matches_cached_hit(self, served, small_config):
        """Answers must not depend on cache state: an entry evicted and
        re-encoded on demand serves the SAME bf16 rounding a cached hit
        would (get_stacked casts at the re-encode sites)."""
        model, params, shared, store, albums, feats = served
        s2 = AlbumStore(small_config, model, params, shared, store.vocab,
                        cache_dtype="bfloat16")
        aid = sorted(albums)[0]
        s2.ingest(albums[aid], feats)
        h_hit, m_hit, n = s2.get_stacked([aid])
        with s2._lock:  # simulate a device-cache eviction
            e = s2._store.pop(aid)
            s2._bytes -= s2._entry_bytes(*e)
        h_re, m_re, n2 = s2.get_stacked([aid])
        assert n == n2 == 1 and s2.reencodes == 1
        np.testing.assert_array_equal(np.asarray(h_hit), np.asarray(h_re))
        np.testing.assert_array_equal(np.asarray(m_hit), np.asarray(m_re))

    def test_save_load_preserves_dtype(self, bf16_store, served, small_config,
                                       tmp_path):
        model, params, shared, store, albums, feats = served
        path = str(tmp_path / "bf16cache")
        assert bf16_store.save(path)
        s3 = AlbumStore(small_config, model, params, shared, store.vocab,
                        cache_dtype="bfloat16")
        assert s3.load(path) == bf16_store.num_albums
        assert s3.cache_bytes == bf16_store.cache_bytes
        aid = sorted(albums)[0]
        h1, m1, _ = bf16_store.get_stacked([aid])
        h2, m2, _ = s3.get_stacked([aid])
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    def test_bad_dtype_rejected(self, served, small_config):
        model, params, shared, store, *_ = served
        with pytest.raises(ValueError, match="cache_dtype"):
            AlbumStore(small_config, model, params, shared, store.vocab,
                       cache_dtype="float16")


class TestCacheDtypeInt8:
    """--cache-dtype int8: ~4x cache capacity via symmetric per-row max-abs
    quantization of the cached states (encode + answer math stay f32)."""

    @pytest.fixture(scope="class")
    def int8_store(self, served, small_config):
        model, params, shared, store, albums, feats = served
        s2 = AlbumStore(small_config, model, params, shared, store.vocab,
                        cache_dtype="int8")
        for a in albums.values():
            s2.ingest(a, feats)
        return s2

    def test_quarters_cache_bytes(self, served, int8_store):
        *_, store, albums, feats = served
        assert int8_store.num_albums == store.num_albums
        # int8 h + f32 per-row scale + unchanged bool masks ≈ 0.26x of f32 h
        assert int8_store.cache_bytes < 0.3 * store.cache_bytes

    def test_quantization_error_bounded(self, served, int8_store):
        """Dequantized states within half a quantization step of the f32
        truth, per (modality, timestep) row."""
        from fvta_memexqa_tpu.serve import _dequant_h

        *_, store, albums, feats = served
        for aid in sorted(albums)[:3]:
            h_f32 = np.asarray(store._store[aid][0])
            e = int8_store._store[aid]
            h_q = np.asarray(_dequant_h(e[0]))
            step = np.asarray(e[0]["s"])  # [6, T, 1]
            assert np.all(np.abs(h_q - h_f32) <= 0.5 * step + 1e-7)

    def test_answers_match_f32_store(self, served, int8_store):
        *_, store, albums, feats = served
        e1 = QAEngine(store, batch_size=4, batch_window_ms=1.0)
        e2 = QAEngine(int8_store, batch_size=4, batch_window_ms=1.0)
        try:
            for aid in sorted(albums)[:4]:
                a = albums[aid]
                q = f"where did we go on {a.title} ?"
                ch = [a.where, "nowhere", "space", "atlantis"]
                r1, r2 = e1.ask(q, ch, [aid]), e2.ask(q, ch, [aid])
                assert r1["answer_index"] == r2["answer_index"]
                np.testing.assert_allclose(r1["probs"], r2["probs"], atol=0.05)
        finally:
            e1.close()
            e2.close()

    def test_reencode_matches_cached_hit(self, served, small_config):
        """Answers must not depend on cache state: an evicted-and-re-encoded
        entry serves the SAME int8 rounding a cached hit would."""
        model, params, shared, store, albums, feats = served
        s2 = AlbumStore(small_config, model, params, shared, store.vocab,
                        cache_dtype="int8")
        aid = sorted(albums)[0]
        s2.ingest(albums[aid], feats)
        h_hit, m_hit, n = s2.get_stacked([aid])
        with s2._lock:  # simulate a device-cache eviction
            e = s2._store.pop(aid)
            s2._bytes -= s2._entry_bytes(*e)
        h_re, m_re, n2 = s2.get_stacked([aid])
        assert n == n2 == 1 and s2.reencodes == 1
        np.testing.assert_array_equal(np.asarray(h_hit), np.asarray(h_re))
        np.testing.assert_array_equal(np.asarray(m_hit), np.asarray(m_re))

    def test_composes_with_shard_cache(self, served, int8_store, small_config):
        """int8 entries are pytrees — they must still commit to their hash
        home device under --shard-cache and answer identically."""
        from fvta_memexqa_tpu.config import MeshConfig
        from fvta_memexqa_tpu.parallel.mesh import make_mesh

        model, params, shared, store, albums, feats = served
        mesh = make_mesh(MeshConfig(data_parallel=4))
        s = AlbumStore(small_config, model, params, shared, store.vocab,
                       mesh=mesh, shard_cache=True, cache_dtype="int8")
        for a in albums.values():
            s.ingest(a, feats)
        per_dev = s.cache_bytes_per_device
        assert sum(per_dev) == s.cache_bytes == int8_store.cache_bytes
        for aid in albums:
            e = s._store[aid]
            want = {s._cache_devices[s._home_device(aid)]}
            assert e[0]["q"].devices() == want
            assert e[0]["s"].devices() == want
            h1, m1, _ = int8_store.get_stacked([aid])
            h2, m2, _ = s.get_stacked([aid])
            np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    def test_save_load_roundtrip(self, int8_store, served, small_config,
                                 tmp_path):
        model, params, shared, store, albums, feats = served
        path = str(tmp_path / "int8cache")
        assert int8_store.save(path)
        s3 = AlbumStore(small_config, model, params, shared, store.vocab,
                        cache_dtype="int8")
        assert s3.load(path) == int8_store.num_albums
        assert s3.cache_bytes == int8_store.cache_bytes
        aid = sorted(albums)[0]
        assert np.asarray(s3._store[aid][0]["q"]).dtype == np.int8
        h1, m1, _ = int8_store.get_stacked([aid])
        h2, m2, _ = s3.get_stacked([aid])
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    def test_load_into_other_dtype_honors_store_mode(self, int8_store, served,
                                                     small_config, tmp_path):
        """A cache saved under int8 restored into a float32/bfloat16 store must
        honor the STORE's --cache-dtype (dequantize on load), not silently keep
        serving int8 rounding and int8 byte accounting (ADVICE r4)."""
        model, params, shared, store, albums, feats = served
        path = str(tmp_path / "int8cache_x")
        assert int8_store.save(path)
        for mode, np_dtype in (("float32", np.float32), ("bfloat16", None)):
            s = AlbumStore(small_config, model, params, shared, store.vocab,
                           cache_dtype=mode)
            assert s.load(path) == int8_store.num_albums
            aid = sorted(albums)[0]
            entry_h = s._store[aid][0]
            assert not isinstance(entry_h, dict), mode
            if np_dtype is not None:
                assert np.asarray(entry_h).dtype == np_dtype
            # bytes now reflect the configured dtype, not the on-disk int8
            assert s.cache_bytes > int8_store.cache_bytes
            # values equal the dequantized int8 states (information already
            # rounded at save time cannot come back — but the dtype must)
            from fvta_memexqa_tpu.serve import _dequant_h

            want = np.asarray(_dequant_h(int8_store._store[aid][0]))
            got = np.asarray(jax.numpy.asarray(entry_h).astype(jax.numpy.float32))
            np.testing.assert_allclose(got, want, atol=1e-2 if mode == "bfloat16"
                                       else 0.0)


class TestQAEngine:
    def test_answers_derivable_question(self, served):
        model, params, shared, store, albums, feats = served
        engine = QAEngine(store, batch_size=4, batch_window_ms=1.0)
        try:
            a0 = albums["album0"]
            res = engine.ask(
                f"where did we go on {a0.title} ?",
                [a0.where, "nowhere", "space", "atlantis"],
                ["album0"],
            )
            assert res["albums_found"] == 1
            assert len(res["probs"]) == 4
            assert abs(sum(res["probs"]) - 1.0) < 1e-5
        finally:
            engine.close()

    def test_concurrent_asks_batched(self, served):
        *_, store, albums, feats = served
        engine = QAEngine(store, batch_size=8, batch_window_ms=20.0)
        try:
            results = [None] * 6
            def worker(i):
                aid = f"album{i % 3}"
                a = albums[aid]
                results[i] = engine.ask(f"what year was {a.title} ?",
                                        ["2007", "2009", "2011", "2013"], [aid])
            threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=60)
            assert all(r is not None and "answer" in r for r in results)
            # the window should have coalesced at least some requests
            assert engine.stats["batches"] < engine.stats["questions"]
        finally:
            engine.close()

    def test_unknown_album_reported(self, served):
        *_, store, albums, feats = served
        engine = QAEngine(store, batch_size=2, batch_window_ms=1.0)
        try:
            res = engine.ask("where ?", ["a", "b", "c", "d"], ["no_such_album"])
            assert res["albums_found"] == 0
        finally:
            engine.close()

    def test_warmup_compiles_without_counting(self, served):
        *_, store, albums, feats = served
        engine = QAEngine(store, batch_size=2)
        try:
            w = engine.warmup()
            assert w > 0.0
            assert engine.stats == {"questions": 0, "batches": 0}
            # post-warmup asks still work
            a0 = albums["album0"]
            r = engine.ask("where ?", [a0.where, "b", "c", "d"], ["album0"])
            assert "answer" in r
        finally:
            engine.close()

    def test_wrong_choice_count_rejected(self, served):
        *_, store, albums, feats = served
        engine = QAEngine(store, batch_size=2)
        try:
            with pytest.raises(ValueError):
                engine.ask("q", ["only", "three", "choices"], [])
        finally:
            engine.close()


class TestMeshServing:
    """Multi-chip serving: params/tables replicated over a DP mesh, the query
    micro-batch sharded over "data" — answers identical to single-device."""

    @pytest.fixture(scope="class")
    def mesh_store(self, served, small_config):
        from fvta_memexqa_tpu.config import MeshConfig
        from fvta_memexqa_tpu.parallel.mesh import make_mesh

        model, params, shared, store, albums, feats = served
        mesh = make_mesh(MeshConfig(data_parallel=4))
        s = AlbumStore(small_config, model, params, shared, store.vocab, mesh=mesh)
        for a in albums.values():
            s.ingest(a, feats)
        return s, albums, feats

    def test_sharded_answers_match_single_device(self, served, mesh_store):
        *_, store, albums, feats = served
        s_mesh, _, _ = mesh_store
        e1 = QAEngine(store, batch_size=4, batch_window_ms=1.0)
        e2 = QAEngine(s_mesh, batch_size=4, batch_window_ms=1.0)
        try:
            for aid in ("album0", "album1"):
                a = albums[aid]
                q = f"where did we go on {a.title} ?"
                ch = [a.where, "mars", "narnia", "void"]
                r1 = e1.ask(q, ch, [aid])
                r2 = e2.ask(q, ch, [aid])
                assert r1["answer_index"] == r2["answer_index"]
                np.testing.assert_allclose(r1["probs"], r2["probs"],
                                           rtol=1e-5, atol=1e-6)
        finally:
            e1.close()
            e2.close()

    def test_concurrent_load_on_mesh(self, mesh_store):
        s_mesh, albums, _ = mesh_store
        engine = QAEngine(s_mesh, batch_size=8, batch_window_ms=10.0)
        try:
            results = [None] * 8
            def worker(i):
                aid = f"album{i % 3}"
                a = albums[aid]
                results[i] = engine.ask(f"what year was {a.title} ?",
                                        ["2007", "2009", "2011", "2013"], [aid],
                                        timeout=120.0)
            threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            assert all(r is not None and "answer" in r for r in results)
        finally:
            engine.close()

    def test_indivisible_batch_rejected(self, mesh_store):
        s_mesh, *_ = mesh_store
        with pytest.raises(ValueError, match="divisible"):
            QAEngine(s_mesh, batch_size=3)


class TestShardedCache:
    """Cache-sharded multi-chip serving (ROADMAP #8): each album's encoded
    states live on ONE hash-chosen mesh device, so aggregate cache capacity
    scales with the mesh — answers must stay identical to the replicated
    store, and the per-device byte accounting must stay consistent through
    eviction and persistence."""

    @pytest.fixture(scope="class")
    def sharded_store(self, served, small_config):
        from fvta_memexqa_tpu.config import MeshConfig
        from fvta_memexqa_tpu.parallel.mesh import make_mesh

        model, params, shared, store, albums, feats = served
        mesh = make_mesh(MeshConfig(data_parallel=4))
        s = AlbumStore(small_config, model, params, shared, store.vocab,
                       mesh=mesh, shard_cache=True)
        for a in albums.values():
            s.ingest(a, feats)
        return s, albums, feats

    def test_requires_mesh(self, served, small_config):
        model, params, shared, store, *_ = served
        with pytest.raises(ValueError, match="mesh"):
            AlbumStore(small_config, model, params, shared, store.vocab,
                       shard_cache=True)

    def test_entries_live_on_hash_home_devices(self, sharded_store):
        s, albums, _ = sharded_store
        homes = set()
        for aid in albums:
            h, m = s._store[aid]
            want = s._cache_devices[s._home_device(aid)]
            assert h.devices() == {want}, aid
            assert m.devices() == {want}, aid
            homes.add(want)
        assert len(homes) >= 2  # actually distributed, not all on one chip
        per_dev = s.cache_bytes_per_device
        assert sum(per_dev) == s.cache_bytes
        assert all(b >= 0 for b in per_dev)

    def test_answers_match_replicated_store(self, served, sharded_store):
        *_, store, albums, feats = served
        s, _, _ = sharded_store
        e1 = QAEngine(store, batch_size=4, batch_window_ms=1.0)
        e2 = QAEngine(s, batch_size=4, batch_window_ms=1.0)
        try:
            for aid in ("album0", "album1", "album2"):
                a = albums[aid]
                q = f"where did we go on {a.title} ?"
                ch = [a.where, "mars", "narnia", "void"]
                r1 = e1.ask(q, ch, [aid])
                r2 = e2.ask(q, ch, [aid])
                assert r1["answer_index"] == r2["answer_index"]
                np.testing.assert_allclose(r1["probs"], r2["probs"],
                                           rtol=1e-5, atol=1e-6)
        finally:
            e1.close()
            e2.close()

    def test_eviction_accounting_stays_consistent(self, served, small_config):
        from fvta_memexqa_tpu.config import MeshConfig
        from fvta_memexqa_tpu.parallel.mesh import make_mesh

        model, params, shared, store, albums, feats = served
        mesh = make_mesh(MeshConfig(data_parallel=4))
        # budget that holds ~2 entries → ingesting all albums forces evictions
        any_h, any_m = next(iter(store._store.values()))
        budget = int(2.5 * AlbumStore._entry_bytes(any_h, any_m))
        s = AlbumStore(small_config, model, params, shared, store.vocab,
                       mesh=mesh, shard_cache=True, max_bytes=budget)
        for a in albums.values():
            s.ingest(a, feats)
        assert s.evictions > 0
        assert s.cache_bytes <= budget
        assert sum(s.cache_bytes_per_device) == s.cache_bytes
        assert len(s._home) == len(s._store)
        # evicted-but-ingested albums still answer (re-encode on demand)
        engine = QAEngine(s, batch_size=4, batch_window_ms=1.0)
        try:
            a0 = albums["album0"]
            r = engine.ask(f"where did we go on {a0.title} ?",
                           [a0.where, "b", "c", "d"], ["album0"])
            assert r["albums_found"] == 1
        finally:
            engine.close()

    def test_save_load_roundtrip_redistributes(self, sharded_store, served,
                                               small_config, tmp_path):
        from fvta_memexqa_tpu.config import MeshConfig
        from fvta_memexqa_tpu.parallel.mesh import make_mesh

        s, albums, _ = sharded_store
        model, params, shared, store, *_ = served
        path = str(tmp_path / "cache")
        assert s.save(path)
        mesh = make_mesh(MeshConfig(data_parallel=4))
        s2 = AlbumStore(small_config, model, params, shared, store.vocab,
                        mesh=mesh, shard_cache=True)
        assert s2.load(path) == len(albums)
        for aid in albums:
            want = s2._cache_devices[s2._home_device(aid)]
            assert s2._store[aid][0].devices() == {want}
            np.testing.assert_array_equal(np.asarray(s2._store[aid][0]),
                                          np.asarray(s._store[aid][0]))
        assert sum(s2.cache_bytes_per_device) == s2.cache_bytes


class TestHTTP:
    def test_http_roundtrip(self, served):
        import socket
        from http.server import ThreadingHTTPServer

        model, params, shared, store, albums, feats = served
        engine = QAEngine(store, batch_size=4, batch_window_ms=1.0)
        # pick a free port
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        from fvta_memexqa_tpu import serve as serve_mod

        th = threading.Thread(
            target=serve_mod.serve_http, args=(engine, store, feats, port), daemon=True
        )
        th.start()
        import time

        base = f"http://127.0.0.1:{port}"
        for _ in range(50):
            try:
                stats = json.load(urllib.request.urlopen(f"{base}/stats", timeout=1))
                break
            except Exception:
                time.sleep(0.1)
        assert stats["albums"] == len(albums)

        a1 = albums["album1"]
        req = urllib.request.Request(
            f"{base}/ask",
            data=json.dumps({
                "question": f"where did we go on {a1.title} ?",
                "choices": [a1.where, "mars", "narnia", "void"],
                "album_ids": ["album1"],
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        res = json.load(urllib.request.urlopen(req, timeout=30))
        assert "answer" in res and res["albums_found"] == 1

        # ingest a NEW album over HTTP (features in the request), then ask about it
        feat_dim = int(np.asarray(feats[next(iter(feats))]).shape[0])
        ingest = urllib.request.Request(
            f"{base}/albums",
            data=json.dumps({
                "album": {"album_id": "http_album", "album_title": "the lagoon trip",
                          "album_where": "lisbon", "album_when": "july 2015",
                          "photo_ids": ["hp1"],
                          "photo_titles": ["a photo of a boat"]},
                "photo_feats": {"hp1": [0.1] * feat_dim},
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        res = json.load(urllib.request.urlopen(ingest, timeout=60))
        assert res["ingested"] == "http_album"
        res = json.load(urllib.request.urlopen(urllib.request.Request(
            f"{base}/ask",
            data=json.dumps({"question": "where did we go on the lagoon trip ?",
                             "choices": ["lisbon", "mars", "narnia", "void"],
                             "album_ids": ["http_album"]}).encode(),
            headers={"Content-Type": "application/json"}), timeout=60))
        assert res["albums_found"] == 1

        # bad request -> 400 with error body
        bad = urllib.request.Request(
            f"{base}/ask", data=json.dumps({"question": "q"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 400
        assert raised
        engine.close()


class TestAuthAndRateLimit:
    """serve_http hardening: bearer-token auth (401), sliding-window rate
    limit (429), /healthz."""

    @staticmethod
    def _start(served, **kwargs):
        import socket
        import time as _time

        from fvta_memexqa_tpu import serve as serve_mod

        *_, store, albums, feats = served
        engine = QAEngine(store, batch_size=4, batch_window_ms=1.0)
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        th = threading.Thread(
            target=serve_mod.serve_http,
            args=(engine, store, feats, port), kwargs=kwargs, daemon=True)
        th.start()
        _time.sleep(0.3)
        return engine, f"http://127.0.0.1:{port}"

    @staticmethod
    def _get(url, token=None):
        import urllib.error

        req = urllib.request.Request(url)
        if token:
            req.add_header("Authorization", f"Bearer {token}")
        try:
            return json.load(urllib.request.urlopen(req, timeout=10)), 200
        except urllib.error.HTTPError as e:
            return json.loads(e.read() or b"{}"), e.code

    def test_healthz(self, served):
        engine, base = self._start(served)
        try:
            body, code = self._get(f"{base}/healthz")
            assert code == 200 and body == {"ok": True}
        finally:
            engine.close()

    def test_auth_required_and_accepted(self, served):
        engine, base = self._start(served, auth_token="s3cret")
        try:
            _, code = self._get(f"{base}/stats")
            assert code == 401
            _, code = self._get(f"{base}/stats", token="wrong")
            assert code == 401
            body, code = self._get(f"{base}/stats", token="s3cret")
            assert code == 200 and "albums" in body
            # liveness probes can't attach headers: /healthz stays open
            _, code = self._get(f"{base}/healthz")
            assert code == 200
        finally:
            engine.close()

    def test_rate_limit_429(self, served):
        engine, base = self._start(served, max_requests_per_sec=3)
        try:
            codes = [self._get(f"{base}/stats")[1] for _ in range(8)]
            assert codes.count(200) == 3
            assert codes.count(429) == 5
            # the health endpoint is exempt — an overloaded instance is not dead
            assert self._get(f"{base}/healthz")[1] == 200
        finally:
            engine.close()

    def test_per_client_limit_isolates_greedy_client(self):
        """Pure limiter: a client that exhausts ITS budget is refused while
        other clients (and the global budget) are untouched."""
        from fvta_memexqa_tpu.serve import RateLimiter

        lim = RateLimiter(None, max_per_client_per_sec=2)
        assert lim.allow("greedy") and lim.allow("greedy")
        assert not lim.allow("greedy")          # over its own budget
        assert lim.allow("polite")              # unaffected
        # composed with a global cap: BOTH must pass, budget consumed only on
        # admission (the refused greedy call above burned nothing globally)
        lim2 = RateLimiter(3, max_per_client_per_sec=2)
        assert lim2.allow("a") and lim2.allow("a")
        assert not lim2.allow("a")              # client cap
        assert lim2.allow("b")                  # global slot 3
        assert not lim2.allow("b")              # global cap

    def test_http_greedy_client_does_not_starve_others(self, served):
        """HTTP level: per-client limiting keyed by VERIFIED bearer token —
        a greedy client collects 429s while another token still gets 200s
        (round-2 verdict weak #8: the global limiter let one client starve
        everyone within budget)."""
        engine, base = TestAuthAndRateLimit._start(
            served, auth_token="alice,bob", max_rps_per_client=3)
        try:
            codes = [TestAuthAndRateLimit._get(f"{base}/stats", token="alice")[1]
                     for _ in range(8)]
            assert codes.count(200) == 3 and codes.count(429) == 5
            _, code = TestAuthAndRateLimit._get(f"{base}/stats", token="bob")
            assert code == 200                  # greedy alice cost bob nothing
            _, code = TestAuthAndRateLimit._get(f"{base}/stats", token="evil")
            assert code == 401                  # unknown tokens still rejected
        finally:
            engine.close()

    def test_tls_serving(self, served, tmp_path):
        """--tls-cert/--tls-key serve HTTPS directly: a self-signed cert round
        trips /healthz over TLS and plain http is refused on that port."""
        import shutil
        import ssl
        import subprocess
        import urllib.error

        if shutil.which("openssl") is None:
            pytest.skip("openssl not available to mint a test cert")
        cert = str(tmp_path / "c.pem")
        key = str(tmp_path / "k.pem")
        subprocess.run(
            ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
             "-keyout", key, "-out", cert, "-days", "1", "-subj",
             "/CN=127.0.0.1"], check=True, capture_output=True)
        engine, base = self._start(served, tls_cert=cert, tls_key=key)
        try:
            url = base.replace("http://", "https://") + "/healthz"
            ctx = ssl.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE  # self-signed test cert
            body = json.load(urllib.request.urlopen(url, timeout=10,
                                                    context=ctx))
            assert body == {"ok": True}
            # plain http against the TLS port dies in the handshake — surfaced
            # as URLError or a raw ConnectionReset depending on timing; both
            # are OSErrors
            with pytest.raises(OSError):
                urllib.request.urlopen(f"{base}/healthz", timeout=5)
        finally:
            engine.close()

    def test_rate_limiter_window_slides(self):
        from fvta_memexqa_tpu.serve import RateLimiter

        rl = RateLimiter(2)
        assert rl.allow() and rl.allow() and not rl.allow()
        rl._times = [t - 1.5 for t in rl._times]  # age the window
        assert rl.allow()


class TestHardening:
    """Round-1 verdict item 7: LRU eviction, 503 on timeout, cache persistence,
    load test with a latency bound."""

    def test_lru_eviction_respects_byte_budget_and_reencodes(self, served,
                                                             small_config):
        model, params, shared, store, albums, feats = served
        one = AlbumStore._entry_bytes(*next(iter(store._store.values())))
        budget = int(one * 2.5)  # room for 2 entries
        s2 = AlbumStore(small_config, model, params, shared, store.vocab,
                        max_bytes=budget)
        order = sorted(albums)
        for aid in order[:3]:
            s2.ingest(albums[aid], feats)
        assert s2.num_albums == 2 and s2.evictions == 1
        assert s2.cache_bytes <= budget
        # the evicted album (order[0]) is still answerable: re-encoded on
        # demand from the retained host inputs — eviction is a perf event,
        # never a silent zero-context answer
        h, m, found = s2.get_stacked([order[0]])
        assert found == 1 and s2.reencodes == 1
        assert order[0] in s2._store and s2.cache_bytes <= budget
        n_mod = 6
        np.testing.assert_array_equal(np.asarray(h[:n_mod]),
                                      np.asarray(store._store[order[0]][0]))
        # re-inserting order[0] evicted order[1] (the LRU); touching order[2]
        # then makes order[0] the victim of the next ingest
        assert {*s2._store} == {order[2], order[0]}
        s2.get_stacked([order[2]])
        s2.ingest(albums[order[3]], feats)
        assert {*s2._store} == {order[2], order[3]}

    def test_reingest_same_album_does_not_grow(self, served, small_config):
        model, params, shared, store, albums, feats = served
        s2 = AlbumStore(small_config, model, params, shared, store.vocab)
        a = albums["album0"]
        s2.ingest(a, feats)
        b1 = s2.cache_bytes
        s2.ingest(a, feats)
        assert s2.cache_bytes == b1 and s2.num_albums == 1

    def test_cache_persistence_roundtrip(self, served, small_config, tmp_path):
        model, params, shared, store, albums, feats = served
        path = str(tmp_path / "album_cache")
        store.save(path)
        s2 = AlbumStore(small_config, model, params, shared, store.vocab)
        n = s2.load(path)
        assert n == store.num_albums
        for aid in albums:
            h1, m1, k1 = store.get_stacked([aid])
            h2, m2, k2 = s2.get_stacked([aid])
            assert k1 == k2 == 1
            np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
            np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    def test_max_pending_sheds_immediately(self, served):
        """Beyond max_pending queued asks, new requests fail FAST with the
        retryable overload error instead of waiting out their timeout."""
        import time

        from fvta_memexqa_tpu.serve import EngineOverloadedError

        *_, store, albums, feats = served
        engine = QAEngine(store, batch_size=2, max_pending=1)
        engine._stop.set()              # freeze the worker → queue backs up
        engine._worker.join(timeout=5)
        try:
            def slow_ask():  # fills the single pending slot, then times out
                try:
                    engine.ask("q ?", ["a", "b", "c", "d"], [], timeout=3.0)
                except TimeoutError:
                    pass
            th = threading.Thread(target=slow_ask, daemon=True)
            th.start()
            time.sleep(0.2)             # let it enqueue
            t0 = time.perf_counter()
            with pytest.raises(EngineOverloadedError):
                engine.ask("q2 ?", ["a", "b", "c", "d"], [], timeout=30.0)
            assert time.perf_counter() - t0 < 1.0  # immediate, not timeout
            assert engine.shed == 1
            th.join(timeout=10)
        finally:
            engine.close()

    def test_eviction_prefers_reencodable_victims(self, served, small_config,
                                                  tmp_path):
        """Restored-from-disk entries (no retained inputs) are protected from
        eviction while re-encodable victims remain; an unrecoverable eviction
        is counted."""
        model, params, shared, store, albums, feats = served
        one = AlbumStore._entry_bytes(*next(iter(store._store.values())))
        order = sorted(albums)
        # save 2 albums to disk, restore into a budget-2 store (no inputs)
        src = AlbumStore(small_config, model, params, shared, store.vocab)
        for aid in order[:2]:
            src.ingest(albums[aid], feats)
        path = str(tmp_path / "c")
        src.save(path)
        s2 = AlbumStore(small_config, model, params, shared, store.vocab,
                        max_bytes=int(one * 2.5))
        s2.load(path)
        # ingest a 3rd (re-encodable) album: it must become the victim pool's
        # only member — the restored entries stay, no unrecoverable eviction
        s2.ingest(albums[order[2]], feats)
        assert order[0] in s2._store and order[1] in s2._store
        assert order[2] not in s2._store  # evicted itself (only re-encodable)
        assert s2.evictions_unrecoverable == 0
        # ...and it is still answerable via re-encode
        _, _, found = s2.get_stacked([order[2]])
        assert found == 1 and s2.reencodes == 1

    def test_failed_save_keeps_dirty(self, served, small_config, tmp_path,
                                     monkeypatch):
        model, params, shared, store, albums, feats = served
        s2 = AlbumStore(small_config, model, params, shared, store.vocab)
        s2.ingest(albums[sorted(albums)[0]], feats)
        import orbax.checkpoint as ocp

        def boom(self, *a, **k):
            raise IOError("disk full")

        monkeypatch.setattr(ocp.StandardCheckpointer, "save", boom)
        with pytest.raises(IOError):
            s2.save(str(tmp_path / "x"), only_if_dirty=True)
        monkeypatch.undo()
        # dirty survived the failure: the next periodic attempt still saves
        assert s2.save(str(tmp_path / "y"), only_if_dirty=True) is True

    def test_retained_inputs_bounded(self, served, small_config):
        model, params, shared, store, albums, feats = served
        s2 = AlbumStore(small_config, model, params, shared, store.vocab,
                        max_retained_inputs=2)
        for aid in sorted(albums)[:4]:
            s2.ingest(albums[aid], feats)
        assert len(s2._inputs) == 2  # host memory bounded (LRU)

    def test_save_only_if_dirty_skips_unchanged(self, served, small_config,
                                                tmp_path):
        """A freshly restored cache must not be re-fetched and rewritten; a
        runtime ingest marks it dirty again."""
        model, params, shared, store, albums, feats = served
        path = str(tmp_path / "cache_a")
        store.save(path)
        s2 = AlbumStore(small_config, model, params, shared, store.vocab)
        s2.load(path)
        path2 = str(tmp_path / "cache_b")
        assert s2.save(path2, only_if_dirty=True) is False
        assert not os.path.exists(os.path.join(path2, "album_ids.json"))
        s2.ingest(albums[sorted(albums)[0]], feats)
        assert s2.save(path2, only_if_dirty=True) is True
        assert s2.save(path2, only_if_dirty=True) is False  # clean again

    def test_ingest_racing_save_stays_dirty(self, served, small_config,
                                            tmp_path, monkeypatch):
        """An album ingested WHILE a save's write is in flight is excluded from
        that save's snapshot — it must remain dirty so the next periodic save
        persists it (lost-update race on the old boolean dirty flag)."""
        model, params, shared, store, albums, feats = served
        order = sorted(albums)
        s2 = AlbumStore(small_config, model, params, shared, store.vocab)
        s2.ingest(albums[order[0]], feats)
        import orbax.checkpoint as ocp

        real_save = ocp.StandardCheckpointer.save

        def racing_save(self_c, *a, **k):
            # the snapshot is already taken; this ingest mutates the store
            # mid-write and must survive as dirty
            s2.ingest(albums[order[1]], feats)
            return real_save(self_c, *a, **k)

        monkeypatch.setattr(ocp.StandardCheckpointer, "save", racing_save)
        assert s2.save(str(tmp_path / "r"), only_if_dirty=True) is True
        monkeypatch.undo()
        # order[1] was not in the written snapshot → store must still be dirty
        assert s2.save(str(tmp_path / "r2"), only_if_dirty=True) is True
        with open(os.path.join(str(tmp_path / "r2"), "album_ids.json")) as f:
            import json as _json

            assert set(_json.load(f)) == {order[0], order[1]}
        assert s2.save(str(tmp_path / "r3"), only_if_dirty=True) is False

    def test_query_refreshes_input_retention(self, served, small_config):
        """A device-cache HIT must also refresh the retained-inputs LRU:
        otherwise the hottest albums' inputs age out first and their eventual
        device eviction becomes unrecoverable."""
        model, params, shared, store, albums, feats = served
        order = sorted(albums)
        s2 = AlbumStore(small_config, model, params, shared, store.vocab,
                        max_retained_inputs=2)
        s2.ingest(albums[order[0]], feats)
        s2.ingest(albums[order[1]], feats)
        s2.get_stacked([order[0]])          # store hit → order[0] is hottest
        s2.ingest(albums[order[2]], feats)  # inputs LRU evicts ONE entry
        assert order[0] in s2._inputs       # refreshed by the query
        assert order[1] not in s2._inputs   # the actual coldest aged out

    def test_timeout_raises_and_maps_to_503(self, served):
        import socket
        import time
        import urllib.error

        *_, store, albums, feats = served
        engine = QAEngine(store, batch_size=2, batch_window_ms=1.0)
        engine._stop.set()              # freeze the worker -> asks time out
        engine._worker.join(timeout=5)
        try:
            with pytest.raises(TimeoutError):
                engine.ask("q ?", ["a", "b", "c", "d"], [], timeout=0.2)

            from fvta_memexqa_tpu import serve as serve_mod

            s = socket.socket()
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
            s.close()
            orig_ask = engine.ask
            engine.ask = lambda *a, **k: orig_ask(*a, timeout=0.2)
            th = threading.Thread(target=serve_mod.serve_http,
                                  args=(engine, store, feats, port), daemon=True)
            th.start()
            time.sleep(0.3)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/ask",
                data=json.dumps({"question": "q", "choices": ["a", "b", "c", "d"],
                                 "album_ids": []}).encode(),
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(req, timeout=10)
                code = 200
            except urllib.error.HTTPError as e:
                code = e.code
            assert code == 503
        finally:
            engine.close()

    def test_load_p95_under_bound(self, served):
        """N threads x M asks each; p95 stays under a (generous, CPU) bound and
        every request succeeds."""
        *_, store, albums, feats = served
        engine = QAEngine(store, batch_size=8, batch_window_ms=3.0)
        n_threads, m_asks = 8, 5
        errors = []

        def worker(i):
            for j in range(m_asks):
                aid = f"album{(i + j) % 3}"
                a = albums[aid]
                try:
                    r = engine.ask(f"what year was {a.title} ?",
                                   ["2007", "2009", "2011", "2013"], [aid],
                                   timeout=60.0)
                    assert "answer" in r
                except Exception as e:  # noqa: BLE001 - collected for the assert
                    errors.append(repr(e))

        try:
            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(n_threads)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            assert not errors, errors
            assert engine.stats["questions"] == n_threads * m_asks
            stats = engine.latency_stats()
            assert stats["p95_ms"] is not None and stats["p95_ms"] < 30_000
        finally:
            engine.close()


class TestPackIngestion:
    """Packed albums addressable by raw id with NO --raw-albums side channel:
    attach_pack registers the pack's album_ids → shared-table rows, ingest_pack
    batch-encodes them, and evicted/lazy entries re-encode from their row.
    Closes the silent zero-context gap: predict/serve against a packdir used to
    report albums_found=0 for the pack's own albums."""

    def test_pack_ingest_matches_raw_ingest(self, served, packed_synth):
        model, params, shared, store, albums, feats = served
        s2 = AlbumStore(store.cfg, model, params, shared, store.vocab)
        n = s2.attach_pack(packed_synth)
        assert n == len(albums)
        assert s2.ingest_pack() == len(albums)
        assert s2.num_albums == len(albums)
        for aid in albums:
            h_raw, m_raw = store._store[aid]
            h_pack, m_pack = s2._store[aid]
            # photo-table fast path vs in-model projection: identical math,
            # batched differently (same tolerance as the batch-path parity test)
            np.testing.assert_allclose(np.asarray(h_pack), np.asarray(h_raw),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(m_pack), np.asarray(m_raw))

    def test_lazy_pack_album_answerable(self, served, packed_synth):
        """Without ingest_pack (predict's preingest=False path), a pack album
        referenced by a query is encoded from its row on first use."""
        model, params, shared, store, albums, feats = served
        s2 = AlbumStore(store.cfg, model, params, shared, store.vocab)
        s2.attach_pack(packed_synth)
        assert s2.num_albums == 0
        h, m, found = s2.get_stacked(["album0"])
        assert found == 1 and s2.reencodes == 1 and s2.num_albums == 1
        n_mod = 6
        np.testing.assert_allclose(np.asarray(h[:n_mod]),
                                   np.asarray(store._store["album0"][0]),
                                   rtol=1e-5, atol=1e-5)
        engine = QAEngine(s2, batch_size=2, batch_window_ms=1.0)
        try:
            a0 = albums["album0"]
            res = engine.ask(f"where did we go on {a0.title} ?",
                             [a0.where, "nowhere", "space", "atlantis"],
                             ["album0"])
            assert res["albums_found"] == 1
        finally:
            engine.close()

    def test_pack_albums_survive_eviction(self, served, packed_synth):
        """Pack entries count as re-encodable eviction victims and never go
        unrecoverable, even with no retained host inputs."""
        model, params, shared, store, albums, feats = served
        one = AlbumStore._entry_bytes(*next(iter(store._store.values())))
        s2 = AlbumStore(store.cfg, model, params, shared, store.vocab,
                        max_bytes=int(one * 2.5))
        s2.attach_pack(packed_synth)
        s2.ingest_pack()
        assert s2.num_albums == 2  # budget-evicted down from len(albums)
        assert s2.evictions == len(albums) - 2
        assert s2.evictions_unrecoverable == 0
        for aid in sorted(albums):  # every album still answerable
            _, _, found = s2.get_stacked([aid])
            assert found == 1
        assert s2.cache_bytes <= int(one * 2.5)

    def test_attach_pack_without_album_ids_meta(self, served, packed_synth):
        """Packs from before meta["album_ids"] degrade to raw/HTTP ingestion."""
        import dataclasses

        model, params, shared, store, albums, feats = served
        old = dataclasses.replace(
            packed_synth,
            meta={k: v for k, v in packed_synth.meta.items() if k != "album_ids"})
        s2 = AlbumStore(store.cfg, model, params, shared, store.vocab)
        assert s2.attach_pack(old) == 0
        assert s2.ingest_pack() == 0
        _, _, found = s2.get_stacked(["album0"])
        assert found == 0
