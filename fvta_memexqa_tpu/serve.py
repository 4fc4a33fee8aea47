"""Serving: streaming album ingestion + concurrent question answering.

BASELINE.json config 5: "Batched multi-album serving: streaming album ingestion with
on-TPU preprocessing + concurrent question answering". The reference has no serving
path at all (SURVEY.md section 3.5) — this is a new capability layered on the split
model (models/fvta.py encode_context / answer):

- AlbumStore.ingest(): tokenize + pack ONE album on the host (ids only), then run the
  jitted album encoder on device and cache the resulting [6, T, 2H] context states in
  HBM. Albums are encoded exactly once, no matter how many questions hit them —
  amortizing the expensive context encoders, which dominate the full forward.
- QAEngine.ask(): thread-safe; requests are micro-batched (collected for a few ms or
  until the batch is full) and answered in ONE jitted query-side call over the cached
  album encodings. Query latency therefore excludes all album-side compute.
- serve_http(): stdlib ThreadingHTTPServer with POST /albums, POST /ask, GET /stats.

CLI: python -m fvta_memexqa_tpu.cli serve <packdir> <rundir> [--port 8777]
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from fvta_memexqa_tpu.config import Config, MODALITIES, NUM_CHOICES
from fvta_memexqa_tpu.data.device_prepro import ModelInputs, SharedTables
from fvta_memexqa_tpu.data.pack import ALBUM_TEXT_FIELDS, _album_text, _encode_text
from fvta_memexqa_tpu.data.schema import Album
from fvta_memexqa_tpu.data.tokenize import tokenize
from fvta_memexqa_tpu.data.vocab import Vocab
from fvta_memexqa_tpu.models.fvta import FVTAModel


def vocab_view(meta: dict) -> Vocab:
    """Reconstruct a tokenization-only Vocab from pack metadata (no embedding).

    Includes the packer's extended eval-time lexicon (pack.py), so serve-time text
    containing words the packer saw anywhere resolves to extended rows (UNK word
    embedding + real chars) instead of bare UNK."""
    return Vocab(
        word2idx={**meta["word2idx"], **meta.get("ext_word2idx", {})},
        char2idx=meta["char2idx"],
        num_glove=meta["data_config"]["num_glove_words"],
        emb_init=np.zeros((0, 0), np.float32),
    )


def _single_album_inputs(cfg: Config, vocab: Vocab, album: Album,
                         photo_feats: dict[str, np.ndarray]) -> ModelInputs:
    """Host-side pack of ONE album into a fixed-shape N=1, A=1 ModelInputs (query
    fields zeroed). Mirrors pack.py's album tables, but built on the fly."""
    d = cfg.data
    P, Ts, Tt, W = d.max_photos, d.max_sent_len, d.max_album_text_len, d.max_word_len
    feats = np.zeros((1, 1, P, d.image_feat_dim), np.float32)
    pmask = np.zeros((1, 1, P), bool)
    ptw = np.zeros((1, 1, P, Ts), np.int32)
    ptc = np.zeros((1, 1, P, Ts, W), np.int32)
    ptm = np.zeros((1, 1, P, Ts), bool)
    atw = np.zeros((1, 1, 4, Tt), np.int32)
    atc = np.zeros((1, 1, 4, Tt, W), np.int32)
    atm = np.zeros((1, 1, 4, Tt), bool)
    # Same compaction as pack.py: photos with features move to the front (titles
    # travel with their photos), then titled slots compact to the front of the
    # title time axis — every LSTM time mask must be a contiguous prefix.
    kept = [(pid, title) for pid, title in zip(album.photo_ids, album.photo_titles)
            if pid in photo_feats][:P]
    for p, (pid, title) in enumerate(kept):
        f = np.asarray(photo_feats[pid], np.float32).reshape(-1)
        if f.shape[0] != d.image_feat_dim:
            raise ValueError(f"photo {pid}: feat dim {f.shape[0]} != {d.image_feat_dim}")
        feats[0, 0, p] = f
        pmask[0, 0, p] = True
        w, c, m = _encode_text(tokenize(title), vocab, Ts, W)
        ptw[0, 0, p], ptc[0, 0, p], ptm[0, 0, p] = w, c, m
    t_order = np.argsort(~ptm[0, 0].any(axis=-1), kind="stable")
    ptw[0, 0], ptc[0, 0], ptm[0, 0] = ptw[0, 0, t_order], ptc[0, 0, t_order], ptm[0, 0, t_order]
    for fi, fname in enumerate(ALBUM_TEXT_FIELDS):
        w, c, m = _encode_text(tokenize(_album_text(album, fname)), vocab, Tt, W)
        atw[0, 0, fi], atc[0, 0, fi], atm[0, 0, fi] = w, c, m

    z = np.zeros
    return ModelInputs(
        q_words=z((1, d.max_question_len), np.int32),
        q_chars=z((1, d.max_question_len, W), np.int32),
        q_mask=z((1, d.max_question_len), bool),
        choice_words=z((1, NUM_CHOICES, d.max_answer_len), np.int32),
        choice_chars=z((1, NUM_CHOICES, d.max_answer_len, W), np.int32),
        choice_mask=z((1, NUM_CHOICES, d.max_answer_len), bool),
        photo_feats=feats, photo_mask=pmask,
        photo_title_words=ptw, photo_title_chars=ptc, photo_title_mask=ptm,
        album_text_words=atw, album_text_chars=atc, album_text_mask=atm,
        album_mask=np.ones((1, 1), bool),
        label=z(1, np.int32), ex_mask=np.ones(1, bool),
    )


def _quant_h(h, mode: str):
    """f32 h block → its cached representation (see AlbumStore cache_dtype).

    int8 entries are a {"q": int8, "s": f32 per-row scale} pytree — everything
    downstream (device_put, orbax save/restore, byte accounting) treats the
    entry as a pytree, so the representation never leaks past _dequant_h."""
    if isinstance(h, dict):
        return h  # already encoded (cache restore path)
    if mode == "int8":
        s = jnp.max(jnp.abs(h), axis=-1, keepdims=True).astype(jnp.float32)
        s = jnp.where(s == 0, jnp.float32(127.0), s) / 127.0  # all-pad rows
        return {"q": jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8),
                "s": s}
    return h.astype(jnp.bfloat16 if mode == "bfloat16" else jnp.float32)


def _dequant_h(e):
    """Cached representation → f32 (exact for f32/bf16 entries)."""
    if isinstance(e, dict):
        return e["q"].astype(jnp.float32) * e["s"]
    return e.astype(jnp.float32)


class AlbumStore:
    """Thread-safe LRU cache: album_id → encoded context states on device.

    Hardening (round-1 verdict item 7): entries are evicted least-recently-USED
    first once the byte budget is exceeded (queries touch entries), and the
    whole cache round-trips to disk (save/load) so a restarted server skips
    re-encoding its albums."""

    def __init__(self, cfg: Config, model: FVTAModel, params, shared: SharedTables,
                 vocab: Vocab, max_bytes: int | None = None, mesh=None,
                 max_retained_inputs: int = 4096, shard_cache: bool = False,
                 cache_dtype: str = "float32"):
        from collections import OrderedDict

        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        # cache_dtype shrinks the per-album cache footprint (the h states
        # dominate; masks stay bool): encodings are compressed on _put and
        # restored to f32 on the query side (get_stacked). The encode itself
        # stays f32 — only the CACHED copy is rounded, one rounding per value.
        #   bfloat16 — 0.5x bytes, plain cast.
        #   int8     — ~0.26x bytes: symmetric per-(modality,timestep)-row
        #              max-abs quantization (_quant_h). LSTM outputs are
        #              bounded (h = o*tanh(c)), so a per-row scale keeps ~8
        #              significant bits across each 2H-channel row.
        # Accuracy impact measured in tests/test_serve (identical top-1 on the
        # synthetic pack for both; probs within the rounding noise).
        if cache_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unknown cache_dtype {cache_dtype!r} "
                             "(expected float32 | bfloat16 | int8)")
        self._cache_mode = cache_dtype
        # Cache-sharded multi-chip serving (ROADMAP #8): place each album's
        # encoded states on ONE mesh device (hash of the album id → home
        # device), so aggregate cache capacity scales with the mesh instead of
        # replicating. The query step fetches the few referenced entries over
        # ICI (device-to-device), which is cheap next to the answer compute;
        # the hash is deterministic so a restored cache (load()) redistributes
        # identically across restarts. Replicated (shard_cache=False) remains
        # the default — right whenever the corpus fits one chip (DESIGN.md).
        self.shard_cache = shard_cache
        if shard_cache:
            if mesh is None:
                raise ValueError("shard_cache requires a device mesh (--dp N)")
            self._cache_devices = list(mesh.devices.flat)
            self._dev_bytes = [0] * len(self._cache_devices)
            self._home: dict[str, int] = {}
        if mesh is not None:
            # Multi-chip serving: replicate the (small) params/tables across the
            # mesh once; the query step then shards its micro-batch over "data"
            # (QAEngine), XLA inserting the collectives. The album cache stays
            # replicated — ~115 KB per album, thousands fit per chip.
            from fvta_memexqa_tpu.parallel.mesh import replicated

            params = jax.device_put(params, replicated(mesh))
            shared = jax.device_put(shared, replicated(mesh))
        self.params = params
        self.shared = shared
        self.vocab = vocab
        self.max_bytes = max_bytes
        self.max_retained_inputs = max_retained_inputs
        self.evictions = 0
        self.evictions_unrecoverable = 0  # victim had no retained inputs
        self.reencodes = 0
        self._bytes = 0
        # Dirty tracking is a monotonic generation counter, not a boolean: save()
        # snapshots the store and writes OUTSIDE the lock, so an album ingested
        # while the write is in flight must stay dirty. _gen bumps on every
        # unsaved mutation; _saved_gen records the generation the last completed
        # save captured. dirty <=> _gen != _saved_gen.
        self._gen = 0
        self._saved_gen = 0
        self._store: "OrderedDict[str, tuple[jnp.ndarray, jnp.ndarray]]" = OrderedDict()
        # raw album id → shared-table row, for packs that record their album
        # ids (pack.py meta["album_ids"]); filled by attach_pack(). A pack-row
        # album is always re-encodable from the HBM-resident shared tables, so
        # it never needs host-side retained inputs.
        self._pack_rows: dict[str, int] = {}
        self._encode_rows = None  # jit'd row-encoder, built by attach_pack()
        # Host-side packed inputs per ingested album (numpy, OUTSIDE the device
        # byte budget, bounded by max_retained_inputs with LRU eviction): an
        # evicted album with retained inputs re-encodes on demand at query
        # time. Albums restored from a saved cache (load()) or whose inputs
        # aged out of the bound become unanswerable if the DEVICE cache also
        # evicts them (device eviction prefers re-encodable victims, and an
        # unrecoverable eviction is counted in evictions_unrecoverable).
        self._inputs: "OrderedDict[str, ModelInputs]" = OrderedDict()
        self._lock = threading.Lock()
        a1_cfg = cfg.replace(data=cfg.data.__class__(
            **{**cfg.data.__dict__, "max_albums": 1}))
        a1_model = FVTAModel(cfg=a1_cfg)

        # Params are frozen while serving: the vocab embed table is computed
        # ONCE here and reused by every ingest and every query batch.
        from fvta_memexqa_tpu.train import make_vocab_table

        self.vocab_table = make_vocab_table(model, params, shared)

        @jax.jit
        def _encode(p, sh, mi, vt):
            return a1_model.apply(p, sh, mi, train=False, vocab_table=vt,
                                  method=a1_model.encode_context)

        self._encode = _encode

    @staticmethod
    def _entry_bytes(h, m) -> int:
        return int(sum(x.size * x.dtype.itemsize
                       for x in jax.tree.leaves((h, m))))

    def _home_device(self, album_id: str) -> int:
        """Deterministic home-device index for a sharded-cache entry."""
        import zlib

        return zlib.crc32(album_id.encode()) % len(self._cache_devices)

    def _put(self, album_id: str, h, m, mark_dirty: bool = True) -> None:
        """mark_dirty=False for values already reflected on disk (restores and
        on-demand re-encodes of previously saved entries) — otherwise re-encode
        churn under budget pressure would make the periodic saver refetch and
        rewrite the whole cache every period."""
        h = _quant_h(h, self._cache_mode)
        di = None
        if self.shard_cache:
            # commit the entry to its home device BEFORE taking the lock (the
            # device_put is async; only the bookkeeping needs the lock)
            di = self._home_device(album_id)
            dev = self._cache_devices[di]
            h = jax.device_put(h, dev)
            m = jax.device_put(m, dev)
        with self._lock:
            if album_id in self._store:
                old = self._store.pop(album_id)
                ob = self._entry_bytes(*old)
                self._bytes -= ob
                if di is not None:
                    self._dev_bytes[self._home.pop(album_id)] -= ob
            self._store[album_id] = (h, m)
            nb = self._entry_bytes(h, m)
            self._bytes += nb
            if di is not None:
                self._home[album_id] = di
                self._dev_bytes[di] += nb
            if mark_dirty:
                self._gen += 1
            while (self.max_bytes is not None and self._bytes > self.max_bytes
                   and len(self._store) > 1):
                # Prefer LRU victims that CAN be re-encoded on demand (retained
                # inputs) — even the just-inserted entry, which stays answerable
                # via re-encode; an UNRECOVERABLE entry (restored from disk, no
                # inputs) is only evicted when no recoverable victim remains,
                # and that loss is counted.
                victim = next((k for k in self._store
                               if k in self._inputs or k in self._pack_rows),
                              None)
                if victim is None:
                    victim = next(iter(self._store))
                    self.evictions_unrecoverable += 1
                eh, em = self._store.pop(victim)
                vb = self._entry_bytes(eh, em)
                self._bytes -= vb
                if self.shard_cache:
                    self._dev_bytes[self._home.pop(victim)] -= vb
                self.evictions += 1
                if victim == album_id:
                    break  # the new entry itself was the only recoverable one

    def ingest(self, album: Album, photo_feats: dict[str, np.ndarray]) -> None:
        mi = _single_album_inputs(self.cfg, self.vocab, album, photo_feats)
        with self._lock:
            if album.album_id in self._inputs:
                self._inputs.pop(album.album_id)
            self._inputs[album.album_id] = mi       # host copy for re-encode
            while len(self._inputs) > self.max_retained_inputs:
                self._inputs.popitem(last=False)    # bound host memory (LRU)
        h, m = self._encode(self.params, self.shared,
                            jax.tree.map(jnp.asarray, mi), self.vocab_table)
        self._put(album.album_id, h[0], m[0])        # [6, T, 2H], [6, T]

    # ---- pack-resident albums ------------------------------------------------

    def attach_pack(self, packed) -> int:
        """Register a PackedDataset's albums as addressable by raw album id.

        The pack's shared tables already hold every album's encoded-id tensors
        (pack.py), so a packed album needs no host-side ModelInputs: encoding is
        a row gather (device_prepro.assemble) + encode_context, and an evicted
        entry re-encodes from the row on demand. Returns the number of albums
        registered (0 for packs from before meta["album_ids"])."""
        ids = packed.meta.get("album_ids") or []
        if not ids:
            return 0
        self._pack_rows = {aid: i + 1 for i, aid in enumerate(ids)}
        from fvta_memexqa_tpu.train import make_photo_table

        # frozen-param photo fast path: one contiguous-row gather per album
        # instead of P random 10KB rows (identical logits, parity-tested)
        self._photo_table = make_photo_table(self.model, self.params, self.shared)
        from fvta_memexqa_tpu.train import a1_config

        self._a1_cfg = a1_config(self.cfg)
        a1_model = FVTAModel(cfg=self._a1_cfg)

        # shared module-level jit (eval_cache): one encode_context trace per
        # model config process-wide, instead of a fresh closure per AlbumStore
        import functools

        from fvta_memexqa_tpu.eval_cache import _encode_album_jit
        from fvta_memexqa_tpu.train import canonical_model

        self._encode_rows = functools.partial(_encode_album_jit,
                                              canonical_model(a1_model))
        return len(ids)

    def _encode_pack_rows(self, rows: np.ndarray):
        """Encode shared-table rows → (h [n, 6, T, 2H], m [n, 6, T])."""
        import jax.numpy as jnp

        return self._encode_rows(self.params, self.shared,
                                 jnp.asarray(rows, jnp.int32),
                                 self.vocab_table, self._photo_table)

    def ingest_pack(self, batch_size: int = 64) -> int:
        """Pre-encode every attached pack album not already cached (batched —
        one encode_context call per `batch_size` albums). Pack entries never
        dirty the persistence cache: they are reproducible from the pack."""
        if not self._pack_rows:
            return 0
        with self._lock:
            missing = [a for a in self._pack_rows if a not in self._store]
        bs = min(batch_size, max(len(missing), 1))
        for start in range(0, len(missing), bs):
            chunk = missing[start : start + bs]
            rows = np.fromiter((self._pack_rows[a] for a in chunk), np.int64,
                               count=len(chunk))
            pad = bs - len(chunk)
            if pad:  # keep ONE jit shape across chunks (row 0 = pad album)
                rows = np.concatenate([rows, np.zeros(pad, np.int64)])
            h, m = self._encode_pack_rows(rows)
            for i, a in enumerate(chunk):
                self._put(a, h[i], m[i], mark_dirty=False)
        return len(missing)

    def get_stacked(self, album_ids: list[str]):
        """Cached encodings for album_ids, padded to max_albums: ([S, T, 2H], [S, T]).
        Touches the entries (LRU recency); an evicted-but-ingested album is
        re-encoded on demand (counted in self.reencodes)."""
        d = self.cfg.data
        n_mod = len(MODALITIES)
        entries = []
        for a in album_ids[: d.max_albums]:
            with self._lock:
                if a in self._store:
                    self._store.move_to_end(a)
                    if a in self._inputs:
                        # input retention must track QUERY recency too, or the
                        # hottest albums' inputs age out first and their eventual
                        # device eviction becomes unrecoverable
                        self._inputs.move_to_end(a)
                    entries.append(self._store[a])
                    continue
                mi = self._inputs.get(a)
                if mi is not None:
                    self._inputs.move_to_end(a)     # keep hot inputs retained
            if mi is not None:  # evicted: re-encode outside the lock
                h, m = self._encode(self.params, self.shared,
                                    jax.tree.map(jnp.asarray, mi),
                                    self.vocab_table)
                # not dirty: reproduces a value the last save already captured
                # (or the ingest-time dirty flag is still pending a save)
                self._put(a, h[0], m[0], mark_dirty=False)
                self.reencodes += 1
                # answers must not depend on cache state: serve the same
                # cache_dtype rounding a cached hit would have returned
                entries.append((_quant_h(h[0], self._cache_mode), m[0]))
            elif a in self._pack_rows:  # pack album: re-encode from its row
                h, m = self._encode_pack_rows(
                    np.asarray([self._pack_rows[a]], np.int64))
                self._put(a, h[0], m[0], mark_dirty=False)
                self.reencodes += 1
                entries.append((_quant_h(h[0], self._cache_mode), m[0]))
        if self.shard_cache and entries:
            # pull the referenced entries to one device (ICI device-to-device
            # fetch) — committed arrays on different devices cannot feed one
            # computation, and the answer step reshards the stack anyway
            dev0 = self._cache_devices[0]
            entries = [(jax.device_put(eh, dev0), jax.device_put(em, dev0))
                       for eh, em in entries]
        t, h2 = d.max_context_time, 2 * self.cfg.model.hidden_dim
        h = jnp.zeros((d.max_albums * n_mod, t, h2), jnp.float32)
        m = jnp.zeros((d.max_albums * n_mod, t), bool)
        for i, (eh, em) in enumerate(entries):
            h = h.at[i * n_mod : (i + 1) * n_mod].set(_dequant_h(eh))
            m = m.at[i * n_mod : (i + 1) * n_mod].set(em)
        return h, m, len(entries)

    # ---- persistence (orbax) ---------------------------------------------------

    def save(self, path: str, only_if_dirty: bool = False) -> bool:
        """Persist all cached encodings (orbax StandardSave). Returns whether a
        save happened (only_if_dirty skips the device fetch + rewrite when
        nothing changed since the last save/load — fetches are expensive
        through this box's tunnel)."""
        import orbax.checkpoint as ocp

        with self._lock:
            if only_if_dirty and self._gen == self._saved_gen:
                return False
            snap_gen = self._gen
            ids = list(self._store.keys())
            tree = {"h": [self._store[a][0] for a in ids],
                    "m": [self._store[a][1] for a in ids]}
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
        ckptr.close()
        with open(os.path.join(path, "album_ids.json"), "w") as f:
            json.dump(ids, f)
        with self._lock:
            # advanced only AFTER a successful write, and only to the generation
            # the snapshot captured — an ingest that raced the write bumped _gen
            # past snap_gen and correctly stays dirty for the next save
            self._saved_gen = max(self._saved_gen, snap_gen)
        return True

    def load(self, path: str) -> int:
        """Restore a saved cache; returns the number of albums loaded."""
        import orbax.checkpoint as ocp

        with open(os.path.join(path, "album_ids.json")) as f:
            ids = json.load(f)
        ckptr = ocp.StandardCheckpointer()
        tree = ckptr.restore(os.path.abspath(path))
        ckptr.close()
        # mark_dirty=False leaves _gen untouched: a store that was clean before
        # the load stays clean (restored state == on-disk state), and one with
        # unsaved entries stays dirty for the next periodic save.
        for a, h, m in zip(ids, tree["h"], tree["m"]):
            # int8 entries restore as their {"q","s"} pytree; _quant_h passes
            # an already-encoded dict through untouched, so a store configured
            # for float32/bfloat16 must dequantize here or it would silently
            # keep serving int8 rounding (and int8 byte accounting) against
            # the requested --cache-dtype (ADVICE r4). int8→int8 stays as-is;
            # the inverse mismatch (f32/bf16 array into an int8 store) is
            # already handled by _put's re-encode.
            if isinstance(h, dict):
                h = jax.tree.map(jnp.asarray, h)
                if self._cache_mode != "int8":
                    h = _dequant_h(h)
            else:
                h = jnp.asarray(h)
            self._put(a, h, jnp.asarray(m.astype(bool)
                                        if hasattr(m, "astype") else m),
                      mark_dirty=False)
        return len(ids)

    @property
    def num_albums(self) -> int:
        with self._lock:
            return len(self._store)

    @property
    def cache_bytes(self) -> int:
        with self._lock:
            return self._bytes

    @property
    def cache_bytes_per_device(self) -> list[int] | None:
        """Per-device cache footprint (sharded mode only) — the observable for
        hash-balance skew; sums to cache_bytes."""
        if not self.shard_cache:
            return None
        with self._lock:
            return list(self._dev_bytes)


@dataclass
class _Pending:
    question: str
    choices: list[str]
    album_ids: list[str]
    event: threading.Event = field(default_factory=threading.Event)
    result: dict | None = None


class EngineOverloadedError(TimeoutError):
    """Raised by ask() when the pending queue exceeds max_pending — the caller
    gets an IMMEDIATE retryable failure instead of queueing toward a timeout
    it will hit anyway (and whose inference would then run for nobody)."""


class QAEngine:
    """Micro-batching concurrent QA over an AlbumStore.

    max_pending: bound on queued requests; beyond it ask() sheds load
    immediately with EngineOverloadedError (HTTP 503). None = unbounded."""

    def __init__(self, store: AlbumStore, batch_size: int = 8,
                 batch_window_ms: float = 3.0, max_pending: int | None = None):
        self.store = store
        self.cfg = store.cfg
        self.batch_size = batch_size
        self.batch_window = batch_window_ms / 1e3
        self.max_pending = max_pending
        self.shed = 0
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        model = store.model

        def _answer_fn(p, sh, mi, h_ctx, ctx_mask, vt):
            out = model.apply(p, sh, mi, h_ctx, ctx_mask, train=False,
                              vocab_table=vt, method=model.answer)
            return out.logits, out.attention.seq_attn

        if store.mesh is not None:
            # DP-sharded query step: the padded micro-batch splits over the
            # mesh's "data" axis (batch_size must divide by it); params/tables
            # replicated, logits gathered back replicated.
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = store.mesh.shape["data"]
            if batch_size % dp:
                raise ValueError(
                    f"serving batch_size {batch_size} must be divisible by the "
                    f"mesh's data axis ({dp})")
            rep = NamedSharding(store.mesh, P())
            self._bsh = NamedSharding(store.mesh, P("data"))
            self._answer = jax.jit(_answer_fn, out_shardings=(rep, rep))
        else:
            self._bsh = None
            self._answer = jax.jit(_answer_fn)
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        self.stats = {"questions": 0, "batches": 0}
        self._latencies: list[float] = []  # rolling, most recent 1000

    def warmup(self) -> float:
        """Compile + run the answer step once on a dummy batch BEFORE taking
        traffic. Without this the first real micro-batch pays the full jit
        compile (~80 s cold on this box) while client timeouts expire behind
        it — measured in the scale load test. Returns the warmup seconds."""
        t0 = time.perf_counter()
        p = _Pending("warmup ?", ["a", "b", "c", "d"], [])
        self._run_batch([p])
        self.stats["questions"] -= 1  # don't count the dummy
        self.stats["batches"] -= 1
        return time.perf_counter() - t0

    def ask(self, question: str, choices: list[str], album_ids: list[str],
            timeout: float = 30.0) -> dict:
        if len(choices) != NUM_CHOICES:
            raise ValueError(f"need exactly {NUM_CHOICES} choices")
        if (self.max_pending is not None
                and self._queue.qsize() >= self.max_pending):
            self.shed += 1
            raise EngineOverloadedError(
                f"engine overloaded: {self._queue.qsize()} requests pending")
        p = _Pending(question, choices, album_ids)
        t0 = time.perf_counter()
        self._queue.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("inference timed out")
        self._latencies.append(time.perf_counter() - t0)
        if len(self._latencies) > 1000:
            del self._latencies[:-1000]
        return p.result  # type: ignore[return-value]

    def latency_stats(self) -> dict:
        if not self._latencies:
            return {"p50_ms": None, "p95_ms": None}
        s = sorted(self._latencies)
        return {"p50_ms": round(s[len(s) // 2] * 1e3, 3),
                "p95_ms": round(s[int(len(s) * 0.95)] * 1e3, 3)}

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)

    # ---- worker --------------------------------------------------------------

    def _encode_query(self, pending: list[_Pending]):
        d = self.cfg.data
        n = len(pending)
        W = d.max_word_len
        v = self.store.vocab
        qw = np.zeros((n, d.max_question_len), np.int32)
        qc = np.zeros((n, d.max_question_len, W), np.int32)
        qm = np.zeros((n, d.max_question_len), bool)
        cw = np.zeros((n, NUM_CHOICES, d.max_answer_len), np.int32)
        cc = np.zeros((n, NUM_CHOICES, d.max_answer_len, W), np.int32)
        cm = np.zeros((n, NUM_CHOICES, d.max_answer_len), bool)
        for i, p in enumerate(pending):
            qw[i], qc[i], qm[i] = _encode_text(tokenize(p.question), v,
                                               d.max_question_len, W)
            for ci, ch in enumerate(p.choices):
                cw[i, ci], cc[i, ci], cm[i, ci] = _encode_text(
                    tokenize(ch), v, d.max_answer_len, W)
        return qw, qc, qm, cw, cc, cm

    def _loop(self):
        d = self.cfg.data
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.batch_window
            while len(batch) < self.batch_size:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                self._run_batch(batch)
            except Exception as e:  # pragma: no cover - defensive
                for p in batch:
                    p.result = {"error": repr(e)}
                    p.event.set()

    def _run_batch(self, pending: list[_Pending]):
        d = self.cfg.data
        n = len(pending)
        bs = self.batch_size
        qw, qc, qm, cw, cc, cm = self._encode_query(pending)

        def pad(x):
            return np.pad(x, [(0, bs - n)] + [(0, 0)] * (x.ndim - 1))

        W = d.max_word_len
        z = np.zeros
        mi = ModelInputs(
            q_words=pad(qw), q_chars=pad(qc), q_mask=pad(qm),
            choice_words=pad(cw), choice_chars=pad(cc), choice_mask=pad(cm),
            photo_feats=z((bs, 1, 1, d.image_feat_dim), np.float32),
            photo_mask=z((bs, 1, 1), bool),
            photo_title_words=z((bs, 1, 1, d.max_sent_len), np.int32),
            photo_title_chars=z((bs, 1, 1, d.max_sent_len, W), np.int32),
            photo_title_mask=z((bs, 1, 1, d.max_sent_len), bool),
            album_text_words=z((bs, 1, 4, d.max_album_text_len), np.int32),
            album_text_chars=z((bs, 1, 4, d.max_album_text_len, W), np.int32),
            album_text_mask=z((bs, 1, 4, d.max_album_text_len), bool),
            album_mask=np.ones((bs, 1), bool),
            label=z(bs, np.int32), ex_mask=np.ones(bs, bool),
        )
        mi = jax.tree.map(jnp.asarray, mi)

        hs, ms, found = [], [], []
        for p in pending:
            h, m, k = self.store.get_stacked(p.album_ids)
            hs.append(h)
            ms.append(m)
            found.append(k)
        s, t = hs[0].shape[0], hs[0].shape[1]
        h2 = hs[0].shape[2]
        h_ctx = jnp.stack(hs + [jnp.zeros((s, t, h2))] * (bs - n))
        ctx_mask = jnp.stack(ms + [jnp.zeros((s, t), bool)] * (bs - n))
        if self._bsh is not None:
            # shard the micro-batch over the mesh's "data" axis (the cached
            # context states arrive replicated-committed; reshard explicitly)
            mi = jax.device_put(mi, self._bsh)
            h_ctx = jax.device_put(h_ctx, self._bsh)
            ctx_mask = jax.device_put(ctx_mask, self._bsh)

        logits, seq_attn = self._answer(self.store.params, self.store.shared, mi,
                                        h_ctx, ctx_mask, self.store.vocab_table)
        logits = np.asarray(logits)
        seq_attn = np.asarray(seq_attn)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        for i, p in enumerate(pending):
            best = int(np.argmax(logits[i]))
            p.result = {
                "answer": p.choices[best],
                "answer_index": best,
                "probs": [float(x) for x in probs[i]],
                "albums_found": found[i],
                "seq_attention": [float(x) for x in seq_attn[i]],
            }
            p.event.set()
        self.stats["questions"] += n
        self.stats["batches"] += 1


# ---- HTTP surface ------------------------------------------------------------


class RateLimiter:
    """Thread-safe sliding-window request limiter: global AND per-client.

    Serving hardening: the global cap bounds how many requests enter the
    engine per second; the per-client cap (keyed by auth token, falling back
    to remote address) stops ONE greedy client from consuming the whole
    global budget and starving everyone else — the round-2 verdict's gap in
    the purely global limiter. None = unlimited for either cap. A request is
    admitted only if BOTH caps pass, and consumes budget only when admitted."""

    def __init__(self, max_per_sec: float | None,
                 max_per_client_per_sec: float | None = None):
        self.max_per_sec = max_per_sec
        self.max_per_client = max_per_client_per_sec
        self._times: list[float] = []
        self._client_times: dict[str, list[float]] = {}
        self._lock = threading.Lock()

    @staticmethod
    def _prune(times: list[float], cutoff: float) -> None:
        while times and times[0] < cutoff:
            times.pop(0)

    def allow(self, client: str | None = None) -> bool:
        if self.max_per_sec is None and self.max_per_client is None:
            return True
        now = time.monotonic()
        cutoff = now - 1.0
        with self._lock:
            self._prune(self._times, cutoff)
            ct = None
            if self.max_per_client is not None and client is not None:
                ct = self._client_times.setdefault(client, [])
                self._prune(ct, cutoff)
                if len(ct) >= self.max_per_client:
                    return False
            if self.max_per_sec is not None and len(self._times) >= self.max_per_sec:
                return False
            self._times.append(now)
            if ct is not None:
                ct.append(now)
            # bound the per-client map: drop clients idle past the window
            if len(self._client_times) > 4096:
                self._client_times = {k: v for k, v in self._client_times.items()
                                      if v and v[-1] >= cutoff}
            return True


def serve_http(engine: QAEngine, store: AlbumStore,
               photo_feats: dict[str, np.ndarray], port: int = 8777,
               auth_token: str | None = None,
               max_requests_per_sec: float | None = None,
               max_rps_per_client: float | None = None,
               cache_dir: str | None = None,
               cache_save_period_s: float = 60.0,
               tls_cert: str | None = None, tls_key: str | None = None):
    """auth_token: if set, every request must carry
    `Authorization: Bearer <token>` (constant-time compare) or it gets 401.
    Comma-separated values issue one credential PER CLIENT — that's what makes
    per-client limiting identity-based rather than address-based.
    max_requests_per_sec: global sliding-window limit → 429 when exceeded.
    max_rps_per_client: same, per client. The key is the VERIFIED bearer token
    when auth is on (an unverified header would be spoofable — rotate fake
    tokens, dodge the limiter), else the remote address. One greedy client
    429s alone instead of starving the rest.
    cache_dir: persist the album cache there whenever it changed (checked every
    cache_save_period_s in a background thread), so runtime POST /albums
    ingests survive restarts.
    tls_cert/tls_key: PEM cert+key → serve HTTPS directly (stdlib ssl). For
    production the recommended setup is TLS termination at a reverse proxy in
    front of the loopback listener (docs/DESIGN.md "Serving TLS"); the direct
    flags cover single-box deployments without a proxy."""
    import hmac
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from fvta_memexqa_tpu.data.schema import parse_album_info

    if bool(tls_cert) != bool(tls_key):
        # half-specified TLS must be a startup error, never a silent fallback
        # to plaintext: auth tokens may only transit inside TLS (DESIGN.md
        # "Serving security"). Checked up front, before any serving state.
        raise ValueError("--tls-cert and --tls-key must be given together "
                         f"(got cert={tls_cert!r}, key={tls_key!r})")
    limiter = RateLimiter(max_requests_per_sec, max_rps_per_client)
    auth_tokens = ([t for t in auth_token.split(",") if t]
                   if auth_token else [])

    if cache_dir:
        def _saver():
            while True:
                time.sleep(cache_save_period_s)
                try:
                    if store.save(cache_dir, only_if_dirty=True):
                        print(f"album cache persisted ({store.num_albums} albums)",
                              flush=True)
                except Exception as e:  # pragma: no cover - disk/IO issues
                    print(f"album cache save failed: {e!r}", flush=True)

        threading.Thread(target=_saver, daemon=True).start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _gate(self) -> bool:
            """Auth + rate-limit preamble shared by every endpoint."""
            client = self.client_address[0]
            if auth_tokens:
                got = self.headers.get("Authorization", "")
                ok = False
                for t in auth_tokens:  # constant-time compare against each
                    if hmac.compare_digest(got.encode(),
                                           f"Bearer {t}".encode()):
                        ok = True
                        client = got  # VERIFIED token = client identity
                if not ok:
                    self._json(401, {"error": "unauthorized"})
                    return False
            if not limiter.allow(client):
                self._json(429, {"error": "rate limit exceeded, retry later"})
                return False
            return True

        def do_GET(self):  # noqa: D102 - handler
            if self.path == "/healthz":
                # liveness probe: exempt from auth (probes can't always attach
                # headers) and from the rate limiter (an overloaded-but-healthy
                # instance must not be marked down)
                self._json(200, {"ok": True})
                return
            if not self._gate():
                return
            if self.path == "/stats":
                self._json(200, {"albums": store.num_albums,
                                 "cache_bytes": store.cache_bytes,
                                 "cache_bytes_per_device":
                                     store.cache_bytes_per_device,
                                 "evictions": store.evictions,
                                 "evictions_unrecoverable":
                                     store.evictions_unrecoverable,
                                 "reencodes": store.reencodes,
                                 "shed": engine.shed,
                                 **engine.stats, **engine.latency_stats()})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self._gate():
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/ask":
                    res = engine.ask(req["question"], req["choices"],
                                     req.get("album_ids", []))
                    self._json(200, res)
                elif self.path == "/albums":
                    albums, errs = parse_album_info([req["album"]])
                    if errs or not albums:
                        self._json(400, {"error": errs or ["no album"]})
                        return
                    album = next(iter(albums.values()))
                    feats = dict(photo_feats)
                    for pid, vec in (req.get("photo_feats") or {}).items():
                        feats[pid] = np.asarray(vec, np.float32)
                    store.ingest(album, feats)
                    self._json(200, {"ingested": album.album_id,
                                     "albums": store.num_albums})
                else:
                    self._json(404, {"error": "unknown path"})
            except TimeoutError as e:
                # overload, not a client error: retryable 503
                self._json(503, {"error": repr(e)})
            except (KeyError, ValueError) as e:
                self._json(400, {"error": repr(e)})

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    scheme = "http"
    if tls_cert and tls_key:
        import ssl

        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(tls_cert, tls_key)
        httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
        scheme = "https"
    print(f"serving on {scheme}://127.0.0.1:{port}  "
          f"(POST /albums, POST /ask, GET /stats)", flush=True)
    httpd.serve_forever()


def build_engine(packdir: str, rundir: str, load_best: bool = True,
                 batch_size: int = 8, max_cache_bytes: int | None = None,
                 cache_dir: str | None = None, dp: int = 1,
                 max_pending: int | None = None, preingest: bool = True,
                 shard_cache: bool = False, cache_dtype: str = "float32"):
    """Load pack + checkpoint, pre-ingest all packed albums, return (engine, store).

    preingest batch-encodes every pack album into the store at startup, so
    `ask`/`predict` can reference them by raw album id with no --raw-albums
    side channel; packs from before meta["album_ids"] register 0 and still
    work via raw/HTTP ingestion. max_cache_bytes bounds the album-encoding
    cache (LRU eviction); cache_dir, if it holds a previously saved cache, is
    restored instead of re-encoding. dp > 1 serves over a data-parallel device
    mesh: params/tables replicated, each query micro-batch sharded over the
    mesh's "data" axis."""
    from fvta_memexqa_tpu.checkpoint import CheckpointManager
    from fvta_memexqa_tpu.config import load_config
    from fvta_memexqa_tpu.data.pack import load_pack
    from fvta_memexqa_tpu.data.pipeline import Dataset
    from fvta_memexqa_tpu.data.device_prepro import device_put_batch
    from fvta_memexqa_tpu.train import init_state

    packed = load_pack(packdir)
    cfg = load_config(f"{rundir}/config.json").replace(data=packed.cfg)
    shared = SharedTables.from_packed(packed.shared)
    model = FVTAModel(cfg=cfg)
    any_split = next(s for s in ("train", "val", "test") if s in packed.splits)
    batch = device_put_batch(next(iter(Dataset(packed, any_split).get_batches(
        cfg.train.eval_batch_size))))
    state = init_state(cfg, model, shared, batch)
    ckpt = CheckpointManager(rundir, cfg)
    state = ckpt.restore(state, best=load_best)
    vocab = vocab_view(packed.meta)
    mesh = None
    if dp > 1:
        from fvta_memexqa_tpu.config import MeshConfig
        from fvta_memexqa_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(MeshConfig(data_parallel=dp))
    store = AlbumStore(cfg, model, state.params, shared, vocab,
                       max_bytes=max_cache_bytes, mesh=mesh,
                       shard_cache=shard_cache, cache_dtype=cache_dtype)
    if cache_dir and os.path.exists(os.path.join(cache_dir, "album_ids.json")):
        n = store.load(cache_dir)
        print(f"restored {n} cached album encodings from {cache_dir}", flush=True)
    if store.attach_pack(packed) and preingest:
        n = store.ingest_pack()
        if n:
            print(f"pre-ingested {n} pack albums", flush=True)
    engine = QAEngine(store, batch_size=batch_size, max_pending=max_pending)
    w = engine.warmup()
    print(f"answer step warmed up in {w:.1f}s", flush=True)
    return engine, store, packed


def main(argv):
    import argparse

    # Serving pays a ~2-min cold jit behind its warmup without the persistent
    # compile cache (VERDICT r03 Missing #4); cli.main enables it too, but
    # serve.main is also a direct entry in tests/ops drills.
    if not os.environ.get("FVTA_NO_COMPILE_CACHE"):
        from fvta_memexqa_tpu.utils.jit_cache import enable_compile_cache

        enable_compile_cache()

    p = argparse.ArgumentParser(prog="fvta serve")
    p.add_argument("packdir")
    p.add_argument("rundir")
    p.add_argument("--port", type=int, default=8777)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--load-latest", action="store_true")
    p.add_argument("--max-cache-mb", type=int, default=None,
                   help="byte budget for the album-encoding cache (LRU eviction)")
    p.add_argument("--cache-dir", default=None,
                   help="persist/restore the album-encoding cache here")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel devices for the query step (multi-chip "
                        "serving; batch-size must divide by it)")
    p.add_argument("--shard-cache", action="store_true",
                   help="shard the album-encoding cache over the --dp mesh "
                        "(one home device per album, hash-distributed) — "
                        "aggregate cache capacity scales with the mesh for "
                        "corpora that outgrow one chip's HBM; default "
                        "replicates (right whenever one chip suffices)")
    p.add_argument("--auth-token", default=None,
                   help="require 'Authorization: Bearer <token>' on every "
                        "request; comma-separated values issue one credential "
                        "per client (enables identity-keyed per-client limits)")
    p.add_argument("--max-rps", type=float, default=None,
                   help="sliding-window request limit per second (429 beyond)")
    p.add_argument("--max-rps-per-client", type=float, default=None,
                   help="per-client request limit (keyed by bearer token, "
                        "else remote address); a greedy client 429s alone")
    p.add_argument("--tls-cert", default=None,
                   help="PEM certificate: serve HTTPS directly (else terminate "
                        "TLS at a reverse proxy — docs/DESIGN.md)")
    p.add_argument("--tls-key", default=None, help="PEM private key for --tls-cert")
    p.add_argument("--max-pending", type=int, default=None,
                   help="shed load (immediate 503) beyond this many queued asks")
    p.add_argument("--raw-albums", default=None,
                   help="album_info.json to pre-ingest (with --raw-photo-npz)")
    p.add_argument("--raw-photo-npz", default=None)
    p.add_argument("--cache-dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="dtype of CACHED album encodings: bfloat16 halves the "
                        "cache footprint, int8 (per-row max-abs quantization) "
                        "cuts it ~4x (that many more albums per byte budget / "
                        "per chip with --shard-cache) — rounding applies to "
                        "the cached states only; encode and answer math stay "
                        "f32 (accuracy delta measured in tests)")
    p.add_argument("--no-preingest", action="store_true",
                   help="skip batch-encoding the pack's own albums at startup "
                        "(they re-encode lazily per query instead)")
    args = p.parse_args(argv)

    engine, store, packed = build_engine(
        args.packdir, args.rundir, load_best=not args.load_latest,
        batch_size=args.batch_size,
        max_cache_bytes=args.max_cache_mb * 1 << 20 if args.max_cache_mb else None,
        cache_dir=args.cache_dir, dp=args.dp, max_pending=args.max_pending,
        preingest=not args.no_preingest, shard_cache=args.shard_cache,
        cache_dtype=args.cache_dtype)
    feats: dict[str, np.ndarray] = {}
    if args.raw_albums and args.raw_photo_npz:
        from fvta_memexqa_tpu.data.schema import parse_album_info

        albums, _ = parse_album_info(args.raw_albums)
        feats = dict(np.load(args.raw_photo_npz))
        for a in albums.values():
            store.ingest(a, feats)
        print(f"pre-ingested {store.num_albums} albums", flush=True)
    if args.cache_dir and store.save(args.cache_dir, only_if_dirty=True):
        print(f"saved album cache to {args.cache_dir}", flush=True)
    serve_http(engine, store, feats, port=args.port, auth_token=args.auth_token,
               max_requests_per_sec=args.max_rps,
               max_rps_per_client=args.max_rps_per_client,
               cache_dir=args.cache_dir,
               tls_cert=args.tls_cert, tls_key=args.tls_key)
