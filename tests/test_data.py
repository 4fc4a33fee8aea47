"""Data layer: tokenizer spec, schema parsing, pack/load round-trip, batching,
device-side assembly."""

import os

import numpy as np
import pytest

from fvta_memexqa_tpu.config import NUM_MODALITIES
from fvta_memexqa_tpu.data import (
    Dataset,
    SharedTables,
    assemble,
    make_synthetic,
    parse_album_info,
    parse_qas,
    tokenize,
)
from fvta_memexqa_tpu.data.device_prepro import device_put_batch
from fvta_memexqa_tpu.data.tokenize import PAD_ID, UNK_ID, word_to_char_ids
from fvta_memexqa_tpu.data.vocab import Vocab


class TestTokenize:
    def test_basic(self):
        assert tokenize("Hello, World!") == ["hello", ",", "world", "!"]

    def test_apostrophe_kept(self):
        assert tokenize("Don't stop") == ["don't", "stop"]

    def test_numbers_and_punct(self):
        assert tokenize("July 4, 2007 (10:30)") == [
            "july", "4", ",", "2007", "(", "10", ":", "30", ")",
        ]

    def test_empty(self):
        assert tokenize("") == []
        assert tokenize("   \n\t ") == []

    def test_char_ids_pad_truncate(self):
        c2i = {"a": 2, "b": 3}
        assert word_to_char_ids("ab", c2i, 4) == [2, 3, PAD_ID, PAD_ID]
        assert word_to_char_ids("abab", c2i, 2) == [2, 3]
        assert word_to_char_ids("ax", c2i, 3) == [2, UNK_ID, PAD_ID]


class TestSchema:
    def test_parse_qas_valid(self):
        qas, errs = parse_qas(
            [
                {
                    "question_id": "q1",
                    "question": "where?",
                    "answer": "paris",
                    "multiple_choices_4": ["paris", "oslo", "cairo", "lima"],
                    "album_ids": ["a1"],
                }
            ]
        )
        assert not errs and len(qas) == 1
        assert qas[0].label == 0

    def test_parse_qas_bad_rows_reported(self):
        qas, errs = parse_qas(
            [
                {"question_id": "q1", "answer": "x", "multiple_choices_4": ["a", "b"]},
                {"question_id": "q2", "answer": "z", "multiple_choices_4": ["a", "b", "c", "d"]},
            ]
        )
        assert len(qas) == 0 and len(errs) == 2

    def test_parse_albums_aligns_photo_lists(self):
        albums, errs = parse_album_info(
            [
                {
                    "album_id": "a1",
                    "album_title": "t",
                    "photo_ids": ["p1", "p2", "p3"],
                    "photo_titles": ["only one"],
                    "photo_gps": [[1.0, 2.0]],
                }
            ]
        )
        assert not errs
        a = albums["a1"]
        assert len(a.photo_titles) == 3 and a.photo_titles[1] == ""
        assert a.photo_gps == ((1.0, 2.0), None, None)


class TestVocab:
    def test_glove_frozen_layout(self):
        glove = {"cat": np.ones(4, np.float32), "dog": 2 * np.ones(4, np.float32)}
        v = Vocab.build(["cat", "dog", "newt", "cat"], glove, dim=4, seed=0)
        assert v.num_glove == 2
        # ids [2, 2+G) are glove rows, then OOV
        assert v.word_id("cat") in (2, 3) and v.word_id("newt") == 4
        np.testing.assert_array_equal(v.emb_init[v.word_id("cat")], glove["cat"])
        assert v.emb_init[PAD_ID].sum() == 0.0


class TestPack:
    def test_round_trip_shapes(self, packed_synth):
        cfg = packed_synth.cfg
        assert cfg.word_vocab_size > 0 and cfg.num_glove_words > 0
        tr = packed_synth.splits["train"]
        n = tr["label"].shape[0]
        assert tr["q_words"].shape == (n, cfg.max_question_len)
        assert tr["choice_words"].shape == (n, 4, cfg.max_answer_len)
        assert packed_synth.shared.photo_feats.shape[1] == cfg.image_feat_dim
        # pad rows are all-zero / unmasked
        assert not packed_synth.shared.album_photo_mask[0].any()
        assert packed_synth.num_examples("test") > 0

    def test_split_disjoint_and_complete(self, packed_synth):
        qids = [set(packed_synth.splits[s]["qid"].tolist()) for s in ("train", "val", "test")]
        assert not (qids[0] & qids[1]) and not (qids[0] & qids[2]) and not (qids[1] & qids[2])
        assert sum(len(q) for q in qids) == 24

    def test_explicit_val_ids_override_carving(self):
        """pack --val-ids: an explicit id set (album-level holdout for the
        focal corpus) becomes the val split verbatim; no random carving."""
        from fvta_memexqa_tpu.data.pack import split_qas

        qas, *_ = make_synthetic(seed=0)
        test_ids = {"q20", "q21"}
        val_ids = {"q0", "q5", "q19"}
        s = split_qas(qas, test_ids, val_fraction=0.5, seed=0, val_ids=val_ids)
        assert {q.question_id for q in s["val"]} == val_ids
        assert {q.question_id for q in s["test"]} == test_ids
        assert len(s["train"]) == len(qas) - len(val_ids) - len(test_ids)

    def test_focal_generator_schema_and_holdout(self, tmp_path):
        """make_focal_synthetic: raw-schema-valid, decoy present in choices of
        every focal question, evidence object absent from all album text, and
        the test/val splits hold out whole albums."""
        from fvta_memexqa_tpu.data.synthetic import (make_focal_synthetic,
                                                     write_raw_files)

        qas, albums, feats, test_ids, glove, val_ids = make_focal_synthetic(
            num_albums=8, photos_per_album=4, num_questions=40, seed=1)
        by_album: dict[str, set[str]] = {}
        for q in qas:
            split = ("test" if q.question_id in test_ids else
                     "val" if q.question_id in val_ids else "train")
            by_album.setdefault(q.album_ids[0], set()).add(split)
        for aid, splits in by_album.items():
            assert len(splits) == 1, f"{aid} leaks across splits: {splits}"
        n_focal = n_trapped = 0
        for qi, q in enumerate(qas):
            album = albums[q.album_ids[0]]
            text = " ".join([album.title, album.description, album.where,
                             album.when, *album.photo_titles])
            # focal kind identified by TEXT (the kind index mixes album and
            # sweep position — see make_focal_synthetic's kind comment)
            is_focal = (q.question.startswith("what did we photograph")
                        and "album say" not in q.question)
            if is_focal:  # answer only in photo FEATURES
                assert q.answer not in text.split()
                n_focal += 1
                if any(c in album.description.split() for c in q.choices
                       if c != q.answer):
                    n_trapped += 1
        # the decoy trap is in play for most focal questions (absent only
        # when the album's random decoy collides with the queried object)
        assert n_focal > 0 and n_trapped >= 0.6 * n_focal
        out = str(tmp_path / "focal_raw")
        write_raw_files(out, qas, albums, feats, test_ids, glove, val_ids)
        import os as _os

        assert _os.path.exists(_os.path.join(out, "val_question.ids"))

    def test_focal_kind_decouples_from_album_cycle(self):
        """focal_kind must never lock question kind to album identity: with
        the original fixed stride, num_albums ≡ 4 (mod 5) — including the
        library DEFAULT of 24 — cancelled the sweep offset (kind == owner % 5
        for every sweep), so an album's questions all shared one kind and the
        generators' per-album evidence/decoy structure silently degenerated.
        Each owner must see every kind across 5 sweeps; sizes where stride=1
        already decouples must keep the original formula bit-for-bit (all
        measured corpora: 8/16/32/96/240)."""
        from fvta_memexqa_tpu.data.synthetic import focal_kind

        for num_albums in (8, 14, 16, 19, 24, 32, 96, 240):
            for owner in range(num_albums):
                kinds = {focal_kind(owner + j * num_albums, num_albums)
                         for j in range(5)}
                assert len(kinds) == 5, (num_albums, owner, kinds)
        for num_albums in (8, 16, 32, 96, 240):
            for qi in range(num_albums * 6):
                assert focal_kind(qi, num_albums) == \
                    (qi + qi // num_albums) % 5

    def test_focal_generator_multi_album(self):
        """albums_per_question=K>1 (the multi-album regime, BASELINE.md "Focal
        ablation"): every question carries K distinct albums from the OWNER's
        split (no cross-split leakage through distractor contexts), the wrong
        choices of focal questions include a distractor album's planted
        object (pooled photo evidence is ambiguous by construction), and the
        evidence object never appears in ANY attached album's text."""
        from fvta_memexqa_tpu.data.synthetic import (focal_kind,
                                                     make_focal_synthetic)

        num_albums, K = 32, 3
        qas, albums, feats, test_ids, glove, val_ids, meta = (
            make_focal_synthetic(num_albums=num_albums, photos_per_album=4,
                                 num_questions=160, seed=5,
                                 albums_per_question=K, return_meta=True))
        n_test = max(1, round(num_albums * 0.25))
        n_val = max(1, round(num_albums * 0.125))

        def split_of(aid):
            i = int(aid[5:])
            return ("test" if i >= num_albums - n_test else
                    "val" if i >= num_albums - n_test - n_val else "train")

        n_focal = n_amb = 0
        for qi, q in enumerate(qas):
            assert len(q.album_ids) == K
            assert len(set(q.album_ids)) == K
            owner = f"album{qi % num_albums}"
            assert owner in q.album_ids
            assert len({split_of(a) for a in q.album_ids}) == 1
            assert len(set(q.choices)) == 4 and q.answer in q.choices
            if focal_kind(qi, num_albums) <= 1:
                n_focal += 1
                text = " ".join(
                    " ".join([albums[a].title, albums[a].description,
                              albums[a].where, albums[a].when,
                              *albums[a].photo_titles])
                    for a in q.album_ids)
                assert q.answer not in text.split()
                d_objs = {meta[a]["object"] for a in q.album_ids if a != owner}
                if d_objs & (set(q.choices) - {q.answer}):
                    n_amb += 1
        # distractor objects are among the wrong choices for most focal
        # questions (absent only when every distractor's object collides
        # with the owner's object or decoy)
        assert n_focal > 0 and n_amb >= 0.8 * n_focal

        with pytest.raises(ValueError, match="smallest album split"):
            make_focal_synthetic(num_albums=8, num_questions=8,
                                 albums_per_question=4)

    def test_deterministic(self, tmp_path):
        from fvta_memexqa_tpu.data import load_pack, pack
        from tests.conftest import small_data_config

        args = make_synthetic(seed=0)
        d1, d2 = str(tmp_path / "p1"), str(tmp_path / "p2")
        pack(*args, d1, small_data_config(), seed=0)
        pack(*args, d2, small_data_config(), seed=0)
        p1, p2 = load_pack(d1), load_pack(d2)
        np.testing.assert_array_equal(
            p1.splits["train"]["q_words"], p2.splits["train"]["q_words"]
        )
        np.testing.assert_array_equal(p1.shared.word_emb_init, p2.shared.word_emb_init)


class TestExtendedLexicon:
    """Eval-time OOV words get extended ids with REAL chars (ADVICE round 1:
    the vocab-table fast path must not lose the char-CNN OOV signal)."""

    def _pack_with_oov(self, tmp_path):
        import dataclasses

        from fvta_memexqa_tpu.data import load_pack, pack
        from tests.conftest import small_data_config

        qas, albums, feats, test_ids, glove = make_synthetic(seed=0)
        # inject a word that never appears in train text into a TEST question
        ti = next(i for i, q in enumerate(qas) if q.question_id in test_ids)
        qas[ti] = dataclasses.replace(qas[ti],
                                      question="where was the xylophoneword shot")
        out = str(tmp_path / "pack")
        pack(qas, albums, feats, test_ids, glove, out, small_data_config(), seed=0)
        return load_pack(out), qas[ti].question_id

    def test_oov_gets_extended_id_with_real_chars(self, tmp_path):
        from fvta_memexqa_tpu.data.tokenize import word_to_char_ids

        packed, qid = self._pack_with_oov(tmp_path)
        cfg, meta = packed.cfg, packed.meta
        assert cfg.extended_vocab_size > cfg.word_vocab_size
        assert "xylophoneword" in meta["ext_word2idx"]
        ext_id = meta["ext_word2idx"]["xylophoneword"]
        assert ext_id >= cfg.word_vocab_size
        row = np.where(packed.splits["test"]["qid"] == qid)[0][0]
        q_words = packed.splits["test"]["q_words"][row]
        q_chars = packed.splits["test"]["q_chars"][row]
        pos = np.where(q_words == ext_id)[0]
        assert pos.size == 1, f"expected one extended-id token, words={q_words}"
        expected = word_to_char_ids("xylophoneword", meta["char2idx"], cfg.max_word_len)
        np.testing.assert_array_equal(packed.shared.vocab_chars[ext_id], expected)
        # per-token chars == vocab_chars row (the bit-compat invariant's premise)
        np.testing.assert_array_equal(q_chars[pos[0]], expected)
        # no token in any split carries bare UNK (the lexicon covers everything)
        for s in ("train", "val", "test"):
            assert not (packed.splits[s]["q_words"] == 1).any()

    def test_vocab_chars_rows_match_per_token_chars(self, packed_synth):
        """Every packed token's chars must equal vocab_chars[word] — the premise
        that makes the vocab-table gather bit-compatible with per-token embed."""
        vc = packed_synth.shared.vocab_chars
        for s in ("train", "val", "test"):
            w = packed_synth.splits[s]["q_words"]
            c = packed_synth.splits[s]["q_chars"]
            m = packed_synth.splits[s]["q_mask"]
            np.testing.assert_array_equal(c[m], vc[w[m]])


class TestPackCompaction:
    """Pack-time compaction: LSTM time masks must be contiguous prefixes
    (ADVICE round 1: the Pallas scan derives masking from lengths)."""

    def test_missing_photo_and_untitled_mid_album(self, tmp_path):
        import dataclasses

        from fvta_memexqa_tpu.data import load_pack, pack
        from tests.conftest import small_data_config

        qas, albums, feats, test_ids, glove = make_synthetic(seed=0)
        a = albums["album0"]
        dropped = a.photo_ids[1]
        del feats[dropped]                       # mid-album photo without features
        titles = list(a.photo_titles)
        titles[2] = ""                           # untitled photo between titled ones
        albums["album0"] = dataclasses.replace(a, photo_titles=tuple(titles))
        out = str(tmp_path / "pack")
        pack(qas, albums, feats, test_ids, glove, out, small_data_config(), seed=0)
        packed = load_pack(out)
        sh = packed.shared

        # album0 is row 1 (sorted used-album order)
        pm = sh.album_photo_mask[1]
        assert pm.tolist() == [True, True, True, False]  # 3 kept, compacted front
        # temporal order preserved: kept photos are ids 0, 2, 3
        kept_ids = [a.photo_ids[0], a.photo_ids[2], a.photo_ids[3]]
        for slot, pid in enumerate(kept_ids):
            np.testing.assert_allclose(
                sh.photo_feats[sh.album_photo_idx[1, slot]], feats[pid], rtol=1e-6)
        # title time axis: kept titles are (t0, "", t3) → 2 titled slots, front
        tmask = sh.photo_title_mask[1].any(-1)
        assert tmask.tolist() == [True, True, False, False]

    def test_all_masks_are_prefixes(self, packed_synth):
        def prefix(m):
            m2 = m.reshape(-1, m.shape[-1])
            lens = m2.sum(-1)
            return np.array_equal(m2, np.arange(m2.shape[-1])[None] < lens[:, None])

        sh = packed_synth.shared
        assert prefix(sh.album_photo_mask)
        assert prefix(sh.photo_title_mask.any(-1))
        assert prefix(sh.album_text_mask)
        for s in ("train", "val", "test"):
            assert prefix(packed_synth.splits[s]["q_mask"])
            assert prefix(packed_synth.splits[s]["choice_mask"])
            assert prefix(packed_synth.splits[s]["album_mask"])


class TestPipeline:
    def test_batches_cover_all_examples_once(self, packed_synth):
        ds = Dataset(packed_synth, "train")
        seen = 0
        for b in ds.get_batches(batch_size=5, shuffle=True, seed=1):
            assert b.label.shape == (5,)
            seen += int(b.ex_mask.sum())
        assert seen == ds.n

    def test_shuffle_deterministic(self, packed_synth):
        ds = Dataset(packed_synth, "train")
        b1 = next(iter(ds.get_batches(4, shuffle=True, seed=3, epoch=2)))
        b2 = next(iter(ds.get_batches(4, shuffle=True, seed=3, epoch=2)))
        b3 = next(iter(ds.get_batches(4, shuffle=True, seed=3, epoch=3)))
        np.testing.assert_array_equal(b1.q_words, b2.q_words)
        assert not np.array_equal(b1.label, b3.label) or not np.array_equal(
            b1.q_words, b3.q_words
        )


class TestDevicePrepro:
    def test_assemble_shapes_and_masks(self, packed_synth):
        cfg = packed_synth.cfg
        shared = SharedTables.from_packed(packed_synth.shared)
        ds = Dataset(packed_synth, "train")
        batch = device_put_batch(next(iter(ds.get_batches(4))))
        mi = assemble(shared, batch)
        A, P, F = cfg.max_albums, cfg.max_photos, cfg.image_feat_dim
        assert mi.photo_feats.shape == (4, A, P, F)
        assert mi.album_text_words.shape == (4, A, 4, cfg.max_album_text_len)
        # padded albums contribute zero features and all-False masks
        pad_albums = ~np.asarray(mi.album_mask)
        feats = np.asarray(mi.photo_feats)
        masks = np.asarray(mi.photo_mask)
        for n in range(4):
            for a in range(A):
                if pad_albums[n, a]:
                    assert not masks[n, a].any()
                    assert np.abs(feats[n, a]).sum() == 0.0

    def test_real_photo_feats_roundtrip(self, packed_synth):
        shared = SharedTables.from_packed(packed_synth.shared)
        ds = Dataset(packed_synth, "train")
        batch = device_put_batch(next(iter(ds.get_batches(2))))
        mi = assemble(shared, batch)
        # first real photo of first real album must match the shared table row
        aidx = int(batch.album_idx[0, 0])
        pidx = int(packed_synth.shared.album_photo_idx[aidx, 0])
        np.testing.assert_allclose(
            np.asarray(mi.photo_feats)[0, 0, 0], packed_synth.shared.photo_feats[pidx]
        )


class TestQuirkRaw:
    """Checked-in miniature of the raw MemexQA schema (SURVEY.md §2) with
    realistic dirt — photo_ids missing from the feature npz, unicode/empty
    text fields, duplicate/empty album ids, references to albums that don't
    exist, evidence photos that never existed, wrong-typed fields. The day
    real JSON lands, pack + serve must degrade gracefully with row-scoped
    errors, never a crash (VERDICT r03 item 8)."""

    FIX = os.path.join(os.path.dirname(__file__), "fixtures", "quirk_raw")

    def _feats(self, dim=64, drop=("ph_h_missing", "ph_n0")):
        """Features for every fixture photo except `drop` (npz holes)."""
        rng = np.random.default_rng(7)
        pids = ["ph_c0", "ph_c1", "ph_c2", "ph_u0", "ph_u1", "ph_h0",
                "ph_h_missing", "ph_h2", "ph_h3", "ph_n0", "ph_d0", "ph_d1",
                "ph_x0", "ph_t0"]
        return {p: rng.normal(size=dim).astype(np.float32)
                for p in pids if p not in drop}

    def test_parse_qas_drops_bad_rows_with_reasons(self):
        qas, errs = parse_qas(os.path.join(self.FIX, "qas.json"))
        by_id = {q.question_id: q for q in qas}
        # 10 rows; exactly the 3-choice row and the answer-not-among-choices
        # row are dropped, each with a reason naming the defect
        assert len(qas) == 8 and len(errs) == 2
        assert any("choices" in e for e in errs)
        assert any("answer not among choices" in e for e in errs)
        assert "q_three_choices" not in by_id and "q_answer_missing" not in by_id
        # unicode survives verbatim
        assert by_id["q_unicode"].question == "où sommes-nous allés – café søndag 🌉 ?"
        assert by_id["q_unicode"].answer == "reykjavík"
        # wrong-typed fields coerce: int question, bare-string album_ids,
        # legacy "multiple_choices"/"choices" key spellings
        assert by_id["q_typed"].question == "12345"
        assert by_id["q_typed"].album_ids == ("a_typed",)
        assert by_id["q_typed"].choices == ("2017", "2007", "2009", "2011")
        assert by_id["q_empty_text"].question == ""
        # evidence ids referencing photos absent from everything still parse
        assert by_id["q_hole"].evidence_photo_ids == ("ph_h_missing",
                                                      "ph_never_existed")

    def test_parse_album_info_coerces_and_reports(self):
        albums, errs = parse_album_info(os.path.join(self.FIX, "album_info.json"))
        assert len(errs) == 1 and "album_id" in errs[0]
        assert set(albums) == {"a_clean", "a_unicode", "a_hole", "a_nophotos",
                               "a_dup", "a_typed"}
        # duplicate album_id: last occurrence wins, deterministically
        assert albums["a_dup"].title == "second copy"
        # wrong-typed fields coerce to strings / tuples
        t = albums["a_typed"]
        assert t.title == "42" and t.when == "2017" and t.where == ""
        assert t.description == "list valued description"
        assert t.photo_ids == ("ph_t0",)
        assert t.photo_gps == (None,)  # [7] is not a (lat, lon) pair
        # per-photo lists align and pad to len(photo_ids)
        u = albums["a_unicode"]
        assert u.photo_titles == ("naïve façade été", "")
        assert u.photo_gps == (None, (64.1, -21.9))  # ["bad","gps"] -> None
        assert albums["a_hole"].photo_gps == (None,) * 4

    def test_pack_load_with_npz_holes_and_ghost_albums(self, tmp_path):
        from fvta_memexqa_tpu.data import load_pack, pack
        from tests.conftest import small_data_config

        qas, _ = parse_qas(os.path.join(self.FIX, "qas.json"))
        albums, _ = parse_album_info(os.path.join(self.FIX, "album_info.json"))
        feats = self._feats()
        meta = pack(qas, albums, feats, {"q_dup"}, None, str(tmp_path),
                    small_data_config(), val_fraction=0.2, seed=0)
        packed = load_pack(str(tmp_path))
        row = {aid: i + 1 for i, aid in enumerate(meta["album_ids"])}
        sh = packed.shared
        # a_hole: 4 photo_ids, 1 missing from the npz -> 3 kept, compacted to
        # a contiguous prefix, titles travelling with their photos in order
        m = sh.album_photo_mask[row["a_hole"]]
        assert m.tolist() == [True, True, True, False]
        # a_nophotos: every photo absent from the npz -> packs, fully masked
        assert not sh.album_photo_mask[row["a_nophotos"]].any()
        assert "a_nophotos" in row  # the album itself is still addressable
        # the ghost album is not a packed album ...
        assert "a_does_not_exist" not in row
        # ... but the question referencing it packs with its real album only
        allq = {qid: (split, i)
                for split in ("train", "val", "test")
                for i, qid in enumerate(packed.splits[split]["qid"].tolist())}
        split, i = allq["q_ghost_album"]
        amask = packed.splits[split]["album_mask"][i]
        aidx = packed.splits[split]["album_idx"][i]
        assert amask.tolist() == [True, False]
        assert aidx[0] == row["a_clean"]
        # every kept question made it into exactly one split
        assert set(allq) == {q.question_id for q in qas}
        # batches assemble onto the device with no surprises
        shared = SharedTables.from_packed(sh)
        batch = device_put_batch(next(iter(
            Dataset(packed, split).get_batches(4))))
        mi = assemble(shared, batch)
        assert np.isfinite(np.asarray(mi.photo_feats)).all()

    def test_wrong_feat_dim_is_a_clear_error(self, tmp_path):
        from fvta_memexqa_tpu.data import pack
        from tests.conftest import small_data_config

        qas, _ = parse_qas(os.path.join(self.FIX, "qas.json"))
        albums, _ = parse_album_info(os.path.join(self.FIX, "album_info.json"))
        feats = self._feats()
        feats["ph_c1"] = np.zeros(32, dtype=np.float32)  # wrong dim
        with pytest.raises(ValueError, match="feat dim"):
            pack(qas, albums, feats, set(), None, str(tmp_path),
                 small_data_config(), seed=0)

    def test_serve_ingest_quirk_albums(self, tmp_path):
        """Raw-path serve ingest of the dirtiest albums (npz holes, all-masked
        photos, unicode) encodes and answers without crashing."""
        import jax

        from fvta_memexqa_tpu.config import Config
        from fvta_memexqa_tpu.data import load_pack, pack
        from fvta_memexqa_tpu.models.fvta import FVTAModel
        from fvta_memexqa_tpu.serve import AlbumStore, QAEngine, vocab_view
        from tests.conftest import small_data_config

        qas, _ = parse_qas(os.path.join(self.FIX, "qas.json"))
        albums, _ = parse_album_info(os.path.join(self.FIX, "album_info.json"))
        feats = self._feats()
        pack(qas, albums, feats, {"q_dup"}, None, str(tmp_path),
             small_data_config(), val_fraction=0.2, seed=0)
        packed = load_pack(str(tmp_path))
        cfg = Config()
        cfg = cfg.replace(data=packed.cfg,
                          model=cfg.model.__class__(hidden_dim=8, char_emb_dim=4,
                                                    char_cnn_filters=8))
        shared = SharedTables.from_packed(packed.shared)
        mi = assemble(shared, device_put_batch(next(iter(
            Dataset(packed, "train").get_batches(2)))))
        model = FVTAModel(cfg=cfg)
        params = jax.jit(lambda k: model.init(k, shared, mi, train=False))(
            jax.random.key(0))
        store = AlbumStore(cfg, model, params, shared, vocab_view(packed.meta))
        for aid in ("a_clean", "a_unicode", "a_hole", "a_nophotos"):
            store.ingest(albums[aid], feats)
        assert store.num_albums == 4
        engine = QAEngine(store, batch_size=1, batch_window_ms=1.0)
        try:
            res = engine.ask("where did we go on the harbor trip ?",
                             ["lisbon", "oslo", "quito", "cairo"],
                             ["a_clean", "a_nophotos", "a_ghost"])
            assert res["albums_found"] == 2  # ghost reported, not fatal
            assert abs(sum(res["probs"]) - 1.0) < 1e-4
            # unicode album answers through the cached path too
            res = engine.ask("où sommes-nous allés ?",
                             ["reykjavík", "lisbon", "oslo", "quito"],
                             ["a_unicode"])
            assert res["albums_found"] == 1
        finally:
            engine.close()


def test_modalities_constant():
    assert NUM_MODALITIES == 6
