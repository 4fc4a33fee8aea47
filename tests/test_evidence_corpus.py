"""Invariants of the evidence-only corpus (make_evidence_only_synthetic).

The corpus exists to settle the focality-accuracy question permanently
(round-4 verdict #1): planted photo evidence must be the ONLY signal that
lifts any question kind above its text ceiling, at EVERY seed by
construction. These tests pin exactly that — no residual text channel for
the focal answers, two-candidate (50%-ceiling) text for where/year, all
focal choices genuinely in-context, a recoverable marker on the evidence
photo — across several seeds, so a seed-lucky corpus can never again carry
an accuracy claim.
"""

import numpy as np
import pytest

from fvta_memexqa_tpu.data.synthetic import (focal_kind,
                                             make_evidence_only_synthetic)

SEEDS = (0, 1, 2)


def _gen(seed, **kw):
    return make_evidence_only_synthetic(num_albums=16, photos_per_album=8,
                                        num_questions=160, seed=seed,
                                        return_meta=True, **kw)


def _album_text(a):
    return " ".join([a.title, a.description, a.where, a.when,
                     *a.photo_titles]).split()


class TestTextChannels:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_focal_answer_absent_from_all_text(self, seed):
        qas, albums, feats, test_ids, glove, val_ids, meta = _gen(seed)
        for qi, q in enumerate(qas):
            if focal_kind(qi, 16) <= 1:
                assert q.answer not in _album_text(albums[q.album_ids[0]]), (
                    seed, q.question_id)

    @pytest.mark.parametrize("seed", SEEDS)
    def test_where_year_text_lists_exactly_two_candidates(self, seed):
        """Text narrows 4 -> 2 (load-bearing) but never to 1: the answer and
        exactly one other choice appear in the text; the other two don't."""
        qas, albums, feats, test_ids, glove, val_ids, meta = _gen(seed)
        for qi, q in enumerate(qas):
            k = focal_kind(qi, 16)
            if k not in (3, 4):
                continue
            words = set(_album_text(albums[q.album_ids[0]]))
            in_text = [c for c in q.choices if c in words]
            assert q.answer in in_text and len(in_text) == 2, (seed, q.question_id)

    @pytest.mark.parametrize("seed", SEEDS)
    def test_text_order_uncorrelated_with_truth(self, seed):
        """The true city/year must lead the 'X or Y' text for ~half the
        albums — a fixed order would be a 100%-text shortcut."""
        qas, albums, feats, test_ids, glove, val_ids, meta = _gen(seed)
        first = [albums[a].where.split(" or ")[0] == meta[a]["city"]
                 for a in albums]
        assert 0.15 <= np.mean(first) <= 0.85, np.mean(first)
        firsty = [albums[a].when.split()[1] == meta[a]["year"] for a in albums]
        assert 0.15 <= np.mean(firsty) <= 0.85, np.mean(firsty)

    @pytest.mark.parametrize("seed", SEEDS)
    def test_focal_choices_all_in_context(self, seed):
        """All four focal choices are present in the album (answer at the
        evidence photo, decoy in text, two objects in other photos):
        presence-decoding caps at 25%."""
        qas, albums, feats, test_ids, glove, val_ids, meta = _gen(seed)
        for qi, q in enumerate(qas):
            if focal_kind(qi, 16) > 1:
                continue
            m = meta[q.album_ids[0]]
            assert set(q.choices) == {m["object"], m["decoy"], m["obj2"],
                                      m["obj3"]}, (seed, q.question_id)


class TestEvidencePhoto:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_marker_identifies_evidence_position(self, seed):
        """The global marker direction (estimated from the oracle positions)
        argmax-identifies the evidence photo in >=90% of albums — the
        localization target is learnable in feature space."""
        qas, albums, feats, test_ids, glove, val_ids, meta = _gen(seed)
        ev_feats = np.stack([feats[albums[a].photo_ids[meta[a]["evidence_pos"]]]
                             for a in albums])
        marker_est = ev_feats.mean(0)
        hits = 0
        for a in albums:
            sims = np.stack([feats[p] for p in albums[a].photo_ids]) @ marker_est
            hits += int(np.argmax(sims) == meta[a]["evidence_pos"])
        assert hits >= 0.9 * len(albums), (seed, hits)

    @pytest.mark.parametrize("seed", SEEDS)
    def test_object_direction_recoverable_across_albums(self, seed):
        """Evidence photos sharing a planted OBJECT are more similar than
        those with different objects (after removing the shared marker):
        held-out albums can be decoded from shared directions."""
        qas, albums, feats, test_ids, glove, val_ids, meta = _gen(seed)
        ev = {a: feats[albums[a].photo_ids[meta[a]["evidence_pos"]]]
              for a in albums}
        marker_est = np.stack(list(ev.values())).mean(0)
        ids = list(albums)
        same, diff = [], []
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                va = ev[a] - marker_est
                vb = ev[b] - marker_est
                c = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
                (same if meta[a]["object"] == meta[b]["object"] else diff).append(c)
        if same and diff:
            assert np.mean(same) > np.mean(diff) + 0.1, (np.mean(same),
                                                         np.mean(diff))


class TestSplitsAndDeterminism:
    def test_album_holdout_splits_disjoint(self):
        qas, albums, feats, test_ids, glove, val_ids, meta = _gen(0)
        by_id = {q.question_id: q for q in qas}
        test_albums = {by_id[q].album_ids[0] for q in test_ids}
        val_albums = {by_id[q].album_ids[0] for q in val_ids}
        train_albums = {q.album_ids[0] for q in qas
                        if q.question_id not in test_ids | val_ids}
        assert not (test_albums & val_albums)
        assert not (test_albums & train_albums)
        assert not (val_albums & train_albums)

    def test_deterministic(self):
        a = _gen(3)
        b = _gen(3)
        assert [q.question_id for q in a[0]] == [q.question_id for q in b[0]]
        assert all(np.array_equal(a[2][p], b[2][p]) for p in a[2])
        assert a[0][0].choices == b[0][0].choices

    def test_packs_through_prepro(self, tmp_path):
        """The corpus drives the real pack path cleanly; per-kind counts are
        balanced by the shared focal_kind layout."""
        from fvta_memexqa_tpu.config import DataConfig
        from fvta_memexqa_tpu.data import load_pack, pack

        qas, albums, feats, test_ids, glove, val_ids, meta = _gen(0)
        cfg = DataConfig(max_albums=1, max_photos=8, max_question_len=12,
                         max_answer_len=4, max_sent_len=8,
                         max_album_text_len=28, max_word_len=10,
                         image_feat_dim=64)
        m = pack(qas, albums, feats, test_ids, glove, str(tmp_path), cfg,
                 seed=0, val_ids=val_ids)
        packed = load_pack(str(tmp_path))
        sizes = m["split_sizes"]
        assert sizes["train"] + sizes["val"] + sizes["test"] == len(qas)
        assert sizes["test"] > 0 and sizes["val"] > 0
        kinds = [focal_kind(qi, 16) for qi in range(len(qas))]
        assert {k: kinds.count(k) for k in range(5)} == {
            0: 32, 1: 32, 2: 32, 3: 32, 4: 32}
        assert packed.meta["album_ids"]
