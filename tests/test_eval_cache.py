"""Cached-album evaluation: logits identical to the full re-encode path."""

import jax
import numpy as np

from fvta_memexqa_tpu.config import MODALITIES
from fvta_memexqa_tpu.data import Dataset, SharedTables, assemble
from fvta_memexqa_tpu.data.device_prepro import device_put_batch
from fvta_memexqa_tpu.eval_cache import (
    evaluate_cached,
    make_cached_eval_step,
    precompute_album_cache,
)
from fvta_memexqa_tpu.models import FVTAModel
from fvta_memexqa_tpu.train import evaluate, make_eval_step


def _setup(packed_synth, small_config):
    shared = SharedTables.from_packed(packed_synth.shared)
    ds = Dataset(packed_synth, "train")
    batch = device_put_batch(next(iter(ds.get_batches(4))))
    model = FVTAModel(cfg=small_config)
    mi0 = assemble(shared, batch)
    params = jax.jit(lambda k: model.init(k, shared, mi0, train=False))(
        jax.random.key(0))
    return model, params, shared, ds


class TestEvalCache:
    def _setup(self, packed_synth, small_config):
        return _setup(packed_synth, small_config)

    def test_cache_covers_all_albums(self, packed_synth, small_config):
        model, params, shared, ds = self._setup(packed_synth, small_config)
        h, m = precompute_album_cache(small_config, model, params, shared,
                                      batch_size=4)
        rows = int(shared.album_photo_idx.shape[0])
        assert h.shape[:2] == (rows, len(MODALITIES))
        assert not bool(np.asarray(m)[0].any())  # pad album row fully masked

    def test_cached_logits_equal_full_path(self, packed_synth, small_config):
        model, params, shared, ds = self._setup(packed_synth, small_config)
        cache = precompute_album_cache(small_config, model, params, shared,
                                       batch_size=4)
        step = make_cached_eval_step(small_config, model)
        eval_step = make_eval_step(small_config, model)
        for batch in ds.get_batches(4):
            batch = device_put_batch(batch)
            m_c = step(params, shared, cache[0], cache[1], batch)
            m_f = eval_step(params, shared, batch)
            np.testing.assert_allclose(float(m_c["loss_sum"]), float(m_f["loss_sum"]),
                                       rtol=1e-5)
            assert float(m_c["correct"]) == float(m_f["correct"])

    def test_evaluate_cached_matches_evaluate(self, packed_synth, small_config):
        model, params, shared, ds = self._setup(packed_synth, small_config)
        m_c = evaluate_cached(small_config, model, params, shared, ds, 4)
        m_f = evaluate(make_eval_step(small_config, model), params, shared, ds, 4)
        assert m_c["count"] == m_f["count"]
        assert m_c["acc"] == m_f["acc"]
        np.testing.assert_allclose(m_c["loss"], m_f["loss"], rtol=1e-5)


class TestPredictAndCategories:
    """predict_cached (per-question probs) + the paper-table category breakdown."""

    def test_predict_cached_matches_evaluate(self, packed_synth, small_config):
        from fvta_memexqa_tpu.eval_cache import predict_cached

        model, params, shared, ds = _setup(packed_synth, small_config)
        pr = predict_cached(small_config, model, params, shared, ds, 4)
        m = evaluate_cached(small_config, model, params, shared, ds, 4)
        assert pr["probs"].shape == (ds.n, 4)
        assert list(pr["qid"]) == list(ds.qids)  # dataset order preserved
        np.testing.assert_allclose(pr["probs"].sum(-1), 1.0, rtol=1e-5)
        assert float((pr["pred"] == pr["label"]).mean()) == m["acc"]

    def test_categorize_rules(self):
        from fvta_memexqa_tpu.data.categories import categorize

        assert categorize("how", "many") == "how_many"
        assert categorize("how", "did") == "other"
        for w in ("what", "who", "when", "where"):
            assert categorize(w, "did") == w
        assert categorize("did") == "other"
        assert categorize("") == "other"

    def test_question_categories_match_raw_text(self, packed_synth):
        from fvta_memexqa_tpu.data.categories import (idx2word,
                                                      question_categories)

        cats = question_categories(packed_synth, "train")
        arr = packed_synth.splits["train"]
        assert cats.shape == (arr["label"].shape[0],)
        inv = idx2word(packed_synth.meta)
        # synthetic questions open with "where"/"what" (synthetic.py kinds);
        # the decoded first word must agree with the assigned category
        for c, words in zip(cats, arr["q_words"]):
            assert c == inv[int(words[0])]
            assert c in ("where", "what")

    def test_accuracy_by_category_aggregates(self, packed_synth, small_config):
        from fvta_memexqa_tpu.data.categories import (accuracy_by_category,
                                                      question_categories)
        from fvta_memexqa_tpu.eval_cache import predict_cached

        model, params, shared, ds = _setup(packed_synth, small_config)
        pr = predict_cached(small_config, model, params, shared, ds, 4)
        cats = question_categories(packed_synth, "train")
        bc = accuracy_by_category(cats, pr["pred"] == pr["label"])
        assert sum(v["count"] for v in bc.values()) == ds.n
        overall = sum(v["acc"] * v["count"] for v in bc.values()) / ds.n
        np.testing.assert_allclose(
            overall, float((pr["pred"] == pr["label"]).mean()), rtol=1e-6)
