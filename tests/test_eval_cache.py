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


class TestEvalCache:
    def _setup(self, packed_synth, small_config):
        shared = SharedTables.from_packed(packed_synth.shared)
        ds = Dataset(packed_synth, "train")
        batch = device_put_batch(next(iter(ds.get_batches(4))))
        model = FVTAModel(cfg=small_config)
        mi0 = assemble(shared, batch)
        params = jax.jit(lambda k: model.init(k, shared, mi0, train=False))(
            jax.random.key(0))
        return model, params, shared, ds

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
