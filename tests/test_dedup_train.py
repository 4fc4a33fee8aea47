"""Train-time album dedup (TrainConfig.dedup_albums): each distinct album in a
batch encodes once; per-question context rows come from a gather whose
transpose scatter-adds duplicate slots' gradients back onto the shared encode.

Gates (mirroring the bf16 variant's structure):
1. exactness at keep_prob=1.0 — loss, metrics, and EVERY gradient leaf match
   the plain step on the same params/batch;
2. the helper's unique/inverse/fallback contract;
3. end-to-end: run_train with dedup on (dropout active, where duplicate slots
   share a noise draw by design) still overfits the synthetic corpus to 100%.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvta_memexqa_tpu.config import Config, ModelConfig, TrainConfig
from fvta_memexqa_tpu.data import Dataset, SharedTables
from fvta_memexqa_tpu.data.device_prepro import device_put_batch
from fvta_memexqa_tpu.models import FVTAModel
from fvta_memexqa_tpu.train import (
    a1_config,
    dedup_album_batch,
    dedup_loss_and_metrics,
    dedup_u_cap,
    loss_and_metrics,
    make_dedup_train_step,
)


class TestDedupHelper:
    def test_unique_inverse_roundtrip(self):
        a = np.array([[3, 7, 0], [7, 3, 3]], np.int32)
        uniq, inv = dedup_album_batch(a, u_cap=8)
        assert uniq.shape == (8,) and inv.shape == a.shape
        np.testing.assert_array_equal(uniq[inv], a)
        assert len(set(uniq.tolist()) - {0}) == 2  # 3 and 7, rest pad

    def test_overflow_falls_back(self):
        a = np.arange(1, 13, dtype=np.int32).reshape(3, 4)  # 12 distinct
        assert dedup_album_batch(a, u_cap=8) is None

    def test_u_cap_rounding(self):
        cfg = Config().replace(train=TrainConfig(batch_size=64, dedup_cap=0.875))
        # 64 * 4 slots * 0.875 = 224, already a multiple of 8
        assert dedup_u_cap(cfg) == 224
        # rounding up to a multiple of 8 is clamped back to the slot count
        cfg2 = Config().replace(train=TrainConfig(batch_size=3, dedup_cap=0.875))
        assert dedup_u_cap(cfg2) == 12


class TestDedupExactness:
    def test_loss_and_grads_match_plain_step(self, packed_synth, small_config):
        """At keep_prob=1.0 the dedup loss is the SAME function of params as
        the plain loss (gather of identical encodes), so loss, counts, and all
        gradient leaves must match to float tolerance."""
        cfg = small_config.replace(
            model=ModelConfig(hidden_dim=16, char_emb_dim=8, char_cnn_filters=16,
                              keep_prob=1.0))
        model = FVTAModel(cfg=cfg)
        shared = SharedTables.from_packed(packed_synth.shared)
        batch = device_put_batch(next(iter(
            Dataset(packed_synth, "train").get_batches(8))))
        # the mini corpus has few albums: real duplicate slots in this batch
        dd = dedup_album_batch(np.asarray(batch.album_idx), u_cap=8)
        assert dd is not None
        uniq, inv = jnp.asarray(dd[0]), jnp.asarray(dd[1])
        assert len(np.unique(np.asarray(batch.album_idx))) < batch.album_idx.size

        from fvta_memexqa_tpu.data.device_prepro import assemble
        mi0 = assemble(shared, batch)
        params = jax.jit(lambda k: model.init(k, shared, mi0, train=False))(
            jax.random.key(0))
        a1_model = FVTAModel(cfg=a1_config(cfg))

        # train=False: with keep_prob=1.0 the train/eval forwards are the same
        # function, and passing no rng avoids flax's rng-type validation
        def plain(p):
            return loss_and_metrics(model, p, shared, batch, None, False)

        def dedup(p):
            return dedup_loss_and_metrics(model, a1_model, p, shared, batch,
                                          uniq, inv, None, False)

        (l_p, m_p), g_p = jax.jit(jax.value_and_grad(plain, has_aux=True))(params)
        (l_d, m_d), g_d = jax.jit(jax.value_and_grad(dedup, has_aux=True))(params)
        np.testing.assert_allclose(float(l_d), float(l_p), rtol=1e-6)
        assert float(m_d["count"]) == float(m_p["count"])
        np.testing.assert_allclose(float(m_d["correct"]), float(m_p["correct"]))
        flat_p = jax.tree_util.tree_flatten_with_path(g_p)[0]
        flat_d = jax.tree_util.tree_flatten_with_path(g_d)[0]
        for (kp, vp), (kd, vd) in zip(flat_p, flat_d):
            assert kp == kd
            np.testing.assert_allclose(
                np.asarray(vd), np.asarray(vp), rtol=5e-5, atol=1e-6,
                err_msg=jax.tree_util.keystr(kp))

    def test_step_runs_and_advances(self, packed_synth, small_config):
        cfg = small_config.replace(train=TrainConfig(batch_size=8,
                                                     dedup_albums=True))
        model = FVTAModel(cfg=cfg)
        shared = SharedTables.from_packed(packed_synth.shared)
        batch = device_put_batch(next(iter(
            Dataset(packed_synth, "train").get_batches(8))))
        from fvta_memexqa_tpu.train import init_state
        state = init_state(cfg, model, shared, batch)
        dd = dedup_album_batch(np.asarray(batch.album_idx), dedup_u_cap(cfg))
        step = make_dedup_train_step(cfg, model)
        state2, m = step(state, shared, batch, jnp.asarray(dd[0]),
                         jnp.asarray(dd[1]))
        assert int(state2.step) == 1
        assert np.isfinite(float(m["loss"]))


class TestDedupOnMesh:
    def test_dp_dedup_grads_match_single_device(self, packed_synth, small_config):
        """Dedup composes with the DP mesh via GSPMD (uniq sharded over "data",
        the unique encode splits across devices, XLA all-gathers the unique
        states before the per-example gather): gradients must equal the
        single-device dedup step within float tolerance."""
        from fvta_memexqa_tpu.config import MeshConfig
        from fvta_memexqa_tpu.data import Dataset, SharedTables
        from fvta_memexqa_tpu.data.device_prepro import device_put_batch
        from fvta_memexqa_tpu.parallel.mesh import make_mesh, replicated, shard_batch
        from fvta_memexqa_tpu.train import init_state
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = small_config.replace(mesh=MeshConfig(data_parallel=8))
        model = FVTAModel(cfg=cfg)
        a1_model = FVTAModel(cfg=a1_config(cfg))
        shared = SharedTables.from_packed(packed_synth.shared)
        ds = Dataset(packed_synth, "train")
        batch = device_put_batch(next(iter(ds.get_batches(8))))
        state = init_state(cfg, model, shared, batch)
        dd = dedup_album_batch(np.asarray(batch.album_idx), u_cap=8)  # lcm(8, dp)
        assert dd is not None

        def grads(sh, b, uniq, inv):
            def loss_fn(p):
                return dedup_loss_and_metrics(model, a1_model, p, sh, b,
                                              uniq, inv, None, False)[0]
            return jax.jit(jax.grad(loss_fn))(state.params)

        g_single = grads(shared, batch, jnp.asarray(dd[0]), jnp.asarray(dd[1]))
        mesh = make_mesh(cfg.mesh)
        sh_r = jax.device_put(shared, replicated(mesh))
        b_s = shard_batch(mesh, device_put_batch(next(iter(ds.get_batches(8)))))
        s_dd = NamedSharding(mesh, P("data"))
        g_dp = grads(sh_r, b_s, jax.device_put(jnp.asarray(dd[0]), s_dd),
                     jax.device_put(jnp.asarray(dd[1]), s_dd))
        for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_dedup_train_loop_on_mesh(self, packed_synth, small_config, tmp_path):
        """run_train with dedup_albums on an 8-way DP mesh drives end to end."""
        from fvta_memexqa_tpu.config import MeshConfig
        from fvta_memexqa_tpu.train import train as run_train

        cfg = small_config.replace(
            mesh=MeshConfig(data_parallel=8),
            train=TrainConfig(batch_size=8, eval_batch_size=8, learning_rate=1e-3,
                              num_epochs=1, val_period=2, save_period=10,
                              log_period=2, seed=0, dedup_albums=True),
        )
        # prefetch=1 also covers the Prefetcher carrying (batch, dedup) tuples
        res = run_train(cfg, packed_synth, str(tmp_path / "dd_dp"), echo=False,
                        prefetch=1)
        assert res["steps"] > 0
        assert 0.0 <= res["best_val_acc"] <= 1.0


class TestDedupTraining:
    def test_dedup_train_overfits(self, packed_synth, tmp_path):
        """Accuracy gate with dropout ON (duplicate slots share a noise draw):
        dedup training must pass the same overfit-to-100% wiring check as the
        plain path (tests/test_train_e2e.py)."""
        from fvta_memexqa_tpu.train import evaluate, make_eval_step, train as run_train

        cfg = Config().replace(
            data=packed_synth.cfg,
            model=ModelConfig(hidden_dim=16, char_emb_dim=8, char_cnn_filters=16,
                              keep_prob=0.9),
            train=TrainConfig(batch_size=8, eval_batch_size=8, learning_rate=2e-3,
                              num_epochs=80, val_period=100, save_period=200,
                              log_period=50, seed=0, dedup_albums=True),
        )
        res = run_train(cfg, packed_synth, str(tmp_path / "ddrun"), echo=False)
        eval_step = make_eval_step(cfg, res["model"])
        m = evaluate(eval_step, res["state"].params, res["shared"],
                     Dataset(packed_synth, "train"), 8)
        assert m["acc"] == 1.0, f"dedup failed the wiring gate: {m['acc']}"
