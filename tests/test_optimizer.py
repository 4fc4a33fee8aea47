"""Optimizer-layer features shared by both drivers (train._optimizer_from_key):
LR schedules (warmup/cosine/linear) and gradient accumulation (MultiSteps).
Both keep the exact-resume contract — their counters live in opt_state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvta_memexqa_tpu.config import Config, ModelConfig, TrainConfig
from fvta_memexqa_tpu.data.device_prepro import SharedTables, device_put_batch
from fvta_memexqa_tpu.data.pipeline import Dataset
from fvta_memexqa_tpu.models.fvta import FVTAModel
from fvta_memexqa_tpu.train import (_make_lr, init_state, make_train_step,
                                    train as run_train)


class TestSchedules:
    def test_warmup_then_constant(self):
        s = _make_lr(1e-2, "constant", warmup_steps=10, decay_steps=0)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(5)), 5e-3, rtol=1e-6)
        np.testing.assert_allclose(float(s(10)), 1e-2, rtol=1e-6)
        np.testing.assert_allclose(float(s(1000)), 1e-2, rtol=1e-6)

    def test_cosine_decays_to_zero(self):
        s = _make_lr(1e-2, "cosine", warmup_steps=4, decay_steps=16)
        np.testing.assert_allclose(float(s(4)), 1e-2, rtol=1e-6)
        assert float(s(12)) < 1e-2
        np.testing.assert_allclose(float(s(20)), 0.0, atol=1e-9)

    def test_linear_decays_to_zero(self):
        s = _make_lr(1e-2, "linear", warmup_steps=0, decay_steps=10)
        np.testing.assert_allclose(float(s(5)), 5e-3, rtol=1e-6)
        np.testing.assert_allclose(float(s(10)), 0.0, atol=1e-9)

    def test_plain_constant_stays_float(self):
        # old configs' opt-state structure must not change
        assert _make_lr(1e-3, "constant", 0, 0) == 1e-3

    def test_bad_inputs_raise(self):
        with pytest.raises(ValueError, match="decay_steps"):
            _make_lr(1e-3, "cosine", 0, 0)
        with pytest.raises(ValueError, match="unknown lr_schedule"):
            _make_lr(1e-3, "nope", 0, 0)


def _cfg(packed, **train_kw):
    kw = dict(batch_size=4, eval_batch_size=4, learning_rate=1e-3,
              num_epochs=1, val_period=1000, save_period=1000,
              log_period=100, seed=3)
    kw.update(train_kw)
    return Config().replace(
        data=packed.cfg,
        model=ModelConfig(hidden_dim=8, char_emb_dim=4, char_cnn_filters=8,
                          keep_prob=1.0),
        train=TrainConfig(**kw),
    )


def _moment_leaves(opt_state, name: str):
    """Adam moment arrays (mu/nu) fished out of an opt-state tree by path —
    works through the MultiSteps wrapper (same relative leaf order)."""
    return [leaf for path, leaf in
            jax.tree_util.tree_flatten_with_path(opt_state)[0]
            if f".{name}" in jax.tree_util.keystr(path)]


class TestGradAccum:
    def test_two_microbatches_match_one_large_batch(self, packed_synth):
        """grad_accum=2 over two bs=4 microbatches must feed the same mean
        gradient into the same inner optimizer as one bs=8 step (pad-free
        microbatches, keep_prob=1.0). The pinned invariant is adam's FIRST/
        SECOND MOMENTS after one effective step — exactly the clipped mean
        grad (and its square), ratio-free. Post-adam params are only sanity-
        checked loosely: m̂/√v̂ amplifies fp-reassociation noise unboundedly on
        zero-gradient directions (the MC scorer bias shifts all choice logits
        equally, so its true gradient is identically 0 and its adam update is
        normalized fp noise in ANY run)."""
        cfg_a = _cfg(packed_synth, batch_size=4, grad_accum=2)
        cfg_b = _cfg(packed_synth, batch_size=8)
        model = FVTAModel(cfg=cfg_a)
        shared = SharedTables.from_packed(packed_synth.shared)
        ds = Dataset(packed_synth, "train")
        b8 = device_put_batch(next(iter(ds.get_batches(8))))
        assert bool(np.asarray(b8.ex_mask).all())
        halves = [jax.tree.map(lambda x: x[:4], b8),
                  jax.tree.map(lambda x: x[4:], b8)]

        state_a = init_state(cfg_a, model, shared, halves[0])
        state_b = init_state(cfg_b, FVTAModel(cfg=cfg_b), shared, b8)
        # identical init (model graph reads only cfg.model/cfg.data)
        for pa, pb in zip(jax.tree.leaves(state_a.params),
                          jax.tree.leaves(state_b.params)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

        step_a = make_train_step(cfg_a, model)
        step_b = make_train_step(cfg_b, FVTAModel(cfg=cfg_b))
        state_a, _ = step_a(state_a, shared, halves[0])
        # MultiSteps: update 1 of 2 accumulates only — params unchanged
        for pa, pb in zip(jax.tree.leaves(state_a.params),
                          jax.tree.leaves(state_b.params)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        state_a, _ = step_a(state_a, shared, halves[1])
        state_b, _ = step_b(state_b, shared, b8)
        for name, tol in (("mu", 1e-7), ("nu", 1e-10)):
            ma = _moment_leaves(state_a.opt_state, name)
            mb = _moment_leaves(state_b.opt_state, name)
            assert len(ma) == len(mb) > 0
            for a, b in zip(ma, mb):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=tol)
        # loose param sanity (bounded by one adam step, lr=1e-3)
        for pa, pb in zip(jax.tree.leaves(state_a.params),
                          jax.tree.leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       atol=5e-4)

    def test_accum_and_schedule_resume_bit_identically(self, packed_synth,
                                                       tmp_path):
        """The fault-injection gate through MultiSteps + a cosine schedule:
        their counters are opt_state, so a killed run must continue bitwise."""
        cfg = _cfg(packed_synth, grad_accum=2, lr_schedule="cosine",
                   warmup_steps=2, decay_steps=8, save_period=2)
        straight = str(tmp_path / "straight")
        killed = str(tmp_path / "killed")
        res_a = run_train(cfg, packed_synth, straight, echo=False)
        res_k1 = run_train(cfg, packed_synth, killed, num_steps=2, echo=False)
        assert res_k1["steps"] == 2
        res_k2 = run_train(cfg, packed_synth, killed, echo=False)
        assert res_k2["steps"] == res_a["steps"]
        for a, b in zip(jax.tree.leaves(res_a["state"].params),
                        jax.tree.leaves(res_k2["state"].params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(res_a["state"].opt_state),
                        jax.tree.leaves(res_k2["state"].opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
