"""Video QA path (TGIF-style): forward shapes, overfit on synthetic events,
temporal encoder variants, CP attention integration over the ctx mesh axis."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fvta_memexqa_tpu.config import Config, DataConfig, MeshConfig, ModelConfig
from fvta_memexqa_tpu.models.video import (
    VideoFVTAModel,
    make_synthetic_video,
    video_loss,
)
from fvta_memexqa_tpu.parallel.cp import make_cp_attention
from fvta_memexqa_tpu.parallel.mesh import make_mesh


def video_config() -> Config:
    return Config(
        data=DataConfig(
            max_albums=1, max_photos=1, max_question_len=8, max_answer_len=3,
            max_sent_len=3, max_album_text_len=3, max_word_len=6, image_feat_dim=32,
            word_emb_dim=16, word_vocab_size=32, char_vocab_size=16, num_glove_words=0,
        ),
        model=ModelConfig(hidden_dim=12, char_emb_dim=4, char_cnn_filters=8,
                          keep_prob=1.0, vocab_embed=False),
    )


@pytest.fixture(scope="module")
def video_setup():
    cfg = video_config()
    vi, _ = make_synthetic_video(cfg, num_videos=16, num_frames=32, seed=0)
    from fvta_memexqa_tpu.data.device_prepro import SharedTables

    d = cfg.data
    rng = np.random.default_rng(1)
    shared = SharedTables(
        word_emb=jnp.asarray(rng.normal(0, 0.3, (d.word_vocab_size, d.word_emb_dim))
                             .astype(np.float32)),
        vocab_chars=jnp.zeros((d.word_vocab_size, d.max_word_len), jnp.int32),
        photo_feats=jnp.zeros((1, d.image_feat_dim)),
        album_photo_idx=jnp.zeros((1, 1), jnp.int32),
        album_photo_mask=jnp.zeros((1, 1), bool),
        photo_title_words=jnp.zeros((1, 1, 1), jnp.int32),
        photo_title_chars=jnp.zeros((1, 1, 1, 1), jnp.int32),
        photo_title_mask=jnp.zeros((1, 1, 1), bool),
        album_text_words=jnp.zeros((1, 4, 1), jnp.int32),
        album_text_chars=jnp.zeros((1, 4, 1, 1), jnp.int32),
        album_text_mask=jnp.zeros((1, 4, 1), bool),
    )
    return cfg, vi, shared


class TestVideoForward:
    @pytest.mark.parametrize("similarity", ["dot", "bilinear"])
    def test_similarity_kinds_run(self, video_setup, similarity):
        """All config-documented similarity kernels must work in the video
        model too (bilinear was a KeyError until round 2)."""
        import dataclasses

        cfg, vi, shared = video_setup
        cfg2 = cfg.replace(model=dataclasses.replace(cfg.model,
                                                     similarity=similarity))
        model = VideoFVTAModel(cfg=cfg2, num_choices=5)
        params = jax.jit(lambda k: model.init(k, shared, vi, train=False))(
            jax.random.key(0))
        out = jax.jit(lambda p: model.apply(p, shared, vi, train=False))(params)
        assert np.isfinite(np.asarray(out.logits)).all()

    def test_vocab_table_shared_and_precomputable(self, video_setup):
        """vocab_embed path: the table computes once per forward and a
        precomputed table gives identical logits (frozen-param consumers)."""
        import dataclasses

        cfg, vi, shared = video_setup
        cfg2 = cfg.replace(model=dataclasses.replace(cfg.model, vocab_embed=True))
        model = VideoFVTAModel(cfg=cfg2, num_choices=5)
        params = jax.jit(lambda k: model.init(k, shared, vi, train=False))(
            jax.random.key(0))
        o1 = jax.jit(lambda p: model.apply(p, shared, vi, train=False))(params)
        vt = model.apply(params, shared, method=VideoFVTAModel._vocab_table)
        o2 = jax.jit(lambda p, v: model.apply(p, shared, vi, train=False,
                                              vocab_table=v))(params, vt)
        np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("enc", ["dilated_conv", "bilstm"])
    def test_forward_shapes(self, video_setup, enc):
        cfg, vi, shared = video_setup
        model = VideoFVTAModel(cfg=cfg, num_choices=5, temporal_encoder=enc)
        params = jax.jit(lambda k: model.init(k, shared, vi, train=False))(
            jax.random.key(0))
        out = jax.jit(lambda p: model.apply(p, shared, vi, train=False))(params)
        assert out.logits.shape == (16, 5)
        assert out.attention.time_attn.shape == (16, 1, 32)
        assert np.isfinite(np.asarray(out.logits)).all()

    def test_overfit_synthetic_events(self, video_setup):
        """The event is visible in the frame features; the model must learn it."""
        cfg, vi, shared = video_setup
        model = VideoFVTAModel(cfg=cfg, num_choices=5)
        params = jax.jit(lambda k: model.init(k, shared, vi, train=False))(
            jax.random.key(0))
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s):
            (l, aux), g = jax.value_and_grad(
                lambda pp: video_loss(model, pp, shared, vi, None, False),
                has_aux=True)(p)
            up, s = opt.update(g, s, p)
            return optax.apply_updates(p, up), s, l, aux["acc"]

        acc = 0.0
        for i in range(150):
            params, opt_state, loss, acc = step(params, opt_state)
        assert float(acc) == 1.0, f"video overfit failed: acc={float(acc)}"

    def test_cp_attention_integration(self, video_setup):
        """Full video forward with the attention sharded over the ctx axis."""
        cfg, vi, shared = video_setup
        model = VideoFVTAModel(cfg=cfg, num_choices=5)
        params = jax.jit(lambda k: model.init(k, shared, vi, train=False))(
            jax.random.key(0))
        ref = jax.jit(lambda p: model.apply(p, shared, vi, train=False))(params)

        mesh = make_mesh(MeshConfig(data_parallel=1, context_parallel=8))
        cp_attn = make_cp_attention(mesh, cfg.model.similarity)
        out = jax.jit(lambda p: model.apply(
            p, shared, vi, train=False, cp_attention=cp_attn))(params)
        np.testing.assert_allclose(np.asarray(out.logits), np.asarray(ref.logits),
                                   rtol=1e-5, atol=1e-5)

    def test_long_sequence_runs(self, video_setup):
        cfg, _, shared = video_setup
        vi, _ = make_synthetic_video(cfg, num_videos=2, num_frames=1024, seed=2)
        model = VideoFVTAModel(cfg=cfg, num_choices=5)
        params = jax.jit(lambda k: model.init(k, shared, vi, train=False))(
            jax.random.key(0))
        out = jax.jit(lambda p: model.apply(p, shared, vi, train=False))(params)
        assert out.logits.shape == (2, 5)
        assert np.isfinite(np.asarray(out.logits)).all()


class TestTaskHeads:
    """TGIF-QA task heads beyond multiple choice (models/video.py docstring):
    count regression and frameqa answer-vocab classification."""

    def test_count_forward_loss_and_masking(self, video_setup):
        cfg, _, shared = video_setup
        vi, _ = make_synthetic_video(cfg, num_videos=8, num_frames=32,
                                     seed=3, task="count")
        model = VideoFVTAModel(cfg=cfg, task="count")
        params = jax.jit(lambda k: model.init(k, shared, vi, train=False))(
            jax.random.key(0))
        out = jax.jit(lambda p: model.apply(p, shared, vi, train=False))(params)
        assert out.logits.shape == (8, 1)
        loss, m = video_loss(model, params, shared, vi, None, False)
        assert np.isfinite(float(loss)) and float(m["mse"]) == float(loss)
        # ex_mask False ⇒ that example's label cannot influence the loss
        vi_m = vi.replace(ex_mask=vi.ex_mask.at[-1].set(False))
        l1, _ = video_loss(model, params, shared, vi_m, None, False)
        vi_m2 = vi_m.replace(label=vi_m.label.at[-1].set(999))
        l2, _ = video_loss(model, params, shared, vi_m2, None, False)
        assert float(l1) == float(l2)

    def test_count_head_fits_counts(self, video_setup):
        """The soft-count head must be able to REPRESENT counting: train MSE
        collapses far below the label variance (held-out generalization is
        measured at scale — BASELINE.md video section)."""
        cfg, _, shared = video_setup
        vi, _ = make_synthetic_video(cfg, num_videos=24, num_frames=32,
                                     seed=4, task="count")
        labels = np.asarray(vi.label, np.float32)
        var = float(((labels - labels.mean()) ** 2).mean())
        model = VideoFVTAModel(cfg=cfg, task="count")
        params = jax.jit(lambda k: model.init(k, shared, vi, train=False))(
            jax.random.key(0))
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s):
            (l, aux), g = jax.value_and_grad(
                lambda pp: video_loss(model, pp, shared, vi, None, False),
                has_aux=True)(p)
            up, s = opt.update(g, s, p)
            return optax.apply_updates(p, up), s, l

        for _ in range(400):
            params, opt_state, loss = step(params, opt_state)
        assert float(loss) < 0.25 * var, \
            f"count head failed to fit: mse={float(loss):.3f} vs var={var:.3f}"

    def test_frameqa_forward_loss_and_oov(self, video_setup):
        cfg, _, shared = video_setup
        vi, _ = make_synthetic_video(cfg, num_videos=8, num_frames=32,
                                     seed=5, task="frameqa")
        model = VideoFVTAModel(cfg=cfg, task="frameqa", num_answers=8)
        params = jax.jit(lambda k: model.init(k, shared, vi, train=False))(
            jax.random.key(0))
        out = jax.jit(lambda p: model.apply(p, shared, vi, train=False))(params)
        assert out.logits.shape == (8, 8)
        l0, m0 = video_loss(model, params, shared, vi, None, False)
        # an OOV ground truth (label -1): finite loss, counted WRONG in acc
        vi_oov = vi.replace(label=vi.label.at[0].set(-1))
        l1, m1 = video_loss(model, params, shared, vi_oov, None, False)
        assert np.isfinite(float(l1))
        assert float(m1["acc"]) <= 7.0 / 8.0 + 1e-6

    def test_frameqa_requires_answer_vocab(self, video_setup):
        cfg, vi, shared = video_setup
        model = VideoFVTAModel(cfg=cfg, task="frameqa", num_answers=0)
        with pytest.raises(ValueError, match="num_answers"):
            model.init(jax.random.key(0), shared, vi, train=False)

    def test_unknown_task_raises(self, video_setup):
        cfg, vi, shared = video_setup
        model = VideoFVTAModel(cfg=cfg, task="nope")
        with pytest.raises(ValueError, match="unknown task"):
            model.init(jax.random.key(0), shared, vi, train=False)
