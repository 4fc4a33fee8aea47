"""Full model forward: shapes, determinism, variants, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvta_memexqa_tpu.data import Dataset, SharedTables, assemble
from fvta_memexqa_tpu.data.device_prepro import device_put_batch
from fvta_memexqa_tpu.models import FVTAModel


@pytest.fixture(scope="module")
def setup(packed_synth, small_config):
    shared = SharedTables.from_packed(packed_synth.shared)
    ds = Dataset(packed_synth, "train")
    batch = device_put_batch(next(iter(ds.get_batches(4))))
    mi = assemble(shared, batch)
    model = FVTAModel(cfg=small_config)
    params = jax.jit(lambda k: model.init(k, shared, mi, train=False))(
        jax.random.key(0))
    return model, params, shared, mi


@pytest.fixture(scope="module")
def jfwd(setup):
    """Shared jitted forward — compiled once per session, persisted across runs
    by the compilation cache (conftest)."""
    model, _, shared, mi = setup
    return jax.jit(lambda p: model.apply(p, shared, mi, train=False))


class TestModelForward:
    def test_logit_shapes(self, setup, jfwd):
        model, params, shared, mi = setup
        out = jfwd(params)
        assert out.logits.shape == (4, 4)
        assert np.isfinite(np.asarray(out.logits)).all()

    def test_eval_deterministic(self, setup, jfwd):
        model, params, shared, mi = setup
        o1 = jfwd(params)
        o2 = jfwd(params)
        np.testing.assert_array_equal(np.asarray(o1.logits), np.asarray(o2.logits))

    def test_dropout_active_in_train(self, setup):
        model, params, shared, mi = setup
        tfwd = jax.jit(lambda p, k: model.apply(p, shared, mi, train=True,
                                                rngs={"dropout": k}))
        o1 = tfwd(params, jax.random.key(1))
        o2 = tfwd(params, jax.random.key(2))
        assert not np.allclose(np.asarray(o1.logits), np.asarray(o2.logits))

    def test_attention_weights_shapes(self, setup, small_config, jfwd):
        model, params, shared, mi = setup
        out = jfwd(params)
        d = small_config.data
        s = d.max_albums * 6
        assert out.attention.time_attn.shape == (4, s, d.max_context_time)
        assert out.attention.seq_attn.shape == (4, s)

    @pytest.mark.parametrize("attention", ["flat", "none"])
    def test_variants_run(self, setup, small_config, attention):
        _, params, shared, mi = setup
        cfg = small_config.replace(model=small_config.model.__class__(
            **{**small_config.model.__dict__, "attention": attention}
        ))
        model = FVTAModel(cfg=cfg)
        out = jax.jit(lambda p: model.apply(p, shared, mi, train=False))(params)
        assert np.isfinite(np.asarray(out.logits)).all()

    @pytest.mark.parametrize("similarity", ["dot", "bilinear"])
    def test_similarity_kinds_run(self, setup, small_config, similarity):
        _, _, shared, mi = setup
        cfg = small_config.replace(model=small_config.model.__class__(
            **{**small_config.model.__dict__, "similarity": similarity}
        ))
        model = FVTAModel(cfg=cfg)
        params = jax.jit(lambda k: model.init(k, shared, mi, train=False))(
            jax.random.key(0))
        out = jax.jit(lambda p: model.apply(p, shared, mi, train=False))(params)
        assert np.isfinite(np.asarray(out.logits)).all()

    def test_grads_nonzero_for_all_encoders(self, setup):
        model, params, shared, mi = setup

        def loss(p):
            out = model.apply(p, shared, mi, train=False)
            lab = jax.nn.one_hot(mi.label, 4)
            return -jnp.mean(jnp.sum(lab * jax.nn.log_softmax(out.logits), -1))

        g = jax.jit(jax.grad(loss))(params)
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        dead = [
            jax.tree_util.keystr(k)
            for k, v in flat
            if not np.abs(np.asarray(v)).max() > 0
        ]
        # Recurrent kernels (.wh) of time encoders are structurally gradient-free when
        # every sequence of that modality has length<=1 (h stays at its zero init) —
        # true for the synthetic "where" (single city word). Everything else must flow.
        dead = [k for k in dead if not k.endswith(".wh")]
        assert dead == [], f"dead params: {dead}"

    def test_vocab_embed_path_matches_per_token(self, setup, small_config):
        """The per-vocab embed table must be bit-compatible with per-token embedding
        (same math, different factorization)."""
        _, params, shared, mi = setup
        mc = small_config.model
        cfg_tok = small_config.replace(
            model=mc.__class__(**{**mc.__dict__, "vocab_embed": False})
        )
        cfg_voc = small_config.replace(
            model=mc.__class__(**{**mc.__dict__, "vocab_embed": True})
        )
        m_tok, m_voc = FVTAModel(cfg=cfg_tok), FVTAModel(cfg=cfg_voc)
        o_tok = jax.jit(lambda p: m_tok.apply(p, shared, mi, train=False))(params)
        o_voc = jax.jit(lambda p: m_voc.apply(p, shared, mi, train=False))(params)
        np.testing.assert_allclose(
            np.asarray(o_tok.logits), np.asarray(o_voc.logits), rtol=1e-5, atol=1e-6
        )

    def test_vocab_embed_matches_per_token_with_oov(self, tmp_path, small_config):
        """Bit-compat of the two embed paths on a TEST-split batch containing an
        eval-time OOV word (extended-lexicon id), and the char-CNN signal is
        actually present: the extended row differs from the bare-UNK row."""
        import dataclasses

        from fvta_memexqa_tpu.data import Dataset, load_pack, make_synthetic, pack
        from tests.conftest import small_data_config

        qas, albums, feats, test_ids, glove = make_synthetic(seed=0)
        ti = next(i for i, q in enumerate(qas) if q.question_id in test_ids)
        qas[ti] = dataclasses.replace(qas[ti],
                                      question="where was the xylophoneword shot")
        out = str(tmp_path / "pack")
        pack(qas, albums, feats, test_ids, glove, out, small_data_config(), seed=0)
        packed = load_pack(out)
        cfg = small_config.replace(data=packed.cfg)
        shared = SharedTables.from_packed(packed.shared)
        batch = device_put_batch(next(iter(
            Dataset(packed, "test").get_batches(packed.num_examples("test")))))
        mi = assemble(shared, batch)
        assert (np.asarray(mi.q_words) >= packed.cfg.word_vocab_size).any()

        mc = cfg.model
        m_tok = FVTAModel(cfg=cfg.replace(
            model=mc.__class__(**{**mc.__dict__, "vocab_embed": False})))
        m_voc = FVTAModel(cfg=cfg.replace(
            model=mc.__class__(**{**mc.__dict__, "vocab_embed": True})))
        params = jax.jit(lambda k: m_voc.init(k, shared, mi, train=False))(
            jax.random.key(0))
        o_tok = jax.jit(lambda p: m_tok.apply(p, shared, mi, train=False))(params)
        o_voc = jax.jit(lambda p: m_voc.apply(p, shared, mi, train=False))(params)
        np.testing.assert_allclose(np.asarray(o_tok.logits), np.asarray(o_voc.logits),
                                   rtol=1e-5, atol=1e-6)

        table = m_voc.apply(params, shared, method=FVTAModel._vocab_table)
        ext_id = packed.meta["ext_word2idx"]["xylophoneword"]
        unk_row = np.asarray(table[1])
        ext_row = np.asarray(table[ext_id])
        assert not np.allclose(unk_row, ext_row), "char-CNN OOV signal missing"

    def test_frozen_glove_not_in_params(self, setup, small_config):
        _, params, _, _ = setup
        names = [jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]]
        oov = [n for n in names if "oov_emb" in n]
        assert len(oov) == 1
        # the trainable table is far smaller than the full vocab
        leaf = [v for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
                if "oov_emb" in jax.tree_util.keystr(k)][0]
        assert leaf.shape[0] < small_config.data.word_vocab_size


def test_precomputed_vocab_table_identical_logits(setup, small_config):
    """Frozen-param evaluation precomputes the embed table once
    (train.make_vocab_table): same math as the inline computation — float-level
    agreement (the separate compilation may fuse differently, so low-order bits
    can move; anything beyond that is a real divergence)."""
    from fvta_memexqa_tpu.train import make_vocab_table

    model, params, shared, mi = setup
    vt = make_vocab_table(model, params, shared)
    assert vt is not None
    o_inline = jax.jit(lambda p: model.apply(p, shared, mi, train=False))(params)
    o_cached = jax.jit(lambda p, v: model.apply(p, shared, mi, train=False,
                                                vocab_table=v))(params, vt)
    np.testing.assert_allclose(np.asarray(o_inline.logits),
                               np.asarray(o_cached.logits), rtol=1e-5, atol=1e-6)
    # and the table itself equals the inline-computed table bitwise
    vt_inline = model.apply(params, shared, method=FVTAModel._vocab_table)
    np.testing.assert_allclose(np.asarray(vt), np.asarray(vt_inline),
                               rtol=1e-6, atol=1e-7)


def test_precomputed_photo_table_identical_logits(setup, small_config, packed_synth):
    """Frozen-param evaluation pre-projects the photo features once per
    checkpoint (train.make_photo_table); assemble() then gathers album-major
    pre-projected rows and the model skips photo_proj. Same per-row math as
    the inline gather→project path — float-level agreement."""
    from fvta_memexqa_tpu.data import Dataset
    from fvta_memexqa_tpu.train import make_photo_table

    model, params, shared, mi = setup
    pt = make_photo_table(model, params, shared)
    d = small_config.data
    assert pt.shape == (shared.album_photo_idx.shape[0], d.max_photos,
                        d.word_emb_dim + small_config.model.char_cnn_filters)

    batch = device_put_batch(next(iter(
        Dataset(packed_synth, "train").get_batches(4))))
    o_raw = jax.jit(lambda p, b: model.apply(
        p, shared, assemble(shared, b), train=False))(params, batch)
    o_pre = jax.jit(lambda p, b, t: model.apply(
        p, shared, assemble(shared, b, t), train=False))(params, batch, pt)
    np.testing.assert_allclose(np.asarray(o_raw.logits), np.asarray(o_pre.logits),
                               rtol=1e-5, atol=1e-6)
