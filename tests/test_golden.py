"""Golden-fixture regression (SURVEY.md section 4 item 2): parity-critical numerics
pinned by checked-in npz files. If one of these fails, a semantic (not just
implementation) change happened — regenerate via tests/golden/generate.py ONLY if
the change is intended, and say so in the commit message."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def load(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name}.npz missing — run tests/golden/generate.py")
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


class TestGolden:
    def test_masking(self):
        from fvta_memexqa_tpu.ops.masking import exp_mask, masked_softmax

        g = load("masking")
        np.testing.assert_allclose(
            np.asarray(exp_mask(jnp.asarray(g["logits"]), jnp.asarray(g["mask"]))),
            g["exp_mask"], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(masked_softmax(jnp.asarray(g["logits"]), jnp.asarray(g["mask"]))),
            g["masked_softmax"], rtol=1e-6, atol=1e-7)

    def test_lstm(self):
        from fvta_memexqa_tpu.ops.lstm_ref import LSTMParams, bilstm_ref, lstm_scan_ref

        g = load("lstm")
        p_fw = LSTMParams(jnp.asarray(g["wx_fw"]), jnp.asarray(g["wh_fw"]),
                          jnp.asarray(g["b_fw"]))
        p_bw = LSTMParams(jnp.asarray(g["wx_bw"]), jnp.asarray(g["wh_bw"]),
                          jnp.asarray(g["b_bw"]))
        x, mask = jnp.asarray(g["x"]), jnp.asarray(g["mask"])
        out_u, fin_u = lstm_scan_ref(p_fw, x, mask)
        np.testing.assert_allclose(np.asarray(out_u), g["uni_out"], rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(fin_u), g["uni_fin"], rtol=1e-6, atol=1e-7)
        out_b, fin_b = bilstm_ref(p_fw, p_bw, x, mask)
        np.testing.assert_allclose(np.asarray(out_b), g["bi_out"], rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(fin_b), g["bi_fin"], rtol=1e-6, atol=1e-7)

    def test_fvta(self):
        from fvta_memexqa_tpu.ops.fvta_ref import fvta_attention, similarity_tensor

        g = load("fvta")
        params = {k: jnp.asarray(g[k]) for k in ("w_x", "w_y", "w_xy")}
        c = similarity_tensor(jnp.asarray(g["h"]), jnp.asarray(g["q"]),
                              "trilinear", params)
        np.testing.assert_allclose(np.asarray(c), g["corr"], rtol=1e-5, atol=1e-6)
        out = fvta_attention(jnp.asarray(g["h"]), jnp.asarray(g["cm"]),
                             jnp.asarray(g["q"]), jnp.asarray(g["qm"]), c)
        for key, val in (("context", out.context), ("question", out.question),
                         ("time_attn", out.time_attn), ("seq_attn", out.seq_attn)):
            np.testing.assert_allclose(np.asarray(val), g[key], rtol=1e-5, atol=1e-6,
                                       err_msg=key)

    def test_char_cnn(self):
        from fvta_memexqa_tpu.models.embed import CharCNN

        g = load("char_cnn")
        cnn = CharCNN(char_vocab_size=20, emb_dim=6, num_filters=8, width=3)
        params = cnn.init(jax.random.key(3), jnp.asarray(g["chars"]))
        # init determinism is part of the pin: params must match the stored ones
        for i, leaf in enumerate(jax.tree.leaves(params)):
            np.testing.assert_allclose(np.asarray(leaf), g[f"p_{i}"], rtol=1e-6,
                                       err_msg=f"param leaf {i}")
        out = cnn.apply(params, jnp.asarray(g["chars"]))
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=1e-5, atol=1e-6)

    def test_model_forward(self, packed_synth, small_config):
        from fvta_memexqa_tpu.data import Dataset, SharedTables, assemble
        from fvta_memexqa_tpu.data.device_prepro import device_put_batch
        from fvta_memexqa_tpu.models import FVTAModel

        g = load("model_forward")
        shared = SharedTables.from_packed(packed_synth.shared)
        batch = device_put_batch(next(iter(Dataset(packed_synth, "train").get_batches(4))))
        mi = assemble(shared, batch)
        model = FVTAModel(cfg=small_config)
        params = jax.jit(lambda k: model.init(k, shared, mi, train=False))(
            jax.random.key(0))
        out = jax.jit(lambda p: model.apply(p, shared, mi, train=False))(params)
        np.testing.assert_allclose(np.asarray(out.logits), g["logits"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.attention.seq_attn), g["seq_attn"],
                                   rtol=1e-5, atol=1e-6)
