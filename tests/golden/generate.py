"""Generate the golden numeric fixtures (SURVEY.md section 4 item 2).

Run from the repo root on CPU:  python tests/golden/generate.py
The outputs pin the framework's parity-critical semantics — TF1 LSTM cell math,
exp_mask(-1e30) masking, char-CNN shape/pooling, FVTA focal softmax, and the full
model forward under a fixed init key — so later rounds cannot silently drift them.
Only regenerate when a semantic change is INTENDED, and say so in the commit.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))


def gen_masking():
    from fvta_memexqa_tpu.ops.masking import exp_mask, masked_softmax

    logits = jnp.asarray(np.linspace(-2, 3, 12, dtype=np.float32).reshape(3, 4))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1], [0, 0, 0, 0]], bool)
    return {
        "logits": logits, "mask": mask,
        "exp_mask": exp_mask(logits, mask),
        "masked_softmax": masked_softmax(logits, mask),
    }


def gen_lstm():
    from fvta_memexqa_tpu.ops.lstm_ref import bilstm_ref, init_lstm_params, lstm_scan_ref

    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.normal(0, 1, (3, 6, 5)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1], [1, 1, 1, 0, 0, 0], [1, 0, 0, 0, 0, 0]],
                       bool)
    p_fw = init_lstm_params(jax.random.key(7), 5, 4)
    p_bw = init_lstm_params(jax.random.key(8), 5, 4)
    out_u, fin_u = lstm_scan_ref(p_fw, x, mask)
    out_b, fin_b = bilstm_ref(p_fw, p_bw, x, mask)
    return {
        "x": x, "mask": mask,
        "wx_fw": p_fw.wx, "wh_fw": p_fw.wh, "b_fw": p_fw.b,
        "wx_bw": p_bw.wx, "wh_bw": p_bw.wh, "b_bw": p_bw.b,
        "uni_out": out_u, "uni_fin": fin_u,
        "bi_out": out_b, "bi_fin": fin_b,
    }


def gen_fvta():
    from fvta_memexqa_tpu.ops.fvta_ref import fvta_attention, similarity_tensor

    rng = np.random.default_rng(11)
    h = jnp.asarray(rng.normal(0, 1, (2, 3, 4, 6)).astype(np.float32))
    q = jnp.asarray(rng.normal(0, 1, (2, 5, 6)).astype(np.float32))
    cm = jnp.asarray(rng.random((2, 3, 4)) > 0.3)
    qm = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    params = {k: jnp.asarray(rng.normal(0, 1, 6).astype(np.float32))
              for k in ("w_x", "w_y", "w_xy")}
    c = similarity_tensor(h, q, "trilinear", params)
    out = fvta_attention(h, cm, q, qm, c)
    return {
        "h": h, "q": q, "cm": cm, "qm": qm,
        "w_x": params["w_x"], "w_y": params["w_y"], "w_xy": params["w_xy"],
        "corr": c, "context": out.context, "question": out.question,
        "time_attn": out.time_attn, "seq_attn": out.seq_attn,
    }


def gen_char_cnn():
    from fvta_memexqa_tpu.models.embed import CharCNN

    rng = np.random.default_rng(13)
    chars = jnp.asarray(rng.integers(0, 20, (4, 7, 10)).astype(np.int32))
    cnn = CharCNN(char_vocab_size=20, emb_dim=6, num_filters=8, width=3)
    params = cnn.init(jax.random.key(3), chars)
    out = cnn.apply(params, chars)
    flat = {f"p_{i}": v for i, v in enumerate(jax.tree.leaves(params))}
    return {"chars": chars, "out": out, **flat}


def gen_model_forward():
    """Full model logits under fixed init on the session synthetic pack recipe."""
    from tests.conftest import small_data_config
    from fvta_memexqa_tpu.config import Config, ModelConfig
    from fvta_memexqa_tpu.data import (Dataset, SharedTables, assemble, load_pack,
                                       make_synthetic, pack)
    from fvta_memexqa_tpu.data.device_prepro import device_put_batch
    from fvta_memexqa_tpu.models import FVTAModel
    import tempfile

    d = tempfile.mkdtemp()
    args = make_synthetic(seed=0)
    pack(*args, d, small_data_config(), seed=0)
    packed = load_pack(d)
    cfg = Config().replace(
        data=packed.cfg,
        model=ModelConfig(hidden_dim=16, char_emb_dim=8, char_cnn_filters=16),
    )
    shared = SharedTables.from_packed(packed.shared)
    batch = device_put_batch(next(iter(Dataset(packed, "train").get_batches(4))))
    mi = assemble(shared, batch)
    model = FVTAModel(cfg=cfg)
    params = model.init(jax.random.key(0), shared, mi, train=False)
    out = model.apply(params, shared, mi, train=False)
    return {"logits": out.logits, "seq_attn": out.attention.seq_attn}


def main():
    for name, fn in [("masking", gen_masking), ("lstm", gen_lstm),
                     ("fvta", gen_fvta), ("char_cnn", gen_char_cnn),
                     ("model_forward", gen_model_forward)]:
        data = {k: np.asarray(v) for k, v in fn().items()}
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, **data)
        print(f"wrote {path}: {sorted(data)}")


if __name__ == "__main__":
    main()
