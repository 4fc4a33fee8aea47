"""TF1-checkpoint importer: tf.train.Saver variable layout → this repo's params.

Round-2 verdict missing #4: accuracy parity vs the reference (the BASELINE.json
north-star metric) needs the reference's PRETRAINED WEIGHTS loadable the day
they appear — nothing else in the sandbox can produce them. This module maps a
TF checkpoint (the reference is a TF1/Saver codebase — SURVEY.md section 2
"Checkpointing") onto the FVTAModel params pytree:

- TF1 `BasicLSTMCell` layout: ONE fused [D+H, 4H] kernel with gate blocks in
  (i, j, f, o) order and the forget bias added IN-CELL — exactly the pins of
  ops/lstm_ref.py, so the import is a pure row-split (wx = kernel[:D],
  wh = kernel[D:], b = bias), bitwise.
- Keras `LSTM` layout (in case weights arrive re-saved through TF2): separate
  kernel/recurrent/bias with gate blocks in (i, f, c, o) order and the forget
  bias FOLDED into the bias — the inverse of the mapping
  tests/test_tf_crosscheck._to_keras_weights validates against installed TF
  (reorder i,f,c,o → i,j,f,o; subtract forget_bias from the f block — exact
  up to the one f32 subtraction).

The reference's actual variable NAMES are unverified (the /root/reference
mount is empty — SURVEY.md provenance), so the name mapping is data:
`default_tf1_map()` emits the plausible `tf.train.Saver` names for a
`bidirectional_dynamic_rnn`-per-modality graph, `--dump-map` writes it to
JSON for hand-editing against `--list` output when real weights land, and
`--map` loads the edited file. A mapping value of null keeps that leaf at its
initialized value (for reference variants that lack a submodule).

CLI: python -m fvta_memexqa_tpu.cli import-tf-checkpoint <ckpt> <packdir> <rundir>
(writes an orbax checkpoint at step 0, so `cli test <packdir> <rundir>` then
evaluates the imported weights directly).
"""

from __future__ import annotations

import json

import jax
import numpy as np

from fvta_memexqa_tpu.ops.lstm_ref import LSTMParams

LSTM_ENCODERS = ("enc_word", "enc_photo", "enc_photo_title", "enc_album_title",
                 "enc_album_desc", "enc_when", "enc_where")

# Non-LSTM leaves, as "a/b/c" paths into params["params"].
PLAIN_LEAVES = (
    "word_embed/oov_emb",
    "char_cnn/char_emb", "char_cnn/conv_kernel", "char_cnn/conv_bias",
    "highway/h0/kernel", "highway/h0/bias",
    "highway/g0/kernel", "highway/g0/bias",
    "highway/h1/kernel", "highway/h1/bias",
    "highway/g1/kernel", "highway/g1/bias",
    "photo_proj/kernel", "photo_proj/bias",
    "sim_w_x", "sim_w_y", "sim_w_xy",      # trilinear similarity
    "sim_w_bilinear",                      # bilinear similarity
    "scorer/kernel", "scorer/bias",
)


def default_tf1_map(prefix: str = "model") -> dict:
    """Plausible tf.train.Saver names for the reference's TF1 graph.

    UNVERIFIED guess (empty mount): per-modality variable scopes wrapping
    `tf.nn.bidirectional_dynamic_rnn` + `BasicLSTMCell` produce
    `<scope>/bidirectional_rnn/{fw,bw}/basic_lstm_cell/{kernel,bias}`; dense
    layers produce `<scope>/{kernel,bias}`. Regenerate with --dump-map and
    edit against --list output when real weights are available."""
    m: dict = {}
    for enc in LSTM_ENCODERS:
        for d in ("fw", "bw"):
            m[f"{enc}/{d}"] = {
                "kernel": f"{prefix}/{enc}/bidirectional_rnn/{d}/basic_lstm_cell/kernel",
                "bias": f"{prefix}/{enc}/bidirectional_rnn/{d}/basic_lstm_cell/bias",
                "layout": "tf1",
            }
    for leaf in PLAIN_LEAVES:
        m[leaf] = f"{prefix}/{leaf}"
    return m


def read_tf_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load every variable of a TF checkpoint (Saver V1/V2 or tf.train.Checkpoint)."""
    import tensorflow as tf

    reader = tf.train.load_checkpoint(path)
    return {name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()}


def _tree_paths(tree, prefix: str = "") -> dict[str, object]:
    """Flatten nested mappings to 'a/b/c' → leaf; LSTMParams stay whole leaves."""
    from collections.abc import Mapping

    out: dict[str, object] = {}
    for k, v in tree.items():
        p = f"{prefix}{k}"
        if isinstance(v, Mapping):
            out.update(_tree_paths(v, p + "/"))
        else:
            out[p] = v
    return out


def _unfold_keras(kernel, recurrent, bias, forget_bias: float):
    """Keras (i,f,c,o) kernel/recurrent/bias → LSTMParams in our (i,j,f,o)
    order with the folded forget bias removed (inverse of the cross-check's
    _to_keras_weights)."""
    h = recurrent.shape[0]

    def unreorder(w):
        i, f, c, o = np.split(np.asarray(w), 4, axis=-1)
        return np.concatenate([i, c, f, o], axis=-1)

    # remove the fold at the KERAS position (f is the 2nd block there), THEN
    # reorder the blocks into our (i, j, f, o) layout
    bias = np.asarray(bias).copy()
    bias[h:2 * h] -= forget_bias
    return LSTMParams(wx=unreorder(kernel), wh=unreorder(recurrent),
                      b=unreorder(bias[None, :])[0])


def convert_params(abstract: dict, tfvars: dict[str, np.ndarray], mapping: dict,
                   forget_bias: float = 1.0) -> tuple[dict, dict]:
    """Map TF variables onto a params["params"]-shaped pytree.

    abstract: the freshly initialized params["params"] tree (shape source).
    Returns (new tree, report). Raises ValueError listing EVERY missing name /
    shape mismatch at once, so one --list round trip fixes the whole map."""
    flat = _tree_paths(abstract)
    errors: list[str] = []
    report = {"imported": 0, "kept_init": 0}
    new_flat: dict[str, object] = {}

    def fetch(name, want_shape, where):
        if name not in tfvars:
            errors.append(f"{where}: checkpoint has no variable '{name}'")
            return None
        arr = np.asarray(tfvars[name], np.float32)
        if tuple(arr.shape) != tuple(want_shape):
            errors.append(f"{where}: '{name}' has shape {tuple(arr.shape)}, "
                          f"model needs {tuple(want_shape)}")
            return None
        return arr

    for path, leaf in flat.items():
        if isinstance(leaf, LSTMParams) or (hasattr(leaf, "_fields")
                                            and "wx" in getattr(leaf, "_fields", ())):
            spec = mapping.get(path)
            if spec is None:
                if path in mapping:  # explicit null: keep initialized values
                    report["kept_init"] += 1
                    new_flat[path] = leaf
                else:
                    errors.append(f"{path}: no mapping entry")
                continue
            d_in = leaf.wx.shape[0]
            h = leaf.wh.shape[0]
            if spec.get("layout", "tf1") == "keras":
                k = fetch(spec["kernel"], (d_in, 4 * h), path)
                r = fetch(spec["recurrent"], (h, 4 * h), path)
                b = fetch(spec["bias"], (4 * h,), path)
                if k is not None and r is not None and b is not None:
                    new_flat[path] = _unfold_keras(k, r, b, forget_bias)
                    report["imported"] += 1
            else:  # tf1 fused [D+H, 4H] kernel, gates already (i, j, f, o)
                k = fetch(spec["kernel"], (d_in + h, 4 * h), path)
                b = fetch(spec["bias"], (4 * h,), path)
                if k is not None and b is not None:
                    new_flat[path] = LSTMParams(wx=k[:d_in], wh=k[d_in:], b=b)
                    report["imported"] += 1
        else:
            name = mapping.get(path)
            if name is None:
                if path in mapping:
                    report["kept_init"] += 1
                    new_flat[path] = leaf
                else:
                    errors.append(f"{path}: no mapping entry")
                continue
            arr = fetch(name, np.shape(leaf), path)
            if arr is not None:
                new_flat[path] = arr
                report["imported"] += 1

    if errors:
        raise ValueError("TF checkpoint import failed:\n  " + "\n  ".join(errors))

    from collections.abc import Mapping

    def rebuild(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}{k}"
            out[k] = rebuild(v, p + "/") if isinstance(v, Mapping) else new_flat[p]
        return out

    return rebuild(abstract), report


def export_tf1_checkpoint(params: dict, path: str, prefix: str = "model",
                          mapping: dict | None = None) -> str:
    """Write params["params"] as a TF1-layout Saver checkpoint (fused LSTM
    kernels, (i,j,f,o) gates, in-cell forget bias → bias unchanged). The
    inverse of convert_params for layout 'tf1'; exists so the round trip is
    testable in-sandbox and so trained weights can be handed BACK to a TF
    consumer. Returns the checkpoint prefix written."""
    import tensorflow as tf

    mapping = mapping or default_tf1_map(prefix)
    flat = _tree_paths(jax.tree.map(np.asarray, params))
    tensors: dict[str, np.ndarray] = {}
    # NB: do not name this loop variable `path` — it would shadow the save
    # path and Saver would silently write to a leaf-named RELATIVE path
    # (found as a stray word_embed/ checkpoint committed at the repo root).
    for leaf_path, leaf in flat.items():
        spec = mapping.get(leaf_path)
        if spec is None:
            continue
        if isinstance(spec, dict):
            tensors[spec["kernel"]] = np.concatenate(
                [np.asarray(leaf.wx), np.asarray(leaf.wh)], axis=0)
            tensors[spec["bias"]] = np.asarray(leaf.b)
        else:
            tensors[spec] = np.asarray(leaf)

    graph = tf.Graph()
    with graph.as_default():
        # var_list as a dict pins the SAVED names exactly (slashes and all),
        # independent of TF's own variable-name munging
        tfvars = {name: tf.Variable(val) for name, val in tensors.items()}
        saver = tf.compat.v1.train.Saver(var_list=tfvars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(sess, path)
