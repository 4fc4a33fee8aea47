"""Rehearsal of the real-data parity runbook (scripts/real_parity.py).

The script exists for the day real MemexQA v1.1 assets + the pretrained TF1
checkpoint land (round-4 verdict missing #1). Rehearsed here end-to-end on
the quirk-fixture miniature (real field names, dirty rows) plus a
synthetically EXPORTED TF1 checkpoint, so the only untested step on
real-data day is the data itself: detect -> prepro -> import-tf-checkpoint
-> test --by-category -> table, with the evaluated accuracy pinned bitwise
to a direct evaluation of the pre-export params.
"""

import json
import os
import shutil
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts")
sys.path.insert(0, SCRIPTS)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "quirk_raw")


def _quirk_feats(dim=64, drop=("ph_h_missing", "ph_n0")):
    """Same npz-with-holes the quirk battery uses (test_data.TestQuirkRaw)."""
    rng = np.random.default_rng(7)
    pids = ["ph_c0", "ph_c1", "ph_c2", "ph_u0", "ph_u1", "ph_h0",
            "ph_h_missing", "ph_h2", "ph_h3", "ph_n0", "ph_d0", "ph_d1",
            "ph_x0", "ph_t0"]
    return {p: rng.normal(size=dim).astype(np.float32)
            for p in pids if p not in drop}


@pytest.fixture(scope="module")
def assets_dir(tmp_path_factory):
    """A populated-mount stand-in: quirk JSON + npz + GloVe + test ids + an
    exported TF1 checkpoint, all under one directory for detect_assets."""
    d = tmp_path_factory.mktemp("parity_assets")
    shutil.copyfile(os.path.join(FIX, "qas.json"), d / "qas.json")
    shutil.copyfile(os.path.join(FIX, "album_info.json"), d / "album_info.json")
    np.savez(d / "photos_quirk_features.npz", **_quirk_feats())
    (d / "test_question.ids").write_text("q_clean\nq_dup")
    rng = np.random.default_rng(3)
    with open(d / "glove.quirk.100d.txt", "w") as f:
        for w in ("where", "did", "we", "go", "on", "the", "harbor", "trip",
                  "lisbon", "oslo", "quito", "cairo", "what"):
            vec = " ".join(f"{v:.5f}" for v in rng.normal(0, 0.5, 100))
            f.write(f"{w} {vec}\n")
    return str(d)


@pytest.fixture(scope="module")
def exported(assets_dir, tmp_path_factory):
    """Pack the assets exactly as the script will, init a model, export its
    params as a TF1 Saver checkpoint INTO the assets dir (so detection finds
    it), and return (cfg, packdir, params) for the bitwise pin."""
    import contextlib
    import io

    import jax

    from fvta_memexqa_tpu.cli import cmd_prepro
    from fvta_memexqa_tpu.config import Config, ModelConfig
    from fvta_memexqa_tpu.data import load_pack
    from fvta_memexqa_tpu.data.device_prepro import SharedTables, device_put_batch
    from fvta_memexqa_tpu.data.pipeline import Dataset
    from fvta_memexqa_tpu.models import FVTAModel
    from fvta_memexqa_tpu.tf_import import export_tf1_checkpoint
    from fvta_memexqa_tpu.train import init_state

    prepack = str(tmp_path_factory.mktemp("parity_prepack"))
    with contextlib.redirect_stdout(io.StringIO()):
        cmd_prepro([os.path.join(assets_dir, "qas.json"),
                    os.path.join(assets_dir, "album_info.json"),
                    os.path.join(assets_dir, "test_question.ids"),
                    os.path.join(assets_dir, "glove.quirk.100d.txt"),
                    os.path.join(assets_dir, "photos_quirk_features.npz"),
                    prepack, "--image-feat-dim", "64"])
    packed = load_pack(prepack)
    cfg = Config(model=ModelConfig(hidden_dim=8)).replace(data=packed.cfg)
    model = FVTAModel(cfg=cfg)
    shared = SharedTables.from_packed(packed.shared)
    batch = device_put_batch(next(iter(Dataset(packed, "test").get_batches(4))))
    state = init_state(cfg, model, shared, batch)
    os.makedirs(os.path.join(assets_dir, "best_model"), exist_ok=True)
    export_tf1_checkpoint(
        jax.tree.map(np.asarray, state.params["params"]),
        os.path.join(assets_dir, "best_model", "ckpt"), prefix="model")
    return cfg, packed, state.params


class TestDetect:
    def test_detects_all_assets(self, assets_dir, exported):
        from real_parity import detect_assets

        found = detect_assets(assets_dir)
        assert os.path.basename(found["qas"]) == "qas.json"
        assert os.path.basename(found["album_info"]) == "album_info.json"
        assert found["test_ids"].endswith("test_question.ids")
        assert found["glove"].endswith(".txt")
        assert found["photo_npz"].endswith(".npz")
        assert found["tf_checkpoint"].endswith("best_model/ckpt")

    def test_missing_assets_reported(self, tmp_path, capsys):
        from real_parity import main

        empty = tmp_path / "empty"
        empty.mkdir()
        rc = main(["--assets", str(empty), "--workdir", str(tmp_path / "w")])
        assert rc == 1
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert set(out["missing"]) == {"qas", "album_info", "test_ids",
                                       "glove", "photo_npz", "tf_checkpoint"}

    def test_detect_only_exits_before_work(self, assets_dir, exported,
                                           tmp_path, capsys):
        from real_parity import main

        rc = main(["--assets", assets_dir, "--detect-only",
                   "--workdir", str(tmp_path / "w")])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["missing"] == []
        assert not os.path.exists(tmp_path / "w" / "pack")


class TestRunbook:
    def test_end_to_end_rehearsal(self, assets_dir, exported, tmp_path, capsys):
        """The full runbook on the quirk miniature: the reported accuracy
        must equal a direct evaluation of the pre-export params — i.e. the
        prepro is deterministic and the TF1 export->import round trip is
        bitwise through the script's own path."""
        from real_parity import main

        from fvta_memexqa_tpu.data.device_prepro import SharedTables
        from fvta_memexqa_tpu.data.pipeline import Dataset
        from fvta_memexqa_tpu.eval_cache import evaluate_cached
        from fvta_memexqa_tpu.models import FVTAModel

        cfg, packed, params = exported
        wd = str(tmp_path / "parity_wd")
        rc = main(["--assets", assets_dir, "--workdir", wd,
                   "--image-feat-dim", "64", "--hidden-dim", "8",
                   "--eval-batch-size", "4"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

        direct = evaluate_cached(cfg, FVTAModel(cfg=cfg), params,
                                 SharedTables.from_packed(packed.shared),
                                 Dataset(packed, "test"), 4)
        assert out["ours"] == direct["acc"]
        assert out["count"] == direct["count"] == 2
        assert out["import"]["imported"] > 0
        assert out["paper"] == pytest.approx(0.669)
        assert out["delta"] == pytest.approx(out["ours"] - 0.669)
        bc = out["by_category"]
        assert bc and sum(v["count"] for v in bc.values()) == out["count"]
        # the run dir is a normal run dir: cli test / report work against it
        assert os.path.exists(os.path.join(wd, "run", "config.json"))
