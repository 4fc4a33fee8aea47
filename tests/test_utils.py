"""Public import surface + metrics utilities."""

import importlib
import json

import pytest


def test_public_import_surface():
    """Every public module imports cleanly (catches broken lazy imports)."""
    mods = [
        "fvta_memexqa_tpu",
        "fvta_memexqa_tpu.config",
        "fvta_memexqa_tpu.cli",
        "fvta_memexqa_tpu.data",
        "fvta_memexqa_tpu.data.device_prepro",
        "fvta_memexqa_tpu.models",
        "fvta_memexqa_tpu.models.video",
        "fvta_memexqa_tpu.ops",
        "fvta_memexqa_tpu.ops.lstm_pallas",
        "fvta_memexqa_tpu.ops.fvta_pallas",
        "fvta_memexqa_tpu.parallel",
        "fvta_memexqa_tpu.parallel.cp",
        "fvta_memexqa_tpu.train",
        "fvta_memexqa_tpu.checkpoint",
        "fvta_memexqa_tpu.eval_cache",
        "fvta_memexqa_tpu.serve",
        "fvta_memexqa_tpu.bench_lib",
        "fvta_memexqa_tpu.utils",
    ]
    for m in mods:
        importlib.import_module(m)


def test_config_json_round_trip():
    from fvta_memexqa_tpu.config import Config, MeshConfig, ModelConfig

    cfg = Config(model=ModelConfig(hidden_dim=77, attention="flat"),
                 mesh=MeshConfig(data_parallel=4, context_parallel=2))
    again = Config.from_json(cfg.to_json())
    assert again == cfg
    assert again.mesh.num_devices == 8


def test_metrics_logger_jsonl(tmp_path):
    from fvta_memexqa_tpu.utils import MetricsLogger

    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path, echo=False)
    log.log("train", step=1, loss=0.5)
    log.log("val", step=1, acc=0.75)
    log.close()
    recs = [json.loads(line) for line in open(path)]
    assert [r["event"] for r in recs] == ["train", "val"]
    assert recs[1]["acc"] == 0.75


def test_timer_p50():
    from fvta_memexqa_tpu.utils import Timer

    t = Timer()
    for _ in range(5):
        t.start()
        t.stop()
    assert t.p50() >= 0.0 and len(t.samples) == 5
    t.reset()
    assert t.samples == [] and t.p50() == 0.0


def test_debug_nans_flag(monkeypatch):
    """FVTA_DEBUG_NANS toggles jax_debug_nans (SURVEY.md section 5 debug tooling)."""
    import jax

    from fvta_memexqa_tpu.train import check_finite_loss, maybe_enable_debug_nans

    monkeypatch.delenv("FVTA_DEBUG_NANS", raising=False)
    assert maybe_enable_debug_nans() is False
    monkeypatch.setenv("FVTA_DEBUG_NANS", "1")
    try:
        assert maybe_enable_debug_nans() is True
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)

    check_finite_loss(1.25, step=3)  # fine
    with pytest.raises(FloatingPointError, match="step 7"):
        check_finite_loss(float("nan"), step=7)
    with pytest.raises(FloatingPointError):
        check_finite_loss(float("inf"), step=8)


def test_model_config_rejects_unknown_enums():
    """Silent-fp32 footgun: --dtype bf16 must error, not quietly select f32
    (same for attention/similarity misspellings)."""
    from fvta_memexqa_tpu.config import ModelConfig

    with pytest.raises(ValueError, match="dtype"):
        ModelConfig(dtype="bf16")
    with pytest.raises(ValueError, match="attention"):
        ModelConfig(attention="focal")
    with pytest.raises(ValueError, match="similarity"):
        ModelConfig(similarity="cosine")
    ModelConfig(dtype="bfloat16")  # the valid spellings still construct
    ModelConfig(dtype="float32")


def test_serve_http_rejects_half_tls():
    """--tls-cert without --tls-key (or vice versa) must be a startup error,
    never a silent plaintext listener (DESIGN.md 'Serving security')."""
    from fvta_memexqa_tpu.serve import serve_http

    with pytest.raises(ValueError, match="tls-cert and --tls-key"):
        serve_http(None, None, {}, tls_cert="cert.pem")
    with pytest.raises(ValueError, match="tls-cert and --tls-key"):
        serve_http(None, None, {}, tls_key="key.pem")
