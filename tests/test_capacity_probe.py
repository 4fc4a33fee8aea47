"""Capacity probe (BASELINE.md 'Largest-T capacity'): the measurement machinery
must keep running on CPU so the on-chip numbers stay reproducible — both
attention paths execute at small T, the fused path actually engages (S>=8
dispatch), and the CP memory table reports the per-device reduction."""

import jax
import pytest

from fvta_memexqa_tpu.capacity_probe import _run_at_t, cp_memory_table


def test_both_paths_run_small_t():
    # small T, probe shapes (J=512 long-question regime); must not raise
    _run_at_t(64, use_pallas=False, batch=2, j=512, d=16, s=8)
    _run_at_t(64, use_pallas=True, batch=2, j=512, d=16, s=8)


def test_pallas_probe_hits_fused_path(monkeypatch):
    """The probe exists to measure the fused kernel; if dispatch silently
    routes its shapes to the XLA path (the round-3 s=1 bug), the probe
    measures XLA twice and records a fake tie. Assert the kernel entry is
    reached at probe shapes."""
    import fvta_memexqa_tpu.ops.fvta_pallas as fp

    called = {}
    real = fp._core

    def spy(*a, **k):
        called["hit"] = True
        return real(*a, **k)

    monkeypatch.setattr(fp, "_core", spy)
    _run_at_t(64, use_pallas=True, batch=2, j=32, d=16, s=8)
    assert called.get("hit"), "probe shapes dispatched away from the fused kernel"


def test_explicit_t_list_replaces_doubling():
    """--t-list probes exactly the given points (the fine grid that separated
    the training-capacity paths between doubling steps; BASELINE.md round-4)."""
    from fvta_memexqa_tpu.capacity_probe import probe_largest_t

    seen = []
    import fvta_memexqa_tpu.capacity_probe as cp

    real = cp._run_at_t

    def spy(t, use_pallas, *a, **k):
        seen.append(t)
        return real(t, use_pallas, *a, **k)

    orig = cp._run_at_t
    cp._run_at_t = spy
    try:
        out = probe_largest_t(batch=1, j=16, d=16, s=8, t_list=[64, 128])
    finally:
        cp._run_at_t = orig
    assert seen == [64, 128, 64, 128]  # both paths, exactly the listed points
    assert out["xla"]["last_ok_t"] == 128 and out["xla"]["first_oom_t"] is None
    assert out["pallas"]["last_ok_t"] == 128


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_cp_memory_table_reports_reduction():
    out = cp_memory_table(t=4096, batch=2, j=30, d=64, devices=8)
    local = out["local_per_device"]
    cp = out["cp_per_device"]
    assert local["argument_mb"] > cp["argument_mb"] * 4  # ~8x measured on 8 devices
    assert local["temp_mb"] > cp["temp_mb"] * 2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_cp_memory_table_grad_reports_reduction():
    """The round-4 training-capacity conclusion, measured: past the single-chip
    h+dh floor, trainable T scales by sharding h AND dh over the ctx axis —
    per-device argument AND temp bytes of the FULL backward drop with the mesh."""
    out = cp_memory_table(t=4096, batch=2, j=30, d=64, devices=8, grad=True)
    local, cp = out["local_per_device"], out["cp_per_device"]
    assert local["argument_mb"] > cp["argument_mb"] * 4
    # dh (same bytes as h) leaves device-sharded too
    assert local["output_mb"] > cp["output_mb"] * 4
    assert local["temp_mb"] > cp["temp_mb"] * 2


def test_grad_probe_both_paths_run_small_t():
    """Training-capacity probe (--grad): both paths' backwards execute; T is
    chosen so the fused path's block count exceeds _FINALIZE_MAX_BLOCKS and
    the STREAMING backward kernels (not the XLA remat) are what runs."""
    import fvta_memexqa_tpu.ops.fvta_pallas as fp

    t, d = 8192, 16  # j=512 caps tblock via the VMEM budget -> nt > 16
    assert t // fp._pick_tblock(t, s=8, j=512) > fp._FINALIZE_MAX_BLOCKS
    _run_at_t(t, use_pallas=False, batch=1, j=512, d=d, s=8, grad=True)
    _run_at_t(t, use_pallas=True, batch=1, j=512, d=d, s=8, grad=True)
