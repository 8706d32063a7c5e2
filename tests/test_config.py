"""KernelConfig: env resolution, driver overrides, precedence."""
import pytest

from implicit_normalizing_flows_tpu import config as C


def test_defaults_and_env(monkeypatch):
    monkeypatch.delenv("IMNF_SOLVER_PRECISION", raising=False)
    assert C.kernel_config().solver_precision == "tensorfloat32"
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    monkeypatch.setenv("IMNF_WARM_START", "0")
    monkeypatch.setenv("IMNF_FUSED_SOLVE_MIN_HW", "64")
    cfg = C.kernel_config()
    assert cfg.solver_precision == "float32"
    assert cfg.warm_start is False
    assert cfg.fused_solve_min_hw == 64


def test_parse_overrides_and_precedence(monkeypatch):
    monkeypatch.setenv("IMNF_BWD_PRECISION", "f32")
    cfg = C.parse_overrides("fused_chain=0,fwd_threshold=12,bf16_est=0")
    assert cfg.fused_chain == "0"
    assert cfg.fwd_threshold == 12
    assert cfg.bf16_est is False
    assert cfg.bwd_precision == "f32"  # env base survives under overrides
    with pytest.raises(ValueError):
        C.parse_overrides("nonsense=1")


def test_set_kernel_config_wins_over_env(monkeypatch):
    monkeypatch.setenv("IMNF_FUSED_SOLVE", "0")
    try:
        C.set_kernel_config(C.parse_overrides("fused_solve=interpret"))
        assert C.kernel_config().fused_solve == "interpret"
    finally:
        C.set_kernel_config(None)
    assert C.kernel_config().fused_solve == "0"
