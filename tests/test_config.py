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


def test_ladder_args_resolution(monkeypatch):
    """_ladder_args: tail engages for tf32-family base modes, no-ops when
    the base already runs f32 or the ladder is disabled; start defaults to
    threshold//2 capped at threshold."""
    from implicit_normalizing_flows_tpu.layers.implicit_block import _ladder_args

    try:
        # defaults (r5): tf32 base + two-stage tf32x,f32 ladder
        C.set_kernel_config(C.KernelConfig())
        assert _ladder_args(30) == {"tail_mode": ("tf32x", "f32"),
                                    "tail_start": 15}
        C.set_kernel_config(C.KernelConfig(solver_tail="f32"))
        assert _ladder_args(30) == {"tail_mode": "f32", "tail_start": 15}
        C.set_kernel_config(C.KernelConfig(ladder_start=40))
        assert _ladder_args(30)["tail_start"] == 30  # capped at budget
        C.set_kernel_config(C.KernelConfig(solver_precision="float32"))
        assert _ladder_args(30) == {}  # base already f32
        C.set_kernel_config(C.KernelConfig(solver_tail=""))
        assert _ladder_args(30) == {}  # disabled
        # stages not stronger than the base mode are dropped
        C.set_kernel_config(C.KernelConfig(solver_precision="tf32x"))
        assert _ladder_args(30)["tail_mode"] == "f32"
        # typo'd stage names raise instead of silently running as tf32
        # (review r5: "fp32" would fall through _make_wdot's dispatch to
        # the 3-pass emulation — a noise-floor backstop with no error)
        C.set_kernel_config(C.KernelConfig(solver_tail="fp32"))
        with pytest.raises(ValueError, match="fp32"):
            _ladder_args(30)
    finally:
        C.set_kernel_config(None)


def test_reference_semantics_preset(monkeypatch):
    """IMNF_REFERENCE_SEMANTICS=1 pins reference solver semantics as the
    env-resolution base; explicit env overrides still win on top."""
    monkeypatch.setenv("IMNF_REFERENCE_SEMANTICS", "1")
    cfg = C.from_env()
    assert cfg.warm_start is False and cfg.newton_init is False
    assert cfg.stall_patience == 0 and cfg.solver_tail == ""
    assert cfg.solver_precision == "float32"
    monkeypatch.setenv("IMNF_NEWTON_INIT", "1")
    assert C.from_env().newton_init is True  # env override on top
