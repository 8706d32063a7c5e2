"""Central kernel-path configuration.

Every performance knob that gates a kernel path (Pallas fused solve /
estimator chain / re-attachment VJP, solver matmul precision, warm start,
solver budgets) lives in one frozen dataclass instead of scattered
``os.environ`` reads. Resolution order:

1. an explicit override installed with :func:`set_kernel_config` (drivers
   expose ``--kernel-config key=val,...`` and call this once at startup);
2. otherwise the ``IMNF_*`` environment variables (one per field, listed in
   each field's comment) — kept for quick experiments and the test suite;
3. otherwise the measured-default values below (the fastest known-correct
   configuration on TPU v5e, NOTES_ROUND1.md).

The reference has no analogue (no config system at all — SURVEY.md §5
"Config / flag system"); these knobs configure machinery the reference
doesn't have.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, fields, replace


@dataclass(frozen=True)
class KernelConfig:
    # --- numerics ---------------------------------------------------------
    # XLA dot/conv precision inside fixed-point solves (the root is pinned
    # by the eps criterion, not the iteration precision):
    # "float32" | "tensorfloat32" | "bfloat16".            [IMNF_SOLVER_PRECISION]
    solver_precision: str = "tensorfloat32"
    # backward implicit-gradient solve precision: "f32" | "bf16". [IMNF_BWD_PRECISION]
    bwd_precision: str = "bf16"
    # re-attachment (differentiable primal) precision: "f32" | "bf16" | "tf32".
    #                                                     [IMNF_REATTACH_PRECISION]
    reattach_precision: str = "bf16"
    # run the Neumann estimator chains in bfloat16.              [IMNF_BF16_EST]
    bf16_est: bool = True
    # precision-ladder tail(s) for the fused forward/inverse solves: after
    # solver-precision iterations converge/stall/cap out, re-arm the
    # still-unconverged examples at these precisions (comma-separated
    # stages, ascending) under the same shared iteration budget. Fixes the
    # tf32 arithmetic noise floor (experiments/hard_regime_r3_final.json:
    # ~17% of mid-training examples stuck between eps and 3x eps) without
    # paying f32 on the examples that don't need it. Default (r5): the
    # 4-pass tf32x emulation first — it strictly converges the same
    # examples as f32 on the saturated bench checkpoint at 2/3 the per-dot
    # cost (solve_lab_multi2.json) — with f32 kept as the backstop for the
    # conditioning-limited late-training regime where tf32x's floor shows
    # (BENCH r4 final-ckpt conv3eps 0.656 under tf32x-only vs 1.0 under
    # f32). "" disables.                                  [IMNF_SOLVER_TAIL]
    solver_tail: str = "tf32x,f32"
    # forced phase-1 iteration cap before the ladder switches precision even
    # without a stall exit; 0 = auto (threshold // 2).     [IMNF_LADDER_START]
    ladder_start: int = 0

    # --- Pallas kernel gates ---------------------------------------------
    # fused forward/inverse Broyden solve kernel: "0" (XLA while_loop),
    # "1" (Pallas on TPU), "interpret" (CPU interpreter, tests). [IMNF_FUSED_SOLVE]
    fused_solve: str = "1"
    # engage the fused solve only at H*W >= this (8x8 scales stay XLA
    # unless lane-packing applies).                      [IMNF_FUSED_SOLVE_MIN_HW]
    fused_solve_min_hw: int = 256
    # fused backward implicit-gradient solve kernel.             [IMNF_FUSED_BWD]
    fused_bwd: str = "1"
    # fused re-attachment fwd+VJP kernel.                   [IMNF_FUSED_REATTACH]
    fused_reattach: str = "1"
    # fused Neumann estimator chain kernel.                    [IMNF_FUSED_CHAIN]
    fused_chain: str = "1"
    # fused estimator-final VJP pair kernel.                   [IMNF_FUSED_FINAL]
    fused_final: str = "1"
    # estimator-chain kernels engage at H*W >= this.          [IMNF_FUSED_MIN_HW]
    fused_min_hw: int = 256
    # merged solve+estimator mega-kernel (measured SLOWER on v5e; known
    # prot-break estimator deviation — see implicit_block.py): "0" | "1" |
    # "interpret".                                             [IMNF_FUSED_BLOCK]
    fused_block: str = "0"
    # lane-packing target for batch-tiled small-scale kernels.
    #                                                    [IMNF_FUSED_PACK_LANES]
    fused_pack_lanes: int = 256
    # separate lane-packing target for the fixed-trip-count estimator-chain
    # kernels: unlike the solves these have no per-example early exit, so
    # packing has no convoy cost and amortises weight DMAs.
    #                                                    [IMNF_CHAIN_PACK_LANES]
    chain_pack_lanes: int = 256
    # experimental Pallas rank-1 Broyden update inside the XLA solver
    # (measured ~7x slower than XLA's fusion at CIFAR shapes).   [IMNF_PALLAS]
    pallas_broyden: bool = False
    # estimator final-term form: "vjp" | "dots".              [IMNF_FINAL_FORM]
    final_form: str = "vjp"
    # keep the Broyden secant factors (U/V rank-1 planes) in VMEM scratch
    # refs with dynamic stores + a dynamic-trip-count contraction loop,
    # instead of a 2K-plane while_loop carry with an unrolled ring-buffer
    # select. Skips the O(threshold - nstep) dead-plane work each iteration
    # (r5; measured on the sustained bench).               [IMNF_SECANT_REFS]
    secant_refs: bool = True

    # --- solver budgets / behavior ---------------------------------------
    # initialize the forward solve at z0 = x (the block input) instead of
    # zeros. NOT a cross-step root cache: each solve is independent; the
    # reference's init is zeros (implicit_block.py:73).     [IMNF_WARM_START]
    warm_start: bool = True
    # override the forward / backward Broyden iteration budgets
    # (None = the block's constructor arguments).  [IMNF_FWD_THRESHOLD / _BWD_]
    fwd_threshold: int | None = None
    bwd_threshold: int | None = None
    # per-example stall exit: freeze an example whose best objective improved
    # < stall_rtol relative over the last stall_patience iterations, but ONLY
    # once it is already within stall_guard * eps of tolerance — the
    # per-example analog of the reference's "hardly any progress" break,
    # which fires only below 3x eps (reference broyden.py:165-168).
    # stall_patience 0 disables the stall exit entirely; stall_guard <= 0
    # removes the guard (any-objective stalling — the round-2 behavior,
    # which silently froze far-from-root examples mid-training).
    #            [IMNF_STALL_PATIENCE / IMNF_STALL_RTOL / IMNF_STALL_GUARD]
    stall_patience: int = 5
    stall_rtol: float = 0.05
    stall_guard: float = 3.0
    # initial Broyden direction: the reference steps -g first (broyden.py:146
    # `update = -gx`), which for these residuals (dg/dz ~= -(I + J_gz), so
    # J^-1 ~= -I, Newton direction +g) moves AWAY from the root on iteration
    # 1 and is corrected by the secant updates afterwards. newton_init=True
    # starts with +g instead.                               [IMNF_NEWTON_INIT]
    newton_init: bool = True
    # per-example Armijo backtracking line search on every Broyden step (the
    # reference's ls flag, broyden.py:24-99,123 — off by default there too).
    # Opt-in for hard regimes; implemented on BOTH the XLA and the fused
    # Pallas paths (round 4 — bounded 2-trial quadratic-interpolant
    # backtracking, up to +2 residual evals per failing iteration). The
    # merged fused_block experiment still bails to XLA under it.
    #                                                       [IMNF_LINE_SEARCH]
    line_search: bool = False

    # --- diagnostics ------------------------------------------------------
    # print per-solve diagnostics from inside the step.     [IMNF_DEBUG_SOLVER]
    debug_solver: bool = False
    # ablation switch for step profiling: "" | "reattach" | "final" | ...
    #                                                             [IMNF_ABLATE]
    ablate: str = ""
    # donate step buffers to jit (fails on the axon tunnel runtime).
    #                                                             [IMNF_DONATE]
    donate: bool = False


_ENV_BY_FIELD = {
    "solver_precision": "IMNF_SOLVER_PRECISION",
    "bwd_precision": "IMNF_BWD_PRECISION",
    "reattach_precision": "IMNF_REATTACH_PRECISION",
    "bf16_est": "IMNF_BF16_EST",
    "solver_tail": "IMNF_SOLVER_TAIL",
    "ladder_start": "IMNF_LADDER_START",
    "fused_solve": "IMNF_FUSED_SOLVE",
    "fused_solve_min_hw": "IMNF_FUSED_SOLVE_MIN_HW",
    "fused_bwd": "IMNF_FUSED_BWD",
    "fused_reattach": "IMNF_FUSED_REATTACH",
    "fused_chain": "IMNF_FUSED_CHAIN",
    "fused_final": "IMNF_FUSED_FINAL",
    "fused_min_hw": "IMNF_FUSED_MIN_HW",
    "fused_block": "IMNF_FUSED_BLOCK",
    "fused_pack_lanes": "IMNF_FUSED_PACK_LANES",
    "chain_pack_lanes": "IMNF_CHAIN_PACK_LANES",
    "pallas_broyden": "IMNF_PALLAS",
    "final_form": "IMNF_FINAL_FORM",
    "secant_refs": "IMNF_SECANT_REFS",
    "warm_start": "IMNF_WARM_START",
    "fwd_threshold": "IMNF_FWD_THRESHOLD",
    "bwd_threshold": "IMNF_BWD_THRESHOLD",
    "stall_patience": "IMNF_STALL_PATIENCE",
    "stall_rtol": "IMNF_STALL_RTOL",
    "stall_guard": "IMNF_STALL_GUARD",
    "newton_init": "IMNF_NEWTON_INIT",
    "line_search": "IMNF_LINE_SEARCH",
    "debug_solver": "IMNF_DEBUG_SOLVER",
    "ablate": "IMNF_ABLATE",
    "donate": "IMNF_DONATE",
}

_OPTIONAL_INT = {"fwd_threshold", "bwd_threshold"}


def _coerce(field_type, name, raw):
    if name in _OPTIONAL_INT:
        return int(raw)
    if field_type == "bool":
        return raw not in ("0", "", "false", "False")
    if field_type == "int":
        return int(raw)
    if field_type == "float":
        return float(raw)
    return raw


def reference_semantics() -> KernelConfig:
    """Solver-behavior knobs pinned to the installed reference's semantics
    for apples-to-apples parity runs (advisor round 3): zero-init solves
    (implicit_block.py:73), -g first direction (broyden.py:146), no
    per-example stall exit (the reference's stall break is batch-global,
    broyden.py:165-168), no precision ladder. Enable with
    IMNF_REFERENCE_SEMANTICS=1 (env overrides still apply on top); drivers
    additionally default --mem-eff to True under it."""
    return KernelConfig(
        warm_start=False, newton_init=False, stall_patience=0,
        solver_tail="", solver_precision="float32")


def reference_semantics_requested() -> bool:
    return os.environ.get("IMNF_REFERENCE_SEMANTICS", "") not in ("", "0")


def from_env() -> KernelConfig:
    """KernelConfig with IMNF_* environment overrides applied (on top of the
    reference-semantics preset when IMNF_REFERENCE_SEMANTICS=1)."""
    base = reference_semantics() if reference_semantics_requested() \
        else KernelConfig()
    kwargs = {}
    for f in fields(KernelConfig):
        raw = os.environ.get(_ENV_BY_FIELD[f.name])
        if raw is not None:
            kwargs[f.name] = _coerce(f.type if isinstance(f.type, str) else
                                     f.type.__name__, f.name, raw)
    return replace(base, **kwargs)


_override: KernelConfig | None = None


def set_kernel_config(cfg: KernelConfig | None) -> None:
    """Install a process-wide config (drivers call this once at startup;
    None removes the override and falls back to env resolution)."""
    global _override
    _override = cfg


def kernel_config() -> KernelConfig:
    """The active config: the driver-installed override, else env-resolved.
    Called at trace time only (jit call sites), so per-call env reads are
    free at execution time."""
    return _override if _override is not None else from_env()


def parse_overrides(spec: str) -> KernelConfig:
    """Parse a driver ``--kernel-config "key=val,key=val"`` string into a
    KernelConfig on top of the env-resolved base. Unknown keys raise."""
    cfg = from_env()
    if not spec:
        return cfg
    valid = {f.name: f for f in fields(KernelConfig)}
    updates = {}
    for item in spec.split(","):
        k, _, v = item.partition("=")
        k = k.strip()
        if k not in valid:
            raise ValueError(
                f"unknown kernel-config key {k!r}; valid: {sorted(valid)}")
        t = valid[k].type if isinstance(valid[k].type, str) else valid[k].type.__name__
        updates[k] = _coerce(t, k, v.strip())
    return replace(cfg, **updates)


def add_kernel_config_flag(parser) -> None:
    """--kernel-config flag for the drivers; main() should call
    apply_kernel_config_flag(args)."""
    names = ", ".join(f.name for f in fields(KernelConfig))
    parser.add_argument(
        "--kernel-config", type=str, default=None,
        help="comma-separated key=val kernel-path overrides (pinned for the "
             f"whole run; otherwise IMNF_* env vars apply). Keys: {names}")


def apply_kernel_config_flag(args) -> None:
    spec = getattr(args, "kernel_config", None)
    if spec:
        set_kernel_config(parse_overrides(spec))
