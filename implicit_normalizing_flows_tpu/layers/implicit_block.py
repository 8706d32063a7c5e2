"""The implicit flow block: ``z`` defined by the root of
``F(x, z) = (x + g_x(x)) - (z + g_z(z)) = 0``.

TPU-native counterpart of ``imBlock``
(``/root/reference/lib/layers/implicit_block.py:103-355``). The reference
implements the implicit gradient with autograd.Function graph surgery and a
frozen *copy* of each net's weights (``nnet_x_copy``/``nnet_z_copy``,
``implicit_block.py:136-141,228-230``); with pure params the snapshot is
implicit, and the whole mechanism reduces to one ``jax.custom_vjp``:

* **primal** — Broyden-solve for ``z_hat`` (no gradient), then return the
  reference's explicit re-attachment value
  ``z = x + g_x(x) - g_z(z_hat)`` (``implicit_block.py:227``);
* **bwd** — given cotangent ``grad``:
  1. Broyden-solve ``u (I + J_gz(z)) = grad`` (``Backward.backward``,
     ``implicit_block.py:196-206``) at the re-attached ``z``;
  2. one VJP of ``(px, pz, xx) -> xx + g_x(xx; px) - g_z(z_hat; pz)`` with
     cotangent ``u`` delivers, in a single pass, the reference's three grad
     paths: ``dL/dx = u (I + J_gx)`` (``:210-213``), ``dL/d theta_x`` and
     ``dL/d theta_z`` through the re-attachment (``:227``).

Forward, inverse (sampling) and backward all reuse the same Broyden kernel
with different (net roles, eps, init) — the key symmetry of the reference
(SURVEY.md §3.2).

The log-det term ``logdet|dz/dx| = logdet(I + J_gx)(x) - logdet(I + J_gz)(z)``
is estimated by the shared estimator family in ``ops.logdet``
(``_logdetgrad``, ``implicit_block.py:245-350``); gradients through ``z``
route through the custom VJP automatically. ``grad_in_forward`` maps to
``jax.checkpoint`` (rematerialisation) rather than the reference's
backprop-in-forward ``MemoryEfficientLogDetEstimator`` (``:373-415``) — same
memory/compute trade, expressed to the XLA scheduler.
"""
from __future__ import annotations
from ..config import kernel_config

import math
import os

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import logdet as ld
from ..ops.broyden import broyden as broyden_solve
from ..ops.broyden import fixed_point_iteration, root_solve
from .protocol import Flow, make_vars

__all__ = ["ImplicitBlock", "SolverConfig"]


@dataclass(frozen=True)
class SolverConfig:
    """Solver budgets (reference defaults: implicit_block.py:120-123).

    ``warm_start``: start the forward/inverse Broyden solve from the input
    instead of zeros. The reference always starts from zeros
    (implicit_block.py:73) — for contractive residuals the root is near the
    input, so the warm start converges in fewer iterations to the same root.
    """

    eps_forward: float = 1e-6
    eps_backward: float = 1e-10
    eps_sample: float = 1e-5
    threshold: int = 30
    # warm_start default ON (reference starts from zeros): verified
    # root-equivalent (same eps*sqrt(D) stopping criterion => same root
    # quality), and with the fused solve kernel it cuts the forward solve
    # from ~4 to ~2.5 iterations (80.2 -> 76.4 ms/step on the CIFAR recipe,
    # bpd identical). IMNF_WARM_START=0 restores cold starts.
    # Backward (implicit-gradient) solve budget. The reference shares the
    # forward budget (30, implicit_block.py:230) with eps 1e-10 that no
    # arithmetic reaches; measured full-step gradients vs the budget-30
    # truth on the CIFAR recipe: budget 8 cos 1.0 / rel 8e-6, budget 4
    # cos 1.0 / rel 2e-5, budget 2 cos 0.9999946 / rel 3.3e-3
    # (experiments/bwd_budget_sweep.py) — the solve is a fixed linear system
    # whose conditioning is pinned by the Lipschitz coeff, so the truncation
    # error does not drift over training. Default 4 keeps the error 2+
    # orders below the estimator's Monte-Carlo noise while saving ~87% of
    # backward-solve evals (bench bpd identical to 4 decimals).
    # IMNF_BWD_THRESHOLD overrides.
    threshold_backward: int = 4
    banach_threshold: int = 1000
    warm_start: bool = False
    # Per-example stall exit (wall-clock only; the best iterate is returned
    # either way). None disables for strict reference iteration counts.
    # stall_rtol must sit above the arithmetic noise floor of the net evals
    # (TPU default-precision convs jitter the residual by ~1%), else noise
    # dips keep resetting the patience counter and the loop runs the full
    # budget. stall_guard restricts the stall exit to examples already
    # within guard*eps of tolerance — matching the reference, whose "hardly
    # any progress" break only fires below 3x eps (broyden.py:165-168);
    # None stalls at any objective (the round-2 behavior, which froze
    # far-from-root examples at saturated Lipschitz constants).
    stall_patience: int | None = 5
    stall_rtol: float = 0.05
    stall_guard: float | None = 3.0
    # First Broyden direction +g (Newton under the solver's own J^-1 ~= -I
    # init) instead of the reference's -g; see ops.broyden.broyden.
    newton_init: bool = True
    # Opt-in Armijo line search (reference ls flag). Honored by BOTH solver
    # paths since r5: the fused kernels run the bounded 2-trial schedule
    # (ops/broyden.py:144-154 documents the cubic-tail deviation).
    line_search: bool = False


def _sg(tree):
    return jax.tree.map(jax.lax.stop_gradient, tree)


def _solver_diag(nstep, converged, prot, diff, eps_i):
    """Per-block solver telemetry, 5 f32 scalars:

    [max nstep, strict-converged fraction (diff < eps_i), any prot_break,
     batch-RMS residual over the per-example tolerance, fraction within
     3x eps_i].

    The RMS ratio is EXACTLY the reference's stopping test: the reference
    iterates until ``||G||_F < eps * sqrt(B*D)`` (broyden.py:131,146), i.e.
    until rms_over_tol < 1 — a batch-global criterion that lets individual
    rows sit above the per-example tolerance. The 3x band is the
    reference's own acceptance region for its "hardly any progress" break
    (broyden.py:165-168). Strict per-example convergence (element 1) is
    HARSHER than anything the reference measures; at saturated Lipschitz
    constants even an exact f32 budget-120 solve leaves ~5-12% of examples
    above eps_i (experiments/hard_regime_r3.json) while bpd differs from
    the truth solve by < 4e-4 — so health is judged on elements 3-4, with
    element 1 reported for transparency."""
    diff = diff.astype(jnp.float32)
    return jnp.stack([
        jnp.max(nstep).astype(jnp.float32),
        jnp.mean(converged.astype(jnp.float32)),
        jnp.any(prot).astype(jnp.float32),
        jnp.sqrt(jnp.mean(diff ** 2)) / eps_i,
        jnp.mean((diff < 3.0 * eps_i).astype(jnp.float32)),
    ])


def _xla_solver_precision():
    """solver_precision as a jax matmul-precision name ('tf32x' is a
    kernel-only 4-pass mode; the XLA paths run it as tensorfloat32)."""
    prec = kernel_config().solver_precision
    return "tensorfloat32" if prec == "tf32x" else prec


def _fused_solve_mode():
    prec = kernel_config().solver_precision
    if prec in ("float32", "highest"):
        return "f32"
    if prec == "tf32x":
        return "tf32x"
    return "tf32"


_PREC_RANK = {"bf16": 0, "tf32": 1, "tf32x": 2, "f32": 3}


def _ladder_args(threshold):
    """Precision-ladder kwargs for the fused solves (config.solver_tail):
    phase 1 at solver_precision, unconverged examples re-armed at the tail
    precision(s) under the shared budget. ``solver_tail`` may name multiple
    comma-separated stages (r5: "tf32x,f32" — the cheaper 4-pass emulation
    first, f32 as the backstop); stages not strictly higher precision than
    the base mode are dropped. No-op when nothing remains."""
    kc = kernel_config()
    t = kc.solver_tail
    if not t or t in ("none", "0"):
        return {}
    mode = _fused_solve_mode()
    stages = tuple(m.strip() for m in t.split(",") if m.strip())
    bad = [m for m in stages if m not in _PREC_RANK]
    if bad:
        # An unknown name would fall through _make_wdot's mode dispatch and
        # silently execute as the 3-pass tf32 emulation — i.e. a typo'd
        # "f32 backstop" would run at the tf32 noise floor with no error.
        raise ValueError(
            f"IMNF_SOLVER_TAIL: unknown precision stage(s) {bad}; "
            f"valid: {sorted(_PREC_RANK)}")
    stages = tuple(m for m in stages
                   if _PREC_RANK[m] > _PREC_RANK.get(mode, 0))
    if not stages:
        return {}
    start = kc.ladder_start if kc.ladder_start > 0 else max(1, threshold // 2)
    return {"tail_mode": stages if len(stages) > 1 else stages[0],
            "tail_start": min(start, threshold)}


def _pack_reps_for(x, target=None):
    """Examples lane-packed per kernel program for this input's spatial
    dims (``ops.fused_chain.choose_reps``): 1 at 32x32, up to 16 at the 8x8
    scale, so the fused kernels keep full 128-lane MXU tiles everywhere.
    ``target`` overrides the lane target (the chain kernels use
    ``chain_pack_lanes`` — no early exit, so no convoy cost to packing)."""
    from ..ops.fused_chain import choose_reps

    return choose_reps(x.shape[0], x.shape[2], x.shape[3], target)


def _fused_solve_data(nnet_a, nnet_b, va, vb, x):
    """Gate for the fused Pallas Broyden solve (ops.fused_solve): returns
    (data_a, data_b, interpret, reps) when both nets match the conv-stack
    pattern and the device/shape gates pass, else None. IMNF_FUSED_SOLVE=0
    disables, =interpret forces the interpreter path for CPU tests."""
    mode = kernel_config().fused_solve
    if mode == "0" or x.ndim != 4:
        return None
    interp = mode == "interpret"
    reps = _pack_reps_for(x)
    if not interp:
        if jax.devices()[0].platform != "tpu":
            return None
        if reps * x.shape[2] * x.shape[3] < kernel_config().fused_solve_min_hw:
            return None
    get_a = getattr(nnet_a, "conv_forward_data", None)
    get_b = getattr(nnet_b, "conv_forward_data", None)
    if not (get_a and get_b):
        return None
    da, db = get_a(va), get_b(vb)
    if da is None or db is None:
        return None
    return da, db, interp, reps


def _make_implicit_forward(nnet_x, nnet_z, cfg: SolverConfig):
    """Build the custom-VJP solve for one block (closures are created once per
    block so jit caches stay stable)."""
    apply_x, apply_z = nnet_x.apply, nnet_z.apply

    def fused_solve(vx, vz, x, fd):
        """Whole-solve Pallas path: both nets' conv evals + Broyden state in
        one kernel launch (ops.fused_solve); per-example Banach fallback for
        protective-break rows stays on the XLA path (rare, under lax.cond)."""
        from ..ops.fused_solve import fused_broyden_solve

        data_x, data_z, interp, reps = fd
        xs = jax.lax.stop_gradient(x)
        res = fused_broyden_solve(
            xs, data_x, data_z,
            threshold=cfg.threshold, eps=cfg.eps_forward,
            stall_patience=cfg.stall_patience, stall_rtol=cfg.stall_rtol,
            stall_guard=cfg.stall_guard, newton_init=cfg.newton_init,
            warm_start=cfg.warm_start, mode=_fused_solve_mode(),
            line_search=cfg.line_search,
            secant_refs=kernel_config().secant_refs,
            interpret=interp, reps=reps, **_ladder_args(cfg.threshold))

        B = x.shape[0]
        flat = lambda a: a.reshape(B, -1)
        unflat = lambda a: a.reshape(x.shape)

        def with_fb(args):
            zb, gb = args
            prec = _xla_solver_precision()
            with jax.default_matmul_precision(prec):
                x_embed = flat(apply_x(_sg(vx), xs)) + flat(xs)
                bg = lambda zf: x_embed - flat(apply_z(_sg(vz), unflat(zf)))
                fb = fixed_point_iteration(
                    bg, flat(xs), threshold=cfg.banach_threshold,
                    eps=cfg.eps_forward)
                gfb = bg(fb) - fb
            take = res.prot_break[:, None]
            return jnp.where(take, fb, zb), jnp.where(take, gfb, gb)

        zf, gf = jax.lax.cond(
            jnp.any(res.prot_break), with_fb, lambda args: args,
            (flat(res.result), flat(res.gx)))
        eps_i = cfg.eps_forward * (x[0].size ** 0.5)
        diag = _solver_diag(res.nstep, res.converged, res.prot_break,
                            res.diff, eps_i)
        return unflat(zf), unflat(zf + gf), diag

    def solve_z(vars_x, vars_z, x):
        B = x.shape[0]
        flat = lambda a: a.reshape(B, -1)
        unflat = lambda a: a.reshape(x.shape)
        vx, vz = _sg(vars_x), _sg(vars_z)
        fd = _fused_solve_data(nnet_x, nnet_z, vx, vz, x)
        if fd is not None:
            return fused_solve(vx, vz, x, fd)
        # The fixed-point evals run at a raised matmul precision
        # (IMNF_SOLVER_PRECISION, default tensorfloat32 = 3-pass bf16): at
        # TPU default (1-pass bf16) the residual noise floor sits above
        # eps*sqrt(D) and the quasi-Newton superlinear rate collapses to a
        # slow linear crawl that burns the whole 30-iteration budget; at
        # raised precision the solve converges in ~4-5 iterations, which is
        # cheaper even at 3x per-eval cost.
        prec = _xla_solver_precision()
        with jax.default_matmul_precision(prec):
            x_embed = flat(apply_x(vx, x)) + flat(x)
            g = lambda zf: x_embed - flat(apply_z(vz, unflat(zf))) - zf
            banach_g = lambda zf: x_embed - flat(apply_z(vz, unflat(zf)))
            z0 = flat(jax.lax.stop_gradient(x)) if cfg.warm_start else jnp.zeros_like(flat(x))
            zf, res = root_solve(
                g, banach_g, z0,
                threshold=cfg.threshold, eps=cfg.eps_forward,
                banach_x0=flat(jax.lax.stop_gradient(x)),
                banach_threshold=cfg.banach_threshold,
                stall_patience=cfg.stall_patience, stall_rtol=cfg.stall_rtol,
                stall_guard=cfg.stall_guard, newton_init=cfg.newton_init,
                line_search=cfg.line_search,
            )
        # The re-attachment value (implicit_block.py:227) needs no extra net
        # evals: z_reatt = x + g_x(x) - g_z(z_hat) = x_embed - g_z(z_hat)
        # = z_hat + g(z_hat), and the solver already holds the residual at
        # the returned root (res.gx). Saves one apply_x + one apply_z per
        # block per step versus recomputing the expression.
        z_reatt = unflat(zf + res.gx)
        # First-class solver telemetry (BASELINE.md: Broyden iters-to-converge
        # tracked as a metric; reference only surfaces it on failure,
        # broyden.py:165-172); see _solver_diag.
        diag = _solver_diag(res.nstep, res.converged, res.prot_break,
                            res.diff, res.eps[0])
        return unflat(zf), z_reatt, diag

    @jax.custom_vjp
    def implicit_forward(vars_x, vars_z, x):
        # Re-attachment (implicit_block.py:227) assembled from solver values
        # (see solve_z). Under custom_vjp the primal is not itself
        # differentiated — bwd below reproduces its exact gradient paths.
        _, z, diag = solve_z(vars_x, vars_z, x)
        return z, diag

    def fwd(vars_x, vars_z, x):
        z_hat, z, diag = solve_z(vars_x, vars_z, x)
        z_hat = jax.lax.stop_gradient(z_hat)
        return (z, diag), (vars_x, vars_z, x, z_hat, z)

    bwd_core = _make_bwd_core(nnet_x, nnet_z, cfg)

    def bwd(res, grads):
        grad, _ = grads  # diag cotangent is symbolically zero
        return bwd_core(res, grad)

    implicit_forward.defvjp(fwd, bwd)
    return implicit_forward


def _make_bwd_core(nnet_x, nnet_z, cfg: SolverConfig):
    """The implicit-gradient backward shared by both custom-VJP forwards."""
    apply_x, apply_z = nnet_x.apply, nnet_z.apply

    def bwd_core(res, grad):
        vars_x, vars_z, x, z_hat, z = res
        B = x.shape[0]
        flat = lambda a: a.reshape(B, -1)
        unflat = lambda a: a.reshape(x.shape)
        vz_sg = _sg(vars_z)

        # Solve u (I + J_gz) = grad at the re-attached z (Backward.backward,
        # implicit_block.py:196-206) with the backward tolerance budget.
        # The backward-solve J_gz VJPs run in bfloat16 by default (the linear
        # solve's f32 state and the final re-attachment VJP are unaffected);
        # measured bpd identical with an 8% step cut. IMNF_BF16_BWD=0 restores
        # f32.
        bwd_mode = kernel_config().bwd_precision
        if bwd_mode == "bf16":
            vz_bf = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16) if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                vz_sg)

        # Fused-kernel backward solve (ops.fused_solve.fused_backward_solve):
        # the J_gz linearization tensors stay VMEM-resident across all
        # iterations instead of being re-streamed per VJP application.
        # IMNF_FUSED_BWD=0 disables, =interpret for CPU tests.
        u = None
        fused_bwd = kernel_config().fused_bwd
        if fused_bwd != "0" and x.ndim == 4 and bwd_mode in ("bf16", "f32"):
            interp = fused_bwd == "interpret"
            reps = _pack_reps_for(x)
            dev_ok = interp or (
                jax.devices()[0].platform == "tpu"
                and reps * x.shape[2] * x.shape[3] >= kernel_config().fused_solve_min_hw)
            get_cd = getattr(nnet_z, "conv_chain_data", None)
            if dev_ok and get_cd:
                z_sg = jax.lax.stop_gradient(z)
                cd = (get_cd(vz_bf, z_sg.astype(jnp.bfloat16))
                      if bwd_mode == "bf16" else get_cd(vz_sg, z_sg))
                if cd is not None:
                    from ..ops.fused_solve import fused_backward_solve
                    u = fused_backward_solve(
                        grad, cd,
                        threshold=cfg.threshold_backward, eps=cfg.eps_backward,
                        stall_patience=cfg.stall_patience,
                        stall_rtol=cfg.stall_rtol, stall_guard=cfg.stall_guard,
                        newton_init=cfg.newton_init,
                        line_search=cfg.line_search,
                        secant_refs=kernel_config().secant_refs,
                        mode=bwd_mode, interpret=interp, reps=reps)

        if u is None:
            if bwd_mode == "bf16":
                Fz = lambda zz: (apply_z(vz_bf, zz.astype(jnp.bfloat16)).astype(jnp.float32) + zz)
            else:
                Fz = lambda zz: apply_z(vz_sg, zz) + zz
            with jax.default_matmul_precision(
                    "tensorfloat32" if bwd_mode == "tf32" else "bfloat16"
                    if bwd_mode == "bf16" else "float32"):
                _, vjp_z = jax.vjp(Fz, jax.lax.stop_gradient(z))
                gfun = lambda uf: flat(vjp_z(unflat(uf))[0]) - flat(grad)
                ures = broyden_solve(
                    gfun, jnp.zeros_like(flat(grad)),
                    threshold=cfg.threshold_backward, eps=cfg.eps_backward,
                    stall_patience=cfg.stall_patience, stall_rtol=cfg.stall_rtol,
                    stall_guard=cfg.stall_guard, newton_init=cfg.newton_init,
                    line_search=cfg.line_search,
                )
            if kernel_config().debug_solver:
                jax.debug.print(
                    "bwd solve: nstep={n} best={b:.3e} eps={e:.3e}",
                    n=ures.nstep, b=jnp.max(ures.diff), e=ures.eps[0])
            u = unflat(ures.result)

        # Timing-attribution ablation (WRONG gradients — perf experiments
        # only): skip the re-attachment VJP entirely.
        if kernel_config().ablate == "reattach":
            return (jax.tree.map(jnp.zeros_like, vars_x),
                    jax.tree.map(jnp.zeros_like, vars_z), u)

        # Fused-kernel re-attachment VJP (ops.fused_solve.fused_reattach_vjp):
        # both nets' forward intermediates, data-grad and weight-grad passes
        # in one launch with everything VMEM-resident; only the tiny
        # soft-normalization pullback (effective weight <- raw weight) stays
        # on the XLA path, via jax.vjp of conv_forward_data.
        # IMNF_FUSED_REATTACH=0 disables, =interpret for CPU tests.
        fused_re = kernel_config().fused_reattach
        if fused_re != "0" and x.ndim == 4:
            interp = fused_re == "interpret"
            reps = _pack_reps_for(x)
            dev_ok = interp or (
                jax.devices()[0].platform == "tpu"
                and reps * x.shape[2] * x.shape[3] >= kernel_config().fused_solve_min_hw)
            get_x = getattr(nnet_x, "conv_forward_data", None)
            get_z = getattr(nnet_z, "conv_forward_data", None)
            if dev_ok and get_x and get_z:
                probe_x = get_x(_sg(vars_x))
                probe_z = get_z(_sg(vars_z))
                if probe_x is not None and probe_z is not None:
                    from ..ops.fused_solve import fused_reattach_vjp

                    strip = lambda d: {k: v for k, v in d.items()
                                       if k != "preact"}

                    def fwd_data(vx_, vz_):
                        return strip(get_x(vx_)), strip(get_z(vz_))

                    (ax_, az_), vjp_data = jax.vjp(fwd_data, vars_x, vars_z)
                    data_x = dict(ax_, preact=probe_x["preact"])
                    data_z = dict(az_, preact=probe_z["preact"])
                    mode = kernel_config().reattach_precision
                    d_x, d_ax, d_az = fused_reattach_vjp(
                        jax.lax.stop_gradient(x), z_hat, u, data_x, data_z,
                        mode=mode, interpret=interp, reps=reps)
                    d_vx, d_vz = vjp_data((d_ax, d_az))
                    return d_vx, d_vz, d_x

        # One VJP through the re-attachment delivers d_params_x, d_params_z,
        # and dL/dx = u (I + J_gx) (implicit_block.py:210-213,227).
        def reattach(vx, vz, xx):
            return xx + apply_x(vx, xx) - apply_z(vz, z_hat)

        _, vjp_re = jax.vjp(reattach, vars_x, vars_z, x)
        d_vx, d_vz, d_x = vjp_re(u)
        return d_vx, d_vz, d_x

    return bwd_core


def _make_implicit_forward_est(nnet_x, nnet_z, cfg: SolverConfig):
    """Custom-VJP forward for the merged block kernel
    (``ops.fused_solve.fused_block_forward``): one Pallas launch runs the
    Broyden solve AND both nets' Neumann-chain accumulations, with the
    activation-derivative tensors built in-kernel from the solve's own
    pre-activation byproducts. Extra inputs (probes, signed roulette
    coefficients, chain length) are stop-gradient estimator state; bwd
    returns zero cotangents for them.

    Known deviation (documented): if the protective break fires for a row,
    the Banach fallback patches that row's z, but its chain accumulation is
    reset to the probe (k=0 truncation) instead of being recomputed at the
    fallback root — the reference recomputes the full estimator after the
    fallback (implicit_block.py:74-80). The break never fires in healthy
    training (telemetry broyden_prot == 0) and the reset keeps the loss
    finite rather than propagating a diverged linearization.
    """
    apply_x, apply_z = nnet_x.apply, nnet_z.apply
    bwd_core = _make_bwd_core(nnet_x, nnet_z, cfg)

    def run(vars_x, vars_z, x, eps_x, eps_z, signed, n_power_f):
        from ..ops.fused_solve import fused_block_forward

        vx, vz = _sg(vars_x), _sg(vars_z)
        data_x = nnet_x.conv_forward_data(vx)
        data_z = nnet_z.conv_forward_data(vz)
        xs = jax.lax.stop_gradient(x)
        interp = kernel_config().fused_block == "interpret"
        res, acc_x, acc_z = fused_block_forward(
            xs, data_x, data_z,
            jax.lax.stop_gradient(eps_x), jax.lax.stop_gradient(eps_z),
            jax.lax.stop_gradient(signed), n_power_f,
            threshold=cfg.threshold, eps=cfg.eps_forward,
            stall_patience=cfg.stall_patience, stall_rtol=cfg.stall_rtol,
            stall_guard=cfg.stall_guard, newton_init=cfg.newton_init,
            warm_start=cfg.warm_start, mode=_fused_solve_mode(),
            line_search=cfg.line_search,
            secant_refs=kernel_config().secant_refs,
            interpret=interp, **_ladder_args(cfg.threshold))

        B = x.shape[0]
        flat = lambda a: a.reshape(B, -1)
        unflat = lambda a: a.reshape(x.shape)

        def with_fb(args):
            zb, gb, ax, az = args
            prec = _xla_solver_precision()
            with jax.default_matmul_precision(prec):
                x_embed = flat(apply_x(vx, xs)) + flat(xs)
                bg = lambda zf: x_embed - flat(apply_z(vz, unflat(zf)))
                fb = fixed_point_iteration(
                    bg, flat(xs), threshold=cfg.banach_threshold,
                    eps=cfg.eps_forward)
                gfb = bg(fb) - fb
            take = res.prot_break[:, None]
            return (jnp.where(take, fb, zb), jnp.where(take, gfb, gb),
                    jnp.where(take, flat(eps_x), ax),
                    jnp.where(take, flat(eps_z), az))

        zf, gf, ax, az = jax.lax.cond(
            jnp.any(res.prot_break), with_fb, lambda args: args,
            (flat(res.result), flat(res.gx), flat(acc_x), flat(acc_z)))
        eps_i = cfg.eps_forward * (x[0].size ** 0.5)
        diag = _solver_diag(res.nstep, res.converged, res.prot_break,
                            res.diff, eps_i)
        return (unflat(zf), unflat(zf + gf), diag, unflat(ax), unflat(az))

    @jax.custom_vjp
    def implicit_forward_est(vars_x, vars_z, x, eps_x, eps_z, signed, n_power_f):
        _, z, diag, ax, az = run(vars_x, vars_z, x, eps_x, eps_z, signed, n_power_f)
        return z, diag, ax, az

    def fwd(vars_x, vars_z, x, eps_x, eps_z, signed, n_power_f):
        z_hat, z, diag, ax, az = run(vars_x, vars_z, x, eps_x, eps_z, signed,
                                     n_power_f)
        return (z, diag, ax, az), (vars_x, vars_z, x, z_hat, z,
                                   eps_x, eps_z, signed, n_power_f)

    def bwd(res, grads):
        grad = grads[0]  # diag/acc cotangents are symbolically zero
        vars_x, vars_z, x, z_hat, z, eps_x, eps_z, signed, n_power_f = res
        d_vx, d_vz, d_x = bwd_core((vars_x, vars_z, x, z_hat, z), grad)
        return (d_vx, d_vz, d_x, jnp.zeros_like(eps_x),
                jnp.zeros_like(eps_z), jnp.zeros_like(signed),
                jnp.zeros_like(n_power_f))

    implicit_forward_est.defvjp(fwd, bwd)
    return implicit_forward_est


class ImplicitBlock(Flow):
    """Invertible implicit residual block (reference ``imBlock``)."""

    def __init__(
        self,
        nnet_x,
        nnet_z,
        geom_p=0.5,
        lamb=2.0,
        n_power_series=None,
        exact_trace=False,
        brute_force=False,
        n_samples=1,
        n_exact_terms=2,
        n_exact_terms_test=20,
        n_dist="geometric",
        neumann_grad=True,
        grad_in_forward=True,
        eps_forward=1e-6,
        eps_backward=1e-10,
        eps_sample=1e-5,
        threshold=30,
        series_cap=24,
        warm_start=False,
        n_probes=1,
    ):
        self.nnet_x = nnet_x
        self.nnet_z = nnet_z
        self.geom_p_init = geom_p
        self.lamb_init = lamb
        self.logdet_cfg = ld.LogdetConfig(
            n_dist=n_dist,
            n_samples=n_samples,
            n_power_series=n_power_series,
            n_exact_terms=n_exact_terms,
            n_exact_terms_test=n_exact_terms_test,
            neumann_grad=neumann_grad,
            grad_in_forward=grad_in_forward,
            exact_trace=exact_trace,
            brute_force=brute_force,
            series_cap=series_cap,
            n_probes=n_probes,
        )
        kc = kernel_config()
        self.solver_cfg = SolverConfig(
            eps_forward=eps_forward,
            eps_backward=eps_backward,
            eps_sample=eps_sample,
            threshold=(kc.fwd_threshold if kc.fwd_threshold is not None
                       else threshold),
            threshold_backward=(kc.bwd_threshold
                                if kc.bwd_threshold is not None
                                else min(4, threshold)),
            warm_start=(warm_start or kc.warm_start),
            stall_patience=(kc.stall_patience if kc.stall_patience > 0
                            else None),
            stall_rtol=kc.stall_rtol,
            stall_guard=kc.stall_guard if kc.stall_guard > 0 else None,
            newton_init=kc.newton_init,
            line_search=kc.line_search,
        )
        self._implicit_forward = _make_implicit_forward(
            self.nnet_x, self.nnet_z, self.solver_cfg
        )
        self._implicit_forward_est = _make_implicit_forward_est(
            self.nnet_x, self.nnet_z, self.solver_cfg
        )

    # ---- variables ----
    def init(self, rng, x):
        kx, kz = jax.random.split(rng)
        vx = self.nnet_x.init(kx, x)
        vz = self.nnet_z.init(kz, x)
        p = self.geom_p_init
        params = {
            "nnet_x": vx["params"],
            "nnet_z": vz["params"],
            # stored in logit space like the reference (implicit_block.py:144)
            "geom_p": jnp.asarray(jnp.log(p) - jnp.log1p(-p), jnp.float32),
            "lamb": jnp.asarray(self.lamb_init, jnp.float32),
        }
        state = {
            "nnet_x": vx["state"],
            "nnet_z": vz["state"],
            "last_n_samples": jnp.zeros((self.logdet_cfg.n_samples,), jnp.float32),
            "last_firmom": jnp.zeros((1,), jnp.float32),
            "last_secmom": jnp.zeros((1,), jnp.float32),
            # [nstep, converged, prot_break, rms_over_tol, converged_3eps]
            # (see _solver_diag)
            "solver_diag": jnp.zeros((5,), jnp.float32),
        }
        return make_vars(params, state)

    def _net_vars(self, variables, name):
        return {"params": variables["params"][name], "state": variables["state"][name]}

    def init_forward(self, variables, x, rng=None):
        # z has x's shape; skip the fixed-point solve during param init.
        return x

    # ---- flow protocol ----
    def _merged_forward_ok(self, variables, x, rng, train):
        """Gate for the merged solve+estimator kernel (IMNF_FUSED_BLOCK).

        OFF by default: measured on v5e (CIFAR recipe), the merged kernel is
        SLOWER than the split solve + chain2 kernels (14.8 vs 12.2 ms per
        32x32 block; whole step 85-99 vs 80.4 ms) — the expected XLA-side
        saving never materialises because the linearization recompute was
        already CSE'd with the backward solve's, and the bigger kernel
        schedules worse under Mosaic. Kept as an opt-in experiment
        (IMNF_FUSED_BLOCK=1) and for the interpret-mode estimator oracle."""
        cfg = self.logdet_cfg
        if not (train and rng is not None and x.ndim == 4
                and cfg.neumann_grad and not cfg.grad_in_forward
                and cfg.n_probes <= 1 and not cfg.exact_trace
                and not cfg.brute_force):
            return False
        env = kernel_config().fused_block
        if env == "0":
            return False
        if env != "interpret":
            if jax.devices()[0].platform != "tpu":
                return False
            if x.shape[2] * x.shape[3] < kernel_config().fused_solve_min_hw:
                return False
        get_x = getattr(self.nnet_x, "conv_forward_data", None)
        get_z = getattr(self.nnet_z, "conv_forward_data", None)
        if not (get_x and get_z):
            return False
        vx = _sg(self._net_vars(variables, "nnet_x"))
        vz = _sg(self._net_vars(variables, "nnet_z"))
        return get_x(vx) is not None and get_z(vz) is not None

    def _forward_merged(self, variables, x, logpx, rng):
        """Merged path: solve + both Neumann chains in one kernel, then the
        single differentiable VJP per net (reference estimator semantics,
        implicit_block.py:429-438)."""
        cfg = self.logdet_cfg
        vx = self._net_vars(variables, "nnet_x")
        vz = self._net_vars(variables, "nnet_z")
        k_n, k_ex, k_ez = jax.random.split(rng, 3)
        geom_p = jax.nn.sigmoid(variables["params"]["geom_p"])
        lamb = variables["params"]["lamb"]
        coeffs, n_power, n_samples = ld.sample_n_dist(k_n, cfg, geom_p, lamb, True)
        vareps_x = ld.sample_rademacher(k_ex, (1,) + x.shape, x.dtype)[0]
        vareps_z = ld.sample_rademacher(k_ez, (1,) + x.shape, x.dtype)[0]
        cap = coeffs.shape[0]
        ks = jnp.arange(1, cap + 1)
        signed = jnp.where(ks % 2 == 0, 1.0, -1.0) * jax.lax.stop_gradient(coeffs)

        z, diag, acc_x, acc_z = self._implicit_forward_est(
            vx, vz, x, vareps_x, vareps_z, signed,
            n_power.astype(jnp.float32))

        bf16_est = kernel_config().bf16_est

        def _cast(tree, dtype):
            return jax.tree.map(
                lambda a: a.astype(dtype) if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                tree)

        if bf16_est:
            bf = jnp.bfloat16
            ld_x = ld.neumann_final(self.nnet_x.apply, _cast(vx, bf),
                                    x.astype(bf), vareps_x.astype(bf), acc_x)
            ld_z = ld.neumann_final(self.nnet_z.apply, _cast(vz, bf),
                                    z.astype(bf), vareps_z.astype(bf), acc_z)
        else:
            ld_x = ld.neumann_final(self.nnet_x.apply, vx, x, vareps_x, acc_x)
            ld_z = ld.neumann_final(self.nnet_z.apply, vz, z, vareps_z, acc_z)
        logdet = (ld_x - ld_z).astype(jnp.float32)

        state = dict(variables["state"], solver_diag=jax.lax.stop_gradient(diag))
        if cfg.n_power_series is None:
            est = jax.lax.stop_gradient(logdet)
            state["last_n_samples"] = n_samples.astype(jnp.float32)
            state["last_firmom"] = jnp.mean(est)[None]
            state["last_secmom"] = jnp.mean(est ** 2)[None]
        return z, logpx - logdet, state

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        if logpx is not None and self._merged_forward_ok(variables, x, rng, train):
            return self._forward_merged(variables, x, logpx, rng)
        vx = self._net_vars(variables, "nnet_x")
        vz = self._net_vars(variables, "nnet_z")
        z, diag = self._implicit_forward(vx, vz, x)
        diag = jax.lax.stop_gradient(diag)
        if logpx is None:
            state = dict(variables["state"], solver_diag=diag)
            return z, None, state
        logdet, new_state = self._logdetgrad(variables, z, x, rng, train)
        new_state = dict(new_state, solver_diag=diag)
        return z, logpx - logdet, new_state

    def inverse(self, variables, z, logpz=None, *, rng=None):
        """Solve x s.t. x + g_x(x) = z + g_z(z) — roles swapped, same solver
        with the sampling tolerance (implicit_block.py:236-243)."""
        vx = _sg(self._net_vars(variables, "nnet_x"))
        vz = _sg(self._net_vars(variables, "nnet_z"))
        z = jax.lax.stop_gradient(z)
        B = z.shape[0]
        flat = lambda a: a.reshape(B, -1)
        unflat = lambda a: a.reshape(z.shape)
        fd = _fused_solve_data(self.nnet_z, self.nnet_x, vz, vx, z)
        if fd is not None:
            x = self._fused_inverse(vx, vz, z, fd)
            if logpz is None:
                return x, None
            logdet, _ = self._logdetgrad(variables, z, x, rng, train=False)
            return x, logpz + logdet
        prec = _xla_solver_precision()
        with jax.default_matmul_precision(prec):
            z_embed = flat(self.nnet_z.apply(vz, z)) + flat(z)
            g = lambda xf: z_embed - flat(self.nnet_x.apply(vx, unflat(xf))) - xf
            banach_g = lambda xf: z_embed - flat(self.nnet_x.apply(vx, unflat(xf)))
            x0 = flat(z) if self.solver_cfg.warm_start else jnp.zeros_like(flat(z))
            xf, _ = root_solve(
                g, banach_g, x0,
                threshold=self.solver_cfg.threshold, eps=self.solver_cfg.eps_sample,
                banach_x0=flat(z), banach_threshold=self.solver_cfg.banach_threshold,
                stall_patience=self.solver_cfg.stall_patience,
                stall_rtol=self.solver_cfg.stall_rtol,
                stall_guard=self.solver_cfg.stall_guard,
                newton_init=self.solver_cfg.newton_init,
                line_search=self.solver_cfg.line_search,
            )
        x = unflat(xf)
        if logpz is None:
            return x, None
        logdet, _ = self._logdetgrad(variables, z, x, rng, train=False)
        return x, logpz + logdet

    def _fused_inverse(self, vx, vz, z, fd):
        """Fused-kernel inverse solve (data_a = nnet_z embeds z; nnet_x is
        solved), with the same per-example Banach fallback as the forward."""
        from ..ops.fused_solve import fused_broyden_solve

        data_z, data_x, interp, reps = fd
        cfg = self.solver_cfg
        res = fused_broyden_solve(
            z, data_z, data_x,
            threshold=cfg.threshold, eps=cfg.eps_sample,
            stall_patience=cfg.stall_patience, stall_rtol=cfg.stall_rtol,
            stall_guard=cfg.stall_guard, newton_init=cfg.newton_init,
            warm_start=cfg.warm_start, mode=_fused_solve_mode(),
            line_search=self.solver_cfg.line_search,
            secant_refs=kernel_config().secant_refs,
            interpret=interp, reps=reps, **_ladder_args(cfg.threshold))
        B = z.shape[0]
        flat = lambda a: a.reshape(B, -1)
        unflat = lambda a: a.reshape(z.shape)

        def with_fb(xb):
            prec = _xla_solver_precision()
            with jax.default_matmul_precision(prec):
                z_embed = flat(self.nnet_z.apply(vz, z)) + flat(z)
                bg = lambda xf: z_embed - flat(self.nnet_x.apply(vx, unflat(xf)))
                fb = fixed_point_iteration(
                    bg, flat(z), threshold=cfg.banach_threshold,
                    eps=cfg.eps_sample)
            return jnp.where(res.prot_break[:, None], fb, xb)

        xf = jax.lax.cond(jnp.any(res.prot_break), with_fb, lambda xb: xb,
                          flat(res.result))
        return unflat(xf)

    # ---- log-det ----
    def _logdetgrad(self, variables, z, x, rng, train):
        """logdet|dz/dx| (reference ``_logdetgrad``, implicit_block.py:245-350).
        Returns ((B,) logdet, new block state with estimator moments)."""
        cfg = self.logdet_cfg
        vx = self._net_vars(variables, "nnet_x")
        vz = self._net_vars(variables, "nnet_z")
        apply_x, apply_z = self.nnet_x.apply, self.nnet_z.apply

        D = int(math.prod(x.shape[1:]))
        if (cfg.brute_force or not train) and (x.ndim == 2 and D <= 10):
            logdet = ld.brute_force_logdet(apply_x, vx, x) - ld.brute_force_logdet(
                apply_z, vz, z
            )
            return logdet, variables["state"]

        if rng is None:
            raise ValueError("stochastic logdet estimation requires an rng key")
        k_n, k_ex, k_ez = jax.random.split(rng, 3)
        geom_p = jax.nn.sigmoid(variables["params"]["geom_p"])
        lamb = variables["params"]["lamb"]
        coeffs, n_power, n_samples = ld.sample_n_dist(k_n, cfg, geom_p, lamb, train)
        P = max(1, cfg.n_probes)
        vareps_x = ld.sample_rademacher(k_ex, (P,) + x.shape, x.dtype)
        vareps_z = ld.sample_rademacher(k_ez, (P,) + z.shape, z.dtype)
        # Multi-chip: probes are embarrassingly parallel — pin the probe axis
        # to the mesh 'trace' axis (no-op without an active mesh) so each
        # chip runs its own estimator chains and only the final probe-mean
        # crosses ICI.
        from ..parallel.mesh import constrain_probe_axis
        vareps_x = constrain_probe_axis(vareps_x)
        vareps_z = constrain_probe_axis(vareps_z)
        neumann = train and cfg.neumann_grad

        if cfg.exact_trace:
            ld_x = ld.residual_logdet(apply_x, vx, x, vareps_x, coeffs, n_power,
                                      neumann=False, exact_trace=True)
            ld_z = ld.residual_logdet(apply_z, vz, z, vareps_z, coeffs, n_power,
                                      neumann=False, exact_trace=True)
            logdet = ld_x - ld_z
            state = dict(variables["state"])
            return logdet, state

        # NB: running the two nets' estimator chains as one vmapped
        # stacked-params computation was measured ~12% SLOWER on TPU than two
        # sequential chains (vmap over conv kernels lowers to grouped convs
        # with worse MXU layouts), so they stay sequential.
        #
        # The Neumann gradient-estimator VJP chain runs in bfloat16 by
        # default (2x MXU rate; trace dots accumulate in f32): measured bpd
        # identical to 4 decimals with a 28% step-time cut on the CIFAR
        # recipe — the estimate is Monte-Carlo noisy by construction, so the
        # rounding noise is second-order. The basic estimator (true-NLL
        # logging and eval, README.md:33) stays f32. IMNF_BF16_EST=0 restores
        # full f32 everywhere.
        bf16_est = neumann and kernel_config().bf16_est

        def _cast(tree, dtype):
            return jax.tree.map(
                lambda a: a.astype(dtype) if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                tree)

        def estimate_one(apply_fn, v, y, eps):
            if bf16_est:
                out = ld.residual_logdet(
                    apply_fn, _cast(v, jnp.bfloat16), y.astype(jnp.bfloat16),
                    eps.astype(jnp.bfloat16), coeffs, n_power,
                    neumann=neumann, exact_trace=False,
                )
                return out.astype(jnp.float32)
            return ld.residual_logdet(
                apply_fn, v, y, eps, coeffs, n_power,
                neumann=neumann, exact_trace=False,
            )

        def estimate(apply_fn, v, y, eps_probes):
            # Average over independent probes (eps_probes: (P, B, ...)); the
            # probe axis is vmapped so it vectorises — and shards over a
            # 'trace' mesh axis when the caller lays it out that way.
            ests = jax.vmap(lambda e: estimate_one(apply_fn, v, y, e))(eps_probes)
            return jnp.mean(ests, axis=0)

        if train and cfg.grad_in_forward:
            # Rematerialise the estimator in backward instead of storing the
            # VJP chain (reference mem_eff_wrapper, implicit_block.py:441-450).
            estimate = jax.checkpoint(estimate, static_argnums=(0,))

        logdet = None
        # Fused-chain fast path (ops.fused_chain): both nets' stop-gradient
        # Neumann accumulations in ONE Pallas kernel with the activation-
        # derivative tensors VMEM-resident across the whole power series.
        # Estimator semantics unchanged (same signed coefficients and trip
        # count; float reassociation only). Engaged on TPU for conv stacks
        # matching the kernel pattern at spatial dims >= 16x16 (in-model
        # sweep of IMNF_FUSED_MIN_HW on the CIFAR recipe: 1024-gate 580,
        # 256-gate 598, 64-gate 581 samples/s -> 8x8 stays on XLA);
        # IMNF_FUSED_CHAIN=0 disables, =interpret forces the interpreter
        # path for CPU tests.
        fused_mode = kernel_config().fused_chain
        if (neumann and fused_mode != "0" and cfg.n_probes <= 1
                and not (train and cfg.grad_in_forward) and x.ndim == 4):
            interp = fused_mode == "interpret"
            on_tpu = jax.devices()[0].platform == "tpu"
            reps = _pack_reps_for(x, kernel_config().chain_pack_lanes)
            big_enough = reps * x.shape[2] * x.shape[3] >= kernel_config().fused_min_hw
            get_cd_x = getattr(self.nnet_x, "conv_chain_data", None)
            get_cd_z = getattr(self.nnet_z, "conv_chain_data", None)
            if (interp or (on_tpu and big_enough)) and get_cd_x and get_cd_z:
                if bf16_est:
                    vx_c, vz_c = _cast(vx, jnp.bfloat16), _cast(vz, jnp.bfloat16)
                    x_c, z_c = x.astype(jnp.bfloat16), z.astype(jnp.bfloat16)
                    ex = vareps_x[0].astype(jnp.bfloat16)
                    ez = vareps_z[0].astype(jnp.bfloat16)
                else:
                    vx_c, vz_c, x_c, z_c = vx, vz, x, z
                    ex, ez = vareps_x[0], vareps_z[0]
                cd_x = get_cd_x(vx_c, x_c)
                cd_z = get_cd_z(vz_c, z_c)
                if cd_x is not None and cd_z is not None:
                    # Fused differentiable final term (second-order Pallas
                    # backward, ops.fused_solve.fused_final_pair);
                    # IMNF_FUSED_FINAL=0 falls back to the XLA jax.vjp final.
                    ff = kernel_config().fused_final
                    fd_x = fd_z = None
                    if ff != "0":
                        gfx = getattr(self.nnet_x, "conv_forward_data", None)
                        gfz = getattr(self.nnet_z, "conv_forward_data", None)
                        if gfx and gfz:
                            fd_x, fd_z = gfx(vx), gfz(vz)
                    if fd_x is not None and fd_z is not None:
                        from ..ops.fused_solve import fused_final_pair
                        acc_x, acc_z = ld.neumann_pair_accs(
                            x_c, ex, z_c, ez, cd_x, cd_z, coeffs, n_power,
                            interpret=interp, reps=reps)
                        T_x, T_z = fused_final_pair(
                            fd_x, fd_z, x, z, vareps_x[0], vareps_z[0],
                            acc_x, acc_z,
                            mode="bf16" if bf16_est else "f32",
                            interpret=interp or ff == "interpret",
                            reps=reps)
                        logdet = (T_x - T_z).astype(jnp.float32)
                    else:
                        ld_x, ld_z = ld.neumann_logdet_pair_fused(
                            apply_x, vx_c, x_c, ex, apply_z, vz_c, z_c, ez,
                            cd_x, cd_z, coeffs, n_power, interpret=interp,
                            reps=reps)
                        logdet = (ld_x - ld_z).astype(jnp.float32)

        if logdet is None:
            logdet = estimate(apply_x, vx, x, vareps_x) - estimate(apply_z, vz, z, vareps_z)

        state = dict(variables["state"])
        if train and cfg.n_power_series is None:
            est = jax.lax.stop_gradient(logdet)
            state["last_n_samples"] = n_samples.astype(jnp.float32)
            state["last_firmom"] = jnp.mean(est)[None]
            state["last_secmom"] = jnp.mean(est ** 2)[None]
        return logdet, state

    # ---- maintenance ----
    def update_lipschitz(self, variables, n_iterations=None):
        vx = self.nnet_x.update_lipschitz(self._net_vars(variables, "nnet_x"), n_iterations)
        vz = self.nnet_z.update_lipschitz(self._net_vars(variables, "nnet_z"), n_iterations)
        params = dict(variables["params"], nnet_x=vx["params"], nnet_z=vz["params"])
        state = dict(variables["state"], nnet_x=vx["state"], nnet_z=vz["state"])
        return make_vars(params, state)

    def lipschitz_sigmas(self, variables):
        return self.nnet_x.lipschitz_sigmas(self._net_vars(variables, "nnet_x")) + \
            self.nnet_z.lipschitz_sigmas(self._net_vars(variables, "nnet_z"))

    def lipschitz_one_iter(self, variables):
        tx, cx = self.nnet_x.lipschitz_one_iter(self._net_vars(variables, "nnet_x"))
        tz, cz = self.nnet_z.lipschitz_one_iter(self._net_vars(variables, "nnet_z"))
        return tx + tz, cx + cz

    def ords(self, variables):
        return self.nnet_x.ords(self._net_vars(variables, "nnet_x")) + \
            self.nnet_z.ords(self._net_vars(variables, "nnet_z"))
