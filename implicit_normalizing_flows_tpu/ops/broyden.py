"""Batched Broyden fixed-point solver as a single on-device XLA loop.

TPU-native counterpart of the reference solver
(``/root/reference/lib/layers/broyden.py:123-193``): a limited-memory "bad
Broyden" quasi-Newton root finder with the inverse-Jacobian approximated as
``J^-1 ~= -I + U V^T`` and one rank-1 (u, v) pair appended per iteration.

Design differences from the reference (deliberate, TPU-first — SURVEY.md §7):

* **No host syncs.** The reference reads ``torch.norm(gx).item()`` every
  iteration (``broyden.py:145,157``), a device->host round-trip per solver
  step. Here the whole solve is one ``lax.while_loop`` with on-device
  convergence state.
* **Per-example convergence masks.** The reference's stopping criterion is a
  batch-global Frobenius norm (``broyden.py:153``): one slow example keeps the
  whole batch iterating, and — worse — keeps *updating* already-converged
  examples. Here each example has its own active flag; converged or diverged
  examples freeze while the rest continue, and the loop exits when all are
  done. The per-example tolerance ``eps * sqrt(D)`` matches the reference's
  aggregate ``eps * sqrt(B * D)`` (``broyden.py:131``) in expectation.
* **Static shapes.** The reference slices ``Us[:, :, :nstep]``
  (``broyden.py:174,181``); here U/V always use the full ``K = threshold``
  columns, zero-initialised — unused (zero) columns are exact no-ops in the
  low-rank contractions, so the math is identical while shapes stay static
  under ``jit``.
* **Best-iterate tracking per example** (reference tracks a single global best,
  ``broyden.py:151-161``): the returned root is each example's
  lowest-objective iterate, not the last.
* **Protective break per example** at ``obj > 1e6 * init_obj``
  (``broyden.py:150,169-172``); flagged examples are reported in
  ``prot_break`` so the caller can run the Banach fallback for just those rows
  (reference reruns the whole batch: ``implicit_block.py:74-75``).
"""
from __future__ import annotations
from ..config import kernel_config

import os
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_PROTECT_THRES = 1e6  # reference: broyden.py:150


class BroydenResult(NamedTuple):
    """On-device solver diagnostics (reference: result dict broyden.py:184-193)."""

    result: jax.Array      # (B, D) best iterate per example
    gx: jax.Array          # (B, D) residual g(result) at the returned iterate
    nstep: jax.Array       # () int32, iterations actually run
    diff: jax.Array        # (B,) final best objective per example
    best_step: jax.Array   # (B,) iteration index of each example's best iterate
    prot_break: jax.Array  # (B,) bool, example hit the protective divergence break
    converged: jax.Array   # (B,) bool, example met its tolerance
    eps: jax.Array         # (B,) per-example tolerance actually used
    trace: jax.Array | None  # optional (threshold+1, B) objective trace


# Low-rank contractions run in full f32 on the MXU: they are tiny (K=30)
# compared to the net evals, and solver tolerances go down to 1e-10*sqrt(D)
# (implicit_block.py:121) — bf16 accumulation would stall convergence.
_PREC = jax.lax.Precision.HIGHEST


def _matvec(Us, VTs, x):
    """(-I + U V^T) x for batched low-rank factors.

    Us: (B, D, K), VTs: (B, K, D), x: (B, D). Zero columns are no-ops.
    Reference: broyden.py:112-120.
    """
    VTx = jnp.einsum("bkd,bd->bk", VTs, x, precision=_PREC)
    return -x + jnp.einsum("bdk,bk->bd", Us, VTx, precision=_PREC)


def _rmatvec(Us, VTs, x):
    """x^T (-I + U V^T). Reference: broyden.py:101-109."""
    xTU = jnp.einsum("bd,bdk->bk", x, Us, precision=_PREC)
    return -x + jnp.einsum("bk,bkd->bd", xTU, VTs, precision=_PREC)


class _State(NamedTuple):
    x_est: jax.Array
    gx: jax.Array
    update: jax.Array
    Us: jax.Array
    VTs: jax.Array
    nstep: jax.Array
    active: jax.Array
    best_x: jax.Array
    best_gx: jax.Array
    best_obj: jax.Array
    best_step: jax.Array
    prot_break: jax.Array
    best_snapshot: jax.Array
    trace: jax.Array


def broyden(
    g: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    threshold: int,
    eps: float,
    *,
    keep_trace: bool = False,
    stall_patience: int | None = None,
    stall_rtol: float = 1e-3,
    stall_guard: float | None = None,
    newton_init: bool = False,
    line_search: bool = False,
) -> BroydenResult:
    """Solve ``g(x) = 0`` for a batch of independent problems.

    Args:
      g: batched residual function ``(B, D) -> (B, D)``; must be pure.
      x0: (B, D) initial iterate (the reference always starts from zeros for
          the forward solve, ``implicit_block.py:73``; the caller decides).
      threshold: max Broyden iterations == number of low-rank columns K
          (reference ``LBFGS_thres = threshold``, broyden.py:125).
      eps: base tolerance; per-example tolerance is ``eps * sqrt(D)``.
      stall_patience: if set, every ``stall_patience`` iterations compare each
          example's (monotone) best objective against its value one window
          ago; freeze the example when the window improved by less than
          ``stall_rtol`` relative — the per-example analog of the reference's
          "hardly been any progress" break (broyden.py:165-168). The monotone
          window test is immune both to oscillating iterates (which a
          consecutive-failure counter mistakes for stalls) and to arithmetic
          noise dips (which keep resetting such a counter). The solver
          returns each example's best iterate, so stalling out early trades
          only the tail of convergence, never the achieved quality.
      stall_guard: only allow the stall exit for examples already within
          ``stall_guard * eps_i`` of tolerance (the reference's break fires
          only below ``3 * eps``, broyden.py:165-168). None stalls at any
          objective — which mid-training can freeze examples far from their
          root; callers should pass ~3.0 unless they specifically want the
          unguarded wall-clock bound.
      newton_init: take ``+g`` as the first direction instead of the
          reference's ``-g`` (broyden.py:146). For these residuals the
          Jacobian is ``-(I + J_net)`` with ``|J_net| < 1``, so the Newton
          direction under the solver's own ``J^-1 ~= -I`` initialisation is
          ``+g``; the reference's first step moves away from the root and is
          repaired by the secant updates. Same root either way (the stopping
          criterion pins it); iterate paths differ.
      line_search: per-example Armijo backtracking on each Broyden step (the
          reference's ``ls`` option, broyden.py:24-99, off by default
          there too). Static two-trial structure for jit: trial s=1 (the
          normal step, no extra cost), then — only when some row fails the
          Armijo test ``phi(s) <= phi0*(1 - c1*s)`` with ``phi = |g|^2``,
          ``c1 = 1e-4`` — one quadratic-interpolant backtrack
          ``s_q = phi0 / (2 phi_1)`` and one halving, each one extra batched
          residual eval under ``lax.cond``; every row then takes its best
          trial. The reference's unbounded cubic loop is replaced by this
          bounded schedule (same first two trial points; the cubic tail is
          host-side control flow a TPU program can't express usefully).

    The solve carries no gradient; wrap in ``stop_gradient``/``custom_vjp`` at
    the call site (the reference's RootFind.backward asserts, broyden callers
    run under ``torch.no_grad()``: ``implicit_block.py:89``).
    """
    if x0.ndim != 2:
        raise ValueError(f"broyden expects (B, D) input, got {x0.shape}")
    bsz, total = x0.shape
    dtype = x0.dtype
    eps_i = jnp.full((bsz,), eps * (total ** 0.5), dtype=dtype)

    x_est = x0
    gx = g(x_est)
    init_obj = jnp.linalg.norm(gx, axis=1)

    trace_buf = jnp.zeros((threshold + 1, bsz), dtype=dtype)
    trace_buf = trace_buf.at[0].set(init_obj) if keep_trace else trace_buf

    # Optional Pallas fused rank-1 update (ops/pallas_kernels.py): one VMEM
    # pass over the U/V panels per iteration. Opt-in (IMNF_PALLAS=1) while the
    # XLA path remains the portable default.
    use_fused = False
    fused_interpret = False
    if kernel_config().pallas_broyden:
        from .pallas_kernels import fused_update_supported

        use_fused = fused_update_supported(bsz, total, threshold)
        fused_interpret = jax.default_backend() == "cpu"  # Mosaic is TPU-only

    state = _State(
        x_est=x_est,
        gx=gx,
        update=gx if newton_init else -gx,
        Us=jnp.zeros((bsz, total, threshold), dtype=dtype),
        VTs=jnp.zeros((bsz, threshold, total), dtype=dtype),
        nstep=jnp.zeros((), jnp.int32),
        active=init_obj >= eps_i,
        best_x=x_est,
        best_gx=gx,
        best_obj=init_obj,
        best_step=jnp.zeros((bsz,), jnp.int32),
        prot_break=jnp.zeros((bsz,), bool),
        best_snapshot=init_obj,
        trace=trace_buf,
    )

    def cond(s: _State):
        return jnp.any(s.active) & (s.nstep < threshold)

    def body(s: _State) -> _State:
        act = s.active[:, None]
        delta_x = jnp.where(act, s.update, 0.0)
        x_new = s.x_est + delta_x
        gx_new = g(x_new)
        # Frozen rows keep their residual bit-exactly (g is pure but this
        # also guards against non-finite garbage rows propagating).
        gx_new = jnp.where(act, gx_new, s.gx)
        if line_search:
            c1 = 1e-4
            phi0 = jnp.sum(s.gx * s.gx, axis=1)
            phi1 = jnp.sum(gx_new * gx_new, axis=1)
            fail = s.active & (phi1 > phi0 * (1.0 - c1))

            def backtrack(args):
                x1, g1 = args
                # quadratic-interpolant minimizer with derphi0 = -phi0
                # (reference scalar_search_armijo, broyden.py:31), clamped
                # to the reference's amin=1e-2
                sq = jnp.clip(phi0 / (2.0 * phi1 + 1e-30), 1e-2, 1.0)
                x_q = s.x_est + sq[:, None] * delta_x
                g_q = jnp.where(act, g(x_q), s.gx)
                phi_q = jnp.sum(g_q * g_q, axis=1)
                ok_q = phi_q <= phi0 * (1.0 - c1 * sq)
                sh = sq * 0.5
                x_h = s.x_est + sh[:, None] * delta_x
                g_h = jnp.where(act, g(x_h), s.gx)
                phi_h = jnp.sum(g_h * g_h, axis=1)
                ok_h = phi_h <= phi0 * (1.0 - c1 * sh)
                # acceptance order: quadratic, then halved; rows where both
                # fail take the full step (the reference uses s=1.0 when the
                # search returns None)
                take_q = fail & ok_q
                take_h = fail & ~ok_q & ok_h
                x_sel = jnp.where(take_q[:, None], x_q,
                                  jnp.where(take_h[:, None], x_h, x1))
                g_sel = jnp.where(take_q[:, None], g_q,
                                  jnp.where(take_h[:, None], g_h, g1))
                return x_sel, g_sel

            x_new, gx_new = jax.lax.cond(
                jnp.any(fail), backtrack, lambda a: a, (x_new, gx_new))
            delta_x = jnp.where(act, x_new - s.x_est, 0.0)
        delta_gx = gx_new - s.gx
        nstep = s.nstep + 1

        obj = jnp.linalg.norm(gx_new, axis=1)
        improved = s.active & (obj < s.best_obj)
        best_x = jnp.where(improved[:, None], x_new, s.best_x)
        best_gx = jnp.where(improved[:, None], gx_new, s.best_gx)
        best_obj = jnp.where(improved, obj, s.best_obj)
        best_step = jnp.where(improved, nstep, s.best_step)

        bad = ~jnp.isfinite(obj) | (obj > init_obj * _PROTECT_THRES)
        newly_prot = s.active & bad
        prot_break = s.prot_break | newly_prot
        active = s.active & (obj >= eps_i) & ~bad
        if stall_patience is not None:
            at_check = (nstep % stall_patience) == 0
            stalled = at_check & (best_obj > s.best_snapshot * (1.0 - stall_rtol))
            if stall_guard is not None:
                stalled = stalled & (best_obj < stall_guard * eps_i)
            active = active & ~stalled
            best_snapshot = jnp.where(at_check, best_obj, s.best_snapshot)
        else:
            best_snapshot = s.best_snapshot

        # Rank-1 secant update appended at column nstep-1 (broyden.py:174-181).
        col = (nstep - 1) % threshold
        if use_fused:
            from .pallas_kernels import fused_broyden_update

            Us, VTs, update = fused_broyden_update(
                s.Us, s.VTs, delta_x, delta_gx, gx_new, s.active, col,
                interpret=fused_interpret)
            trace = (
                jax.lax.dynamic_update_index_in_dim(s.trace, obj, nstep, axis=0)
                if keep_trace else s.trace
            )
            return _State(
                x_est=x_new, gx=gx_new, update=update, Us=Us, VTs=VTs,
                nstep=nstep, active=active, best_x=best_x, best_gx=best_gx,
                best_obj=best_obj, best_step=best_step, prot_break=prot_break,
                best_snapshot=best_snapshot, trace=trace,
            )
        # The three low-rank contractions are batched so U and V stream from
        # HBM only twice per iteration: VT@[delta_gx, gx] in one pass, then
        # U@(that) in one pass; the post-update direction uses the rank-1
        # identity  matvec(U', V', g) = matvec(U, V, g) + u (vT . g)  instead
        # of re-reading the updated factors (broyden.py:181 re-contracts).
        rhs = jnp.stack([delta_gx, gx_new], axis=-1)          # (B, D, 2)
        VTX = jnp.einsum("bkd,bdr->bkr", s.VTs, rhs, precision=_PREC)
        UVX = jnp.einsum("bdk,bkr->bdr", s.Us, VTX, precision=_PREC)
        matvec_dgx = -delta_gx + UVX[..., 0]
        matvec_gx = -gx_new + UVX[..., 1]

        xTU = jnp.einsum("bd,bdk->bk", delta_x, s.Us, precision=_PREC)
        vT = -delta_x + jnp.einsum("bk,bkd->bd", xTU, s.VTs, precision=_PREC)
        denom = jnp.einsum("bd,bd->b", vT, delta_gx)[:, None]
        u = (delta_x - matvec_dgx) / denom
        # NaN scrub (reference broyden.py:177-178); also scrub inf from a
        # zero denominator so frozen rows can never poison the factors.
        vT = jnp.where(jnp.isfinite(vT), vT, 0.0)
        u = jnp.where(jnp.isfinite(u), u, 0.0)
        u = jnp.where(act, u, 0.0)
        vT = jnp.where(act, vT, 0.0)
        Us = jax.lax.dynamic_update_index_in_dim(s.Us, u, col, axis=2)
        VTs = jax.lax.dynamic_update_index_in_dim(s.VTs, vT, col, axis=1)
        update = -matvec_gx - u * jnp.einsum("bd,bd->b", vT, gx_new)[:, None]

        trace = (
            jax.lax.dynamic_update_index_in_dim(s.trace, obj, nstep, axis=0)
            if keep_trace
            else s.trace
        )
        return _State(
            x_est=x_new, gx=gx_new, update=update, Us=Us, VTs=VTs, nstep=nstep,
            active=active, best_x=best_x, best_gx=best_gx, best_obj=best_obj,
            best_step=best_step, prot_break=prot_break,
            best_snapshot=best_snapshot, trace=trace,
        )

    final = jax.lax.while_loop(cond, body, state)
    return BroydenResult(
        result=final.best_x,
        gx=final.best_gx,
        nstep=final.nstep,
        diff=final.best_obj,
        best_step=final.best_step,
        prot_break=final.prot_break,
        converged=final.best_obj < eps_i,
        eps=eps_i,
        trace=final.trace if keep_trace else None,
    )


def fixed_point_iteration(
    g: Callable[[jax.Array], jax.Array],
    y: jax.Array,
    threshold: int = 1000,
    eps: float = 1e-5,
) -> jax.Array:
    """Banach/Picard iteration ``x <- g(x)`` with the reference's elementwise
    relative-tolerance stop (``implicit_block.py:17-28``):
    iterate until ``(x - x_prev)^2 / (eps + eps*|y|) < 1`` everywhere.

    Per-example masking: converged rows freeze while others continue.
    """
    orig_shape = y.shape
    y2 = y.reshape(y.shape[0], -1)
    g2 = lambda x: g(x.reshape(orig_shape)).reshape(y2.shape)
    tol = eps + eps * jnp.abs(y2)

    def row_done(x, x_prev):
        return jnp.all((x - x_prev) ** 2 / tol < 1.0, axis=1)

    x0 = g2(y2)

    def cond(carry):
        x, x_prev, i, active = carry
        return jnp.any(active) & (i <= threshold)

    def body(carry):
        x, x_prev, i, active = carry
        x_new = jnp.where(active[:, None], g2(x), x)
        x_prev_new = jnp.where(active[:, None], x, x_prev)
        active_new = active & ~row_done(x_new, x_prev_new)
        return x_new, x_prev_new, i + 1, active_new

    x, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, y2, jnp.zeros((), jnp.int32), ~row_done(x0, y2))
    )
    return x.reshape(orig_shape)


def root_solve(
    g: Callable[[jax.Array], jax.Array],
    banach_g: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    threshold: int,
    eps: float,
    banach_x0: jax.Array | None = None,
    banach_threshold: int = 1000,
    stall_patience: int | None = None,
    stall_rtol: float = 1e-3,
    stall_guard: float | None = None,
    newton_init: bool = False,
    line_search: bool = False,
) -> tuple[jax.Array, BroydenResult]:
    """Broyden solve with per-example Banach fallback.

    Mirrors ``RootFind.broyden_find_root`` (``implicit_block.py:68-80``): if
    the protective break fired, fall back to Picard fixed-point iteration
    ``z <- banach_g(z)`` from ``banach_x0`` (the reference starts the Broyden
    solve from zeros but the Banach fallback from the caller's ``z0``,
    ``implicit_block.py:57-75``) — but only the flagged rows take the fallback
    result (the reference redoes the whole batch). The fallback branch is
    skipped entirely (lax.cond) when no row diverged, so the common case pays
    nothing.
    """
    res = broyden(g, x0, threshold, eps, stall_patience=stall_patience,
                  stall_rtol=stall_rtol, stall_guard=stall_guard,
                  newton_init=newton_init, line_search=line_search)
    if banach_x0 is None:
        banach_x0 = x0

    def with_fallback(args):
        best, best_gx, x_init = args
        fb = fixed_point_iteration(banach_g, x_init, threshold=banach_threshold, eps=eps)
        take = res.prot_break[:, None]
        # Keep res.gx == g(returned root) for the patched rows too (one extra
        # residual eval, only inside this rare branch) so callers can reuse
        # the residual (e.g. the re-attachment value z + g(z)).
        return jnp.where(take, fb, best), jnp.where(take, g(fb), best_gx)

    z, gz = jax.lax.cond(
        jnp.any(res.prot_break),
        with_fallback,
        lambda args: (args[0], args[1]),
        (res.result, res.gx, banach_x0),
    )
    return z, res._replace(result=z, gx=gz)


def triage_metrics(m, name: str = "forward") -> str | None:
    """Host-side triage of a step's aggregated solver metrics (the in-jit
    twin of :func:`analyze_broyden` for drivers, which only see the pooled
    ``solver_stats`` diag, not full BroydenResults). Returns a warning line
    when the protective break fired this step — the per-row Banach fallback
    has already patched the affected rows in-step (root_solve), so this is
    observability, not recovery (reference logs 'Broyden failed' and reruns
    the whole batch, broyden.py:169-172 + implicit_block.py:74-75)."""
    prot = float(m.get("broyden_prot_break", 0.0))
    if prot <= 0:
        return None
    return (f"WARNING: Hit Protective Break in {name} solve "
            f"(per-row Banach fallback applied; "
            f"BroydenIters {float(m.get('broyden_nstep', 0.0)):.1f}, "
            f"Converged {float(m.get('broyden_converged', 0.0)):.2f})")


def analyze_broyden(res: BroydenResult, judge: bool = True, name: str = "forward"):
    """Host-side solve triage (reference ``analyze_broyden``,
    ``broyden.py:196-236``): classify nan / bad / protective-break outcomes.

    With ``judge=True`` returns a bool ("did anything go wrong"); otherwise a
    (code, message) pair: 1=NaN result, 2=bad solve, 3=protective break,
    -1=healthy. Operates on fetched values — call outside jit.
    """
    import numpy as np

    result = np.asarray(res.result)
    diff = np.asarray(res.diff)
    eps = np.asarray(res.eps)
    prot = bool(np.any(np.asarray(res.prot_break)))
    nan_result = bool(np.any(~np.isfinite(result)))
    bad = bool(np.any(~np.isfinite(diff))) or (int(res.nstep) == 0 and bool(np.any(diff > eps)))
    if judge:
        return nan_result or bad or prot
    if nan_result:
        return 1, f"WARNING: nan found in Broyden's {name} result. Diff: {diff.max()}"
    if bad:
        return 2, f"WARNING: Bad Broyden's method {name}. Diff: {diff.max()}. STOP."
    if prot:
        return 3, f"WARNING: Hit Protective Break in {name}. Diff: {diff.max()}."
    return -1, ""
