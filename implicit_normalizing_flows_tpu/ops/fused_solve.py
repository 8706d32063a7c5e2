"""Fused Pallas kernel for the forward/inverse Broyden fixed-point solve.

The implicit block's forward solve costs ~5 sequential evaluations of the
residual conv net per block (``x_embed - g_z(z) - z``; reference semantics
``implicit_block.py:68-80`` + ``broyden.py:123-193``). Under XLA each eval
streams the (B, 512, H, W) intermediates to/from HBM and each solver
iteration is a separately scheduled while_loop step — measured well off the
tf32 compute roofline on v5e.

This kernel runs the ENTIRE solve for one example per grid step:

* both nets' conv evals in-kernel (same im2col machinery as
  ``ops.fused_chain`` but in the forward direction, with the swish
  nonlinearity and conv biases applied in-kernel);
* the embedding pass ``x_embed = x + g_x(x)`` fused in (one extra eval);
* Broyden state (z, g, U, V, best iterate) lives in VMEM for the whole
  solve; the rank-1 update algebra is elementwise VPU work
  (O(K * c8 * HW) per iteration, negligible next to the conv matmuls);
* true per-example early exit: the while_loop stops at THAT example's
  convergence/stall/protective-break, not the batch max.

Solver semantics mirror ``ops.broyden.broyden`` exactly (best-iterate
return, protective break at 1e6x the initial objective, monotone-window
stall exit, NaN scrubbing of the rank-1 factors); only float reassociation
differs. Anything not matching the conv-stack pattern falls back to the XLA
path (``layers.nets.LipschitzNet.conv_forward_data`` is the gate).

Matmul precision: ``mode='tf32'`` (default, matching IMNF_SOLVER_PRECISION)
splits f32 operands into bf16 hi/lo parts and takes the 3-pass product
(hi@hi + hi@lo + lo@hi, f32 accumulation) — the same error model as XLA's
``tensorfloat32``; ``mode='f32'`` uses full-precision dots.

Precision ladder (``tail_mode``/``tail_start``, round 4): tf32 arithmetic
noise-floors ~17% of mid-training examples between eps and 3x eps
(experiments/hard_regime_r3_final.json). The two-phase solver runs tf32
until each example converges, stalls, or hits ``tail_start`` iterations,
then re-arms still-unconverged examples at f32 — continue from the best
iterate with the residual (and the x-embedding) re-evaluated at f32 and
the secant factors carried over — under the same shared budget. The whole
tail sits under a ``lax.cond`` so fully-converged programs never pay it:
strict per-example converged 1.0 at tf32-class wall-clock (sustained 569
vs tf32's strict 0.797, BENCH r4).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .fused_chain import _OFFSETS, _make_shifted, _pad_rows

__all__ = ["fused_broyden_solve", "fused_backward_solve", "fused_block_forward",
           "conv3_forward_mat", "conv3_forward_mats_cout", "conv1x1_forward_mat",
           "FusedSolveResult"]

_PROTECT_THRES = 1e6  # reference: broyden.py:150


class FusedSolveResult(NamedTuple):
    result: jax.Array      # (B, c, H, W) best iterate
    gx: jax.Array          # (B, c, H, W) residual at the best iterate
    nstep: jax.Array       # (B,) int32 per-example iterations
    diff: jax.Array        # (B,) best objective
    prot_break: jax.Array  # (B,) bool
    converged: jax.Array   # (B,) bool


def conv3_forward_mat(w, c8):
    """(O=mid, I=c, 3, 3) conv kernel -> (mid, 9*c8) forward im2col matrix.

    y[m, p] = sum_{d=(ky,kx), i} w[m, i, ky, kx] * x[i, p + delta_d], columns
    offset-major, channel-minor, input channels padded to ``c8`` per group.
    """
    m = jnp.transpose(w, (2, 3, 0, 1)).reshape(9, w.shape[0], w.shape[1])
    m = _pad_rows(m, c8, axis=2)                    # (9, mid, c8)
    return jnp.transpose(m, (1, 0, 2)).reshape(w.shape[0], 9 * c8)


def conv3_forward_mats_cout(w, c8):
    """(O=c, I=mid, 3, 3) -> (9*c8, mid) stacked per-offset forward mats for
    the conv whose OUTPUT carries the small image-channel count:
    y = sum_d shift_{-d}(W_d @ h)."""
    m = jnp.transpose(w, (2, 3, 0, 1)).reshape(9, w.shape[0], w.shape[1])
    m = _pad_rows(m, c8, axis=1)                    # (9, c8, mid)
    return m.reshape(9 * c8, w.shape[1])


def conv1x1_forward_mat(w):
    """(O, I, 1, 1) -> (O, I) forward matmul matrix."""
    return w[:, :, 0, 0]


def _split_hi_lo(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_dot(mode):
    """(M, K) @ (K, N) -> f32 at the requested precision model:
    'f32' exact, 'tf32' 3-pass bf16 split, 'tf32x' 4-pass (3-pass + lo*lo),
    'bf16' single-pass bf16."""
    f32 = jnp.float32
    dn = (((1,), (0,)), ((), ()))

    if mode == "f32":
        # precision=HIGHEST is load-bearing: without it Mosaic demotes f32
        # dot operands to single-pass bf16 — LOWER precision than the 'tf32'
        # hi/lo 3-pass path (measured: mid-training solves at the
        # unqualified dot ran the whole budget with converged 0.01, while
        # tf32 reached 0.83 — experiments/hard_regime_r3.json).
        def dot(w, t):
            return jax.lax.dot_general(w, t, dn, preferred_element_type=f32,
                                       precision=jax.lax.Precision.HIGHEST)
        return dot

    if mode == "bf16":
        def dot(w, t):
            return jax.lax.dot_general(
                w.astype(jnp.bfloat16), t.astype(jnp.bfloat16), dn,
                preferred_element_type=f32)
        return dot

    extra = mode == "tf32x"

    def dot(w, t):
        w_hi, w_lo = _split_hi_lo(w)
        t_hi, t_lo = _split_hi_lo(t)
        out = jax.lax.dot_general(w_hi, t_hi, dn, preferred_element_type=f32)
        out += jax.lax.dot_general(w_hi, t_lo, dn, preferred_element_type=f32)
        out += jax.lax.dot_general(w_lo, t_hi, dn, preferred_element_type=f32)
        if extra:
            out += jax.lax.dot_general(w_lo, t_lo, dn,
                                       preferred_element_type=f32)
        return out

    return dot


def _make_wdot(mode, w, kpack=False):
    """Per-weight dot closure ``t (K, N) -> w @ t (M, N) f32`` with the
    WEIGHT-side precision prep (hi/lo split or bf16 cast) hoisted to closure
    creation. Inside a solver/chain loop the weights are loop-invariant but
    Mosaic does not reliably hoist the split itself (microbench r5:
    ~4% per-eval win at the CIFAR shapes, experiments/fused_solve_microbench
    _r5.json); building the closure once outside the loop guarantees it.
    Same arithmetic and accumulation order as ``_make_dot(mode)``.

    ``kpack`` (tf32/tf32x only): fuse the 3 (4) emulation passes into ONE
    dot with the hi/lo parts concatenated along the contraction axis:
    ``[W_hi W_hi W_lo] @ [T_hi; T_lo; T_hi]``. For small contractions
    (conv1's im2col K = 9*c8 = 72 at 3 channels) the separate passes each
    under-fill the 128-lane MXU contraction; packing K-major cuts the
    K-tile pass count (72: 3x1 tile -> 2 tiles; device-measured -9.6%
    per solver iteration at the CIFAR shapes, r5). All partial products
    accumulate in ONE dot accumulator instead of three summed outputs —
    error strictly no larger than the 3-pass form (~5e-8 rel measured)."""
    f32 = jnp.float32
    dn = (((1,), (0,)), ((), ()))

    if mode == "f32":
        def dot(t):
            return jax.lax.dot_general(w, t, dn, preferred_element_type=f32,
                                       precision=jax.lax.Precision.HIGHEST)
        return dot

    if mode == "bf16":
        wb = w.astype(jnp.bfloat16)

        def dot(t):
            return jax.lax.dot_general(wb, t.astype(jnp.bfloat16), dn,
                                       preferred_element_type=f32)
        return dot

    extra = mode == "tf32x"
    w_hi, w_lo = _split_hi_lo(w)

    if kpack:
        parts = [w_hi, w_hi, w_lo] + ([w_lo] if extra else [])
        w_pack = jnp.concatenate(parts, axis=1)         # (M, 3K or 4K)

        def dot(t):
            t_hi, t_lo = _split_hi_lo(t)
            tp = [t_hi, t_lo, t_hi] + ([t_lo] if extra else [])
            return jax.lax.dot_general(
                w_pack, jnp.concatenate(tp, axis=0), dn,
                preferred_element_type=f32)
        return dot

    def dot(t):
        t_hi, t_lo = _split_hi_lo(t)
        out = jax.lax.dot_general(w_hi, t_hi, dn, preferred_element_type=f32)
        out += jax.lax.dot_general(w_hi, t_lo, dn, preferred_element_type=f32)
        out += jax.lax.dot_general(w_lo, t_hi, dn, preferred_element_type=f32)
        if extra:
            out += jax.lax.dot_general(w_lo, t_lo, dn,
                                       preferred_element_type=f32)
        return out

    return dot


def _norm_ladder(threshold, tail_mode, tail_start):
    """Normalise the precision-ladder spec to (modes, starts) tuples.

    ``tail_mode``: None | mode str | comma-joined / iterable of mode strs
    (multi-stage, r5: e.g. "tf32x,f32" — re-arm still-unconverged examples
    at tf32x first, the cheaper 4-pass emulation, and keep f32 as the
    backstop for what tf32x's floor can't reach). ``starts[i]`` is the
    iteration cap at which stage i may begin; stage i runs until
    ``starts[i+1]`` (the last until ``threshold``). Auto spacing halves the
    remaining budget per stage: threshold 30 -> (15, 22) for two stages
    (phase-1 auto matches the single-stage threshold//2 rule)."""
    if tail_mode is None:
        return (), ()
    modes = tuple(m for m in (tail_mode.split(",")
                              if isinstance(tail_mode, str) else tail_mode)
                  if m)
    if not modes:
        return (), ()
    if isinstance(tail_start, (tuple, list)):
        starts = tuple(min(int(v), threshold) for v in tail_start)
        if len(starts) != len(modes):
            raise ValueError("tail_start tuple must match tail_mode stages")
        return modes, starts
    s = threshold // 2 if tail_start is None else int(tail_start)
    starts = []
    for _ in modes:
        starts.append(min(int(s), threshold))
        s = s + max(1, (threshold - s) // 2)
    return modes, tuple(starts)


def _swish(t, b):
    return t * jax.nn.sigmoid(t * b) * jnp.float32(1.0 / 1.1)


def _dswish(t, b):
    s = jax.nn.sigmoid(t * b)
    return (s + t * b * s * (1.0 - s)) * jnp.float32(1.0 / 1.1)


def _make_eval(shifted, mode, m1, m2, m3, b1, b2, b3, beta0, beta1, beta2,
               preact, c8, HW, want_aux=False):
    """h (c8, HW) f32 -> net(h) (c8, HW) f32 with swish + biases in-kernel.

    ``mode`` is a precision-mode string; the per-weight dot closures are
    built once here so the weight-side precision prep sits OUTSIDE the
    solver loop (see ``_make_wdot``).

    With ``want_aux`` the eval also returns the pre-activation tensors
    ``(h1, h2)`` — enough (with the input) to reconstruct the activation
    derivatives s0/s1/s2 for the Neumann chain's J^T applications.
    """
    # conv1's im2col contraction (9*c8) under-fills the MXU K dimension at
    # image channel counts; K-pack its emulation passes (see _make_wdot).
    d1 = _make_wdot(mode, m1, kpack=True)
    d2, d3 = (_make_wdot(mode, m) for m in (m2, m3))

    def eval_net(h):
        if preact:
            h = _swish(h, beta0)
        xsh = jnp.concatenate(
            [shifted(h, -dy, -dx) for (dy, dx) in _OFFSETS], axis=0)
        h1 = d1(xsh) + b1                           # (mid, HW)
        t = _swish(h1, beta1)
        h2 = d2(t) + b2
        t = _swish(h2, beta2)
        R = d3(t)                                   # (9*c8, HW)
        y = jnp.zeros((c8, HW), jnp.float32)
        for d, (dy, dx) in enumerate(_OFFSETS):
            y += shifted(R[d * c8:(d + 1) * c8], -dy, -dx)
        y = y + b3
        if want_aux:
            return y, (h1, h2)
        return y

    return eval_net


def _make_seg(reps, HW):
    """Per-example reduction helpers for lane-packed kernels (``reps``
    examples concatenated along the lane axis with period ``HW``):
    ``seg_sum`` maps an (rows, reps*HW) plane to (1, reps) per-example sums
    (one small matmul against a segment-indicator matrix + a sublane
    reduce); ``to_lanes`` broadcasts a (1, reps) per-example vector back to
    (1, reps*HW) lanes."""
    f32 = jnp.float32
    RHW = reps * HW
    seg = (jax.lax.broadcasted_iota(jnp.int32, (RHW, reps), 0) // HW
           == jax.lax.broadcasted_iota(jnp.int32, (RHW, reps), 1)).astype(f32)
    segT = (jax.lax.broadcasted_iota(jnp.int32, (reps, RHW), 1) // HW
            == jax.lax.broadcasted_iota(jnp.int32, (reps, RHW), 0)).astype(f32)
    dn = (((1,), (0,)), ((), ()))

    def seg_sum(plane):
        t = jax.lax.dot_general(plane.astype(f32), seg, dn,
                                preferred_element_type=f32)  # (rows, reps)
        return jnp.sum(t, axis=0, keepdims=True)             # (1, reps)

    def to_lanes(v):
        return jax.lax.dot_general(v.astype(f32), segT, dn,
                                   preferred_element_type=f32)  # (1, RHW)

    return seg_sum, to_lanes


class _PackedLoopState(NamedTuple):
    z: jax.Array
    gx: jax.Array
    update: jax.Array
    U: tuple
    V: tuple
    best_z: jax.Array
    best_gx: jax.Array
    best_obj: jax.Array   # (1, reps) f32
    best_snap: jax.Array  # (1, reps) f32
    best_step: jax.Array  # (1, reps) f32 (counts)
    nstep: jax.Array      # (1, reps) f32 (counts)
    prot: jax.Array       # (1, reps) f32 0/1
    done: jax.Array       # (1, reps) f32 0/1


def _broyden_in_kernel_packed(resid, z0, *, c8, HW, reps, threshold, eps_i,
                              stall_patience, stall_rtol, stall_guard=None,
                              newton_init=False, tails=(), stage_caps=(),
                              line_search=False):
    """Lane-packed twin of :func:`_broyden_in_kernel`: ``reps`` examples per
    program, each with its own convergence/stall/protective-break state.
    Per-example scalars live as (1, reps) vectors; the rank-1 inner products
    become segment sums (one small matmul each). Frozen (done) examples'
    state is write-masked — identical per-example semantics to running each
    example in its own program, modulo the shared loop trip count (extra
    iterations only recompute frozen values and mask the writes).

    ``tail``/``tail_start``: the same precision ladder as the scalar variant.
    The tail engages if ANY lane is unconverged-and-unbroken after phase 1;
    only those lanes are re-armed (re-evaluated residual at their best
    iterate, secant factors kept) — converged lane-mates' state is masked
    through untouched."""
    # Mosaic cannot yield vector masks (i1) or narrow int vectors from an
    # scf loop region — every per-example flag/counter in the carry is a
    # (1, reps) f32 0/1 vector (booleans live only as temporaries).
    f32 = jnp.float32
    RHW = reps * HW
    K = threshold
    seg_sum, to_lanes = _make_seg(reps, HW)
    norm = lambda g: jnp.sqrt(seg_sum(g * g))
    zero_plane = jnp.zeros((c8, RHW), f32)
    zero_vec = jnp.zeros((1, reps), f32)
    b2f = lambda b: b.astype(f32)

    g0 = resid(z0)
    init_obj = norm(g0)
    s0 = _PackedLoopState(
        z=z0, gx=g0, update=g0 if newton_init else -g0,
        U=(zero_plane,) * K, V=(zero_plane,) * K,
        best_z=z0, best_gx=g0, best_obj=init_obj, best_snap=init_obj,
        best_step=zero_vec, nstep=zero_vec,
        prot=zero_vec, done=b2f(init_obj < eps_i))

    def make_loop(resid, cap):
        def cond(s):
            return jnp.max((1.0 - s.done) * b2f(s.nstep < cap)) > 0.5

        def body(s):
            active = (1.0 - s.done) * b2f(s.nstep < cap)     # (1, reps) f32
            act_l = to_lanes(active)
            z_new = s.z + s.update * act_l
            g_new = resid(z_new)
            if line_search:
                # Per-lane bounded 2-trial Armijo (XLA twin:
                # ops/broyden.py:212-246); the two trial evals run on the
                # whole plane whenever ANY lane fails (same convoy behavior
                # as the XLA any-row cond) and lanes blend their own
                # accepted step.
                c1 = 1e-4
                phi0 = seg_sum(s.gx * s.gx)                  # (1, reps)
                phi1 = seg_sum(g_new * g_new)
                fail = active * b2f(phi1 > phi0 * (1.0 - c1))

                def backtrack(args):
                    z1, g1 = args
                    sq = jnp.clip(phi0 / (2.0 * phi1 + 1e-30), 1e-2, 1.0)
                    z_q = s.z + to_lanes(sq) * s.update * act_l
                    g_q = resid(z_q)
                    phi_q = seg_sum(g_q * g_q)
                    ok_q = b2f(phi_q <= phi0 * (1.0 - c1 * sq))
                    sh = sq * 0.5
                    z_h = s.z + to_lanes(sh) * s.update * act_l
                    g_h = resid(z_h)
                    phi_h = seg_sum(g_h * g_h)
                    ok_h = b2f(phi_h <= phi0 * (1.0 - c1 * sh))
                    take_q = to_lanes(fail * ok_q)
                    take_h = to_lanes(fail * (1.0 - ok_q) * ok_h)
                    sel = lambda a_q, a_h, a_1: jnp.where(
                        take_q > 0.5, a_q, jnp.where(take_h > 0.5, a_h, a_1))
                    return sel(z_q, z_h, z1), sel(g_q, g_h, g1)

                z_new, g_new = jax.lax.cond(
                    jnp.max(fail) > 0.5, backtrack, lambda a: a,
                    (z_new, g_new))
            delta_z = (z_new - s.z) if line_search else s.update * act_l
            delta_g = (g_new - s.gx) * act_l
            nstep = s.nstep + active
            obj = norm(g_new)

            improved = active * b2f(obj < s.best_obj)
            imp_l = to_lanes(improved)
            best_z = jnp.where(imp_l > 0.5, z_new, s.best_z)
            best_gx = jnp.where(imp_l > 0.5, g_new, s.best_gx)
            best_obj = jnp.where(improved > 0.5, obj, s.best_obj)
            best_step = jnp.where(improved > 0.5, nstep, s.best_step)

            bad = active * b2f(~jnp.isfinite(obj)
                               | (obj > init_obj * _PROTECT_THRES))
            prot = jnp.maximum(s.prot, bad)
            done = jnp.maximum(s.done,
                               jnp.maximum(bad, active * b2f(obj < eps_i)))
            if stall_patience is not None:
                at_check = active * b2f(
                    jnp.floor(nstep - stall_patience
                              * jnp.floor(nstep / stall_patience)) < 0.5)
                stalled = at_check * b2f(
                    best_obj > s.best_snap * (1.0 - stall_rtol))
                if stall_guard is not None:
                    stalled = stalled * b2f(best_obj < stall_guard * eps_i)
                done = jnp.maximum(done, stalled)
                best_snap = jnp.where(at_check > 0.5, best_obj, s.best_snap)
            else:
                best_snap = s.best_snap

            # Rank-1 secant update, per-example contractions via segment
            # sums; delta_z is the step actually taken (== update unless the
            # line search shortened it).
            UVd = zero_plane
            UVg = zero_plane
            vT = -delta_z
            for k in range(K):
                UVd = UVd + s.U[k] * to_lanes(seg_sum(s.V[k] * delta_g))
                UVg = UVg + s.U[k] * to_lanes(seg_sum(s.V[k] * g_new))
                vT = vT + s.V[k] * to_lanes(seg_sum(s.U[k] * delta_z))
            matvec_dgx = -delta_g + UVd
            matvec_gx = -g_new + UVg
            denom_l = to_lanes(seg_sum(vT * delta_g))
            u = (delta_z - matvec_dgx) / denom_l
            vT = jnp.where(jnp.isfinite(vT), vT, 0.0)
            u = jnp.where(jnp.isfinite(u), u, 0.0)

            # circular column index (nstep - 1) mod K, in f32 arithmetic
            col = nstep - 1.0
            col = col - K * jnp.floor(col / K)
            U, V = [], []
            for k in range(K):
                wk = to_lanes(active * b2f(jnp.abs(col - k) < 0.5))
                U.append(jnp.where(wk > 0.5, u, s.U[k]))
                V.append(jnp.where(wk > 0.5, vT, s.V[k]))
            update = -matvec_gx - u * to_lanes(seg_sum(vT * g_new))

            return _PackedLoopState(z=z_new, gx=g_new, update=update,
                                    U=tuple(U), V=tuple(V),
                                    best_z=best_z, best_gx=best_gx,
                                    best_obj=best_obj, best_snap=best_snap,
                                    best_step=best_step, nstep=nstep, prot=prot,
                                    done=done)

        return cond, body

    cap1 = stage_caps[0] if tails else threshold
    cond1, body1 = make_loop(resid, cap1)
    s = jax.lax.while_loop(cond1, body1, s0)

    def make_run_tail(j):
        tail_fn = tails[j]
        cap = stage_caps[j + 1] if j + 1 < len(stage_caps) else threshold

        def run_tail(s):
            resid_t = tail_fn()
            need = (1.0 - s.prot) * b2f(s.best_obj >= eps_i)  # (1, reps)
            nl = to_lanes(need)
            g_b = resid_t(s.best_z)
            obj = norm(g_b)
            # re-apply the carried inverse-Jacobian estimate to the
            # re-evaluated residual for the re-armed lanes; frozen lanes
            # keep their state.
            UVg = zero_plane
            for k in range(K):
                UVg = UVg + s.U[k] * to_lanes(seg_sum(s.V[k] * g_b))
            s2 = _PackedLoopState(
                z=jnp.where(nl > 0.5, s.best_z, s.z),
                gx=jnp.where(nl > 0.5, g_b, s.gx),
                update=jnp.where(nl > 0.5, g_b - UVg, s.update),
                U=s.U, V=s.V,
                best_z=s.best_z,
                best_gx=jnp.where(nl > 0.5, g_b, s.best_gx),
                best_obj=jnp.where(need > 0.5, obj, s.best_obj),
                best_snap=jnp.where(need > 0.5, obj, s.best_snap),
                best_step=s.best_step, nstep=s.nstep, prot=s.prot,
                done=jnp.where(need > 0.5,
                               jnp.maximum(s.prot, b2f(obj < eps_i)),
                               s.done))
            cond2, body2 = make_loop(resid_t, cap)
            s3 = jax.lax.while_loop(cond2, body2, s2)
            if j + 1 < len(tails):
                # nested like the scalar variant: one top-level cond total
                nxt = jnp.max((1.0 - s3.prot) * b2f(s3.best_obj >= eps_i))
                s3 = jax.lax.cond(nxt > 0.5, make_run_tail(j + 1),
                                  lambda s: s, s3)
            return s3

        return run_tail

    if tails:
        any_need = jnp.max((1.0 - s.prot) * b2f(s.best_obj >= eps_i)) > 0.5
        s = jax.lax.cond(any_need, make_run_tail(0), lambda s: s, s)
    return s


class _LoopState(NamedTuple):
    z: jax.Array
    gx: jax.Array
    update: jax.Array
    U: tuple
    V: tuple
    best_z: jax.Array
    best_gx: jax.Array
    best_aux: tuple
    best_obj: jax.Array
    best_snap: jax.Array
    best_step: jax.Array
    nstep: jax.Array
    prot: jax.Array
    done: jax.Array


def _broyden_in_kernel(resid, z0, *, c8, HW, threshold, eps_i,
                       stall_patience, stall_rtol, stall_guard=None,
                       newton_init=False, tails=(), stage_caps=(),
                       line_search=False, uv_refs=None):
    """The Broyden while_loop, run entirely inside a kernel for ONE example.

    Semantics mirror ``ops.broyden.broyden`` per example (best-iterate,
    protective break, monotone-window stall exit, NaN scrub). The low-rank
    factors live in the carry as K separate (c8, HW) planes (static unroll):
    the rank-1 algebra is then pure 2D/scalar VPU work, which Mosaic lowers
    cleanly (3D major-axis reductions crash the layout pass), and it is
    negligible next to the conv matmuls.

    ``resid`` may return either ``g`` or ``(g, aux)`` where aux is a tuple of
    per-eval byproducts (e.g. pre-activation tensors); the returned state
    carries the best iterate's aux alongside it.

    Precision ladder: with ``tail`` (a nullary closure building a
    higher-precision residual fn), phase 1 runs ``resid`` until convergence,
    stall, protective break, or ``tail_start`` iterations; if the example is
    then neither converged nor broken, it re-arms — continue from the best
    iterate, its residual re-evaluated by the tail fn so the tail phase is
    precision-consistent, keeping the built-up secant factors — and polishes
    under the remaining shared ``threshold`` budget. The whole tail
    (including the one re-evaluation) sits under a ``lax.cond``, so programs
    whose examples all converged in phase 1 pay nothing.

    ``uv_refs`` (optional): a pair of (threshold*c8, HW) f32 VMEM scratch
    refs holding the U/V rank-1 factors plane-major. When given, the factors
    leave the while_loop carry: the ring-buffer write becomes ONE dynamic
    sublane-offset store per factor (instead of an unrolled K-plane select),
    and the matvec contractions run a dynamic-trip-count fori_loop over the
    nstep planes actually written — the ring never wraps (nstep <= threshold
    per solve), so planes nstep..K-1 are never touched, skipping the
    O(threshold - nstep) dead-plane work the carried form pays every
    iteration (IMNF_SECANT_REFS; same arithmetic, same iterates).
    """
    f32 = jnp.float32
    norm = lambda g: jnp.sqrt(jnp.sum(g * g))
    K = threshold
    zero_plane = jnp.zeros((c8, HW), f32)
    use_refs = uv_refs is not None
    if use_refs:
        from jax.experimental import pallas as pl

        U_ref, V_ref = uv_refs

    def wrap(fn):
        def eval_resid(z):
            out = fn(z)
            return out if isinstance(out, tuple) else (out, ())
        return eval_resid

    eval0 = wrap(resid)
    g0, aux0 = eval0(z0)
    init_obj = norm(g0)
    s0 = _LoopState(
        z=z0, gx=g0, update=g0 if newton_init else -g0,
        U=() if use_refs else (zero_plane,) * K,
        V=() if use_refs else (zero_plane,) * K,
        best_z=z0, best_gx=g0, best_aux=aux0, best_obj=init_obj,
        best_snap=init_obj,
        best_step=jnp.zeros((), jnp.int32), nstep=jnp.zeros((), jnp.int32),
        prot=jnp.zeros((), jnp.bool_), done=init_obj < eps_i)

    def make_loop(eval_resid, cap):
        def cond(s):
            return jnp.logical_not(s.done) & (s.nstep < cap)

        def body(s):
            z_new = s.z + s.update
            g_new, aux_new = eval_resid(z_new)
            if line_search:
                # Bounded 2-trial Armijo backtracking, mirroring the XLA
                # solver (ops/broyden.py:212-246; reference
                # scalar_search_armijo, broyden.py:24-99): quadratic-
                # interpolant step (clamped to the reference's amin=1e-2),
                # then its half; rows failing both keep the full step. The
                # extra evals sit under a lax.cond on failure.
                c1 = 1e-4
                phi0 = jnp.sum(s.gx * s.gx)
                phi1 = jnp.sum(g_new * g_new)
                fail = phi1 > phi0 * (1.0 - c1)

                def backtrack(args):
                    z1, g1, aux1 = args
                    sq = jnp.clip(phi0 / (2.0 * phi1 + 1e-30), 1e-2, 1.0)
                    z_q = s.z + sq * s.update
                    g_q, aux_q = eval_resid(z_q)
                    phi_q = jnp.sum(g_q * g_q)
                    ok_q = phi_q <= phi0 * (1.0 - c1 * sq)
                    sh = sq * 0.5
                    z_h = s.z + sh * s.update
                    g_h, aux_h = eval_resid(z_h)
                    phi_h = jnp.sum(g_h * g_h)
                    ok_h = phi_h <= phi0 * (1.0 - c1 * sh)
                    sel = lambda a_q, a_h, a_1: jnp.where(
                        ok_q, a_q, jnp.where(ok_h, a_h, a_1))
                    aux_sel = tuple(sel(aq, ah, a1) for aq, ah, a1
                                    in zip(aux_q, aux_h, aux1))
                    return sel(z_q, z_h, z1), sel(g_q, g_h, g1), aux_sel

                z_new, g_new, aux_new = jax.lax.cond(
                    fail, backtrack, lambda a: a, (z_new, g_new, aux_new))
            delta_z = z_new - s.z if line_search else s.update
            delta_g = g_new - s.gx
            nstep = s.nstep + 1
            obj = norm(g_new)

            improved = obj < s.best_obj
            best_z = jnp.where(improved, z_new, s.best_z)
            best_gx = jnp.where(improved, g_new, s.best_gx)
            best_aux = tuple(jnp.where(improved, a_new, a_old)
                             for a_new, a_old in zip(aux_new, s.best_aux))
            best_obj = jnp.where(improved, obj, s.best_obj)
            best_step = jnp.where(improved, nstep, s.best_step)

            bad = ~jnp.isfinite(obj) | (obj > init_obj * _PROTECT_THRES)
            prot = s.prot | bad
            done = bad | (obj < eps_i)
            if stall_patience is not None:
                at_check = (nstep % stall_patience) == 0
                stalled = at_check & (best_obj > s.best_snap * (1.0 - stall_rtol))
                if stall_guard is not None:
                    stalled = stalled & (best_obj < stall_guard * eps_i)
                done = done | stalled
                best_snap = jnp.where(at_check, best_obj, s.best_snap)
            else:
                best_snap = s.best_snap

            # Rank-1 secant update (broyden.py:174-181); all contractions are
            # elementwise-multiply + scalar-reduce over (c8, HW) planes.
            # delta_z is the step actually taken (== update unless the line
            # search shortened it).
            if use_refs:
                # planes 0..s.nstep-1 are the ones written so far (the ring
                # never wraps); the dynamic trip count skips the rest.
                def contract(k, carry):
                    UVd, UVg, vT = carry
                    Uk = U_ref[pl.ds(k * c8, c8), :]
                    Vk = V_ref[pl.ds(k * c8, c8), :]
                    UVd = UVd + Uk * jnp.sum(Vk * delta_g)
                    UVg = UVg + Uk * jnp.sum(Vk * g_new)
                    vT = vT + Vk * jnp.sum(Uk * delta_z)
                    return UVd, UVg, vT

                UVd, UVg, vT = jax.lax.fori_loop(
                    0, s.nstep, contract,
                    (zero_plane, zero_plane, -delta_z))
            else:
                UVd = zero_plane
                UVg = zero_plane
                vT = -delta_z
                for k in range(K):
                    UVd = UVd + s.U[k] * jnp.sum(s.V[k] * delta_g)
                    UVg = UVg + s.U[k] * jnp.sum(s.V[k] * g_new)
                    vT = vT + s.V[k] * jnp.sum(s.U[k] * delta_z)
            matvec_dgx = -delta_g + UVd
            matvec_gx = -g_new + UVg
            denom = jnp.sum(vT * delta_g)
            u = (delta_z - matvec_dgx) / denom
            vT = jnp.where(jnp.isfinite(vT), vT, 0.0)
            u = jnp.where(jnp.isfinite(u), u, 0.0)

            if use_refs:
                col = s.nstep  # == nstep - 1; never wraps
                U_ref[pl.ds(col * c8, c8), :] = u
                V_ref[pl.ds(col * c8, c8), :] = vT
                U, V = (), ()
            else:
                col = (nstep - 1) % threshold
                U = tuple(jnp.where(col == k, u, s.U[k]) for k in range(K))
                V = tuple(jnp.where(col == k, vT, s.V[k]) for k in range(K))
            update = -matvec_gx - u * jnp.sum(vT * g_new)

            return _LoopState(z=z_new, gx=g_new, update=update, U=U, V=V,
                              best_z=best_z, best_gx=best_gx,
                              best_aux=best_aux, best_obj=best_obj,
                              best_snap=best_snap, best_step=best_step,
                              nstep=nstep, prot=prot, done=done)

        return cond, body

    cap1 = stage_caps[0] if tails else threshold
    cond1, body1 = make_loop(eval0, cap1)
    s = jax.lax.while_loop(cond1, body1, s0)

    def make_run_tail(j):
        tail_fn = tails[j]
        cap = stage_caps[j + 1] if j + 1 < len(stage_caps) else threshold

        def run_tail(s):
            eval_t = wrap(tail_fn())
            g_b, aux_b = eval_t(s.best_z)
            obj = norm(g_b)
            # re-apply the carried inverse-Jacobian estimate to the
            # re-evaluated residual: update = -(-g + sum_k U_k <V_k, g>)
            if use_refs:
                def c2(k, UVg):
                    Uk = U_ref[pl.ds(k * c8, c8), :]
                    Vk = V_ref[pl.ds(k * c8, c8), :]
                    return UVg + Uk * jnp.sum(Vk * g_b)

                UVg = jax.lax.fori_loop(0, s.nstep, c2, zero_plane)
            else:
                UVg = zero_plane
                for k in range(K):
                    UVg = UVg + s.U[k] * jnp.sum(s.V[k] * g_b)
            s2 = _LoopState(
                z=s.best_z, gx=g_b, update=g_b - UVg, U=s.U, V=s.V,
                best_z=s.best_z, best_gx=g_b, best_aux=aux_b, best_obj=obj,
                best_snap=obj, best_step=s.best_step, nstep=s.nstep,
                prot=s.prot, done=s.prot | (obj < eps_i))
            cond2, body2 = make_loop(eval_t, cap)
            s3 = jax.lax.while_loop(cond2, body2, s2)
            if j + 1 < len(tails):
                # nest the next stage INSIDE this branch: needing stage j+1
                # implies having entered stage j, so programs that converge
                # in phase 1 see exactly ONE cond (an un-taken top-level
                # cond still costs ~17us/program in Mosaic — measured as a
                # +1.1 ms regression per 16x16 batch solve when the stages
                # were chained at top level, solve_lab_multi.json).
                need2 = jnp.logical_not(s3.prot) & (s3.best_obj >= eps_i)
                s3 = jax.lax.cond(need2, make_run_tail(j + 1),
                                  lambda s: s, s3)
            return s3

        return run_tail

    if tails:
        need = jnp.logical_not(s.prot) & (s.best_obj >= eps_i)
        s = jax.lax.cond(need, make_run_tail(0), lambda s: s, s)
    return s


def _solve_kernel(betas_ref, x_ref,
                  m1x_ref, m2x_ref, m3x_ref, b1x_ref, b2x_ref, b3x_ref,
                  m1z_ref, m2z_ref, m3z_ref, b1z_ref, b2z_ref, b3z_ref,
                  z_out_ref, g_out_ref, diag_ref,
                  *scratch, H, W, reps, c8, mid, threshold, eps_i,
                  stall_patience, stall_rtol, stall_guard, newton_init,
                  preact_x, preact_z, warm_start, mode, tail_mode=None,
                  tail_start=None, line_search=False):
    f32 = jnp.float32
    uv_refs = (scratch[0], scratch[1]) if scratch else None
    RHW = reps * H * W
    shifted = _make_shifted(H, W, reps)

    x = x_ref[0]
    b1x, b2x, b3x = b1x_ref[:], b2x_ref[:], b3x_ref[:]
    b1z, b2z, b3z = b1z_ref[:], b2z_ref[:], b3z_ref[:]
    eval_x = _make_eval(shifted, mode, m1x_ref[:], m2x_ref[:], m3x_ref[:],
                        b1x, b2x, b3x, betas_ref[0], betas_ref[1],
                        betas_ref[2], preact_x, c8, RHW)
    eval_z = _make_eval(shifted, mode, m1z_ref[:], m2z_ref[:], m3z_ref[:],
                        b1z, b2z, b3z, betas_ref[3], betas_ref[4],
                        betas_ref[5], preact_z, c8, RHW)

    x_embed = x + eval_x(x)
    resid = lambda z: x_embed - eval_z(z) - z
    z0 = x if warm_start else jnp.zeros((c8, RHW), f32)

    tail_modes, stage_caps = _norm_ladder(threshold, tail_mode, tail_start)
    tails = []
    for tm in tail_modes:
        def tail(tm=tm):
            # the stage's evals are built HERE, inside the nullary invoked
            # under the stage's lax.cond: the weight-side precision prep
            # (hi/lo splits + kpack concat, ~100us/program for a tf32x
            # stage at the CIFAR shapes) is traced into the cond branch and
            # costs nothing for programs that converge earlier. The
            # embedding is re-evaluated at this stage's precision so the
            # polished residual is precision-consistent end to end.
            eval_x_t = _make_eval(shifted, tm, m1x_ref[:], m2x_ref[:],
                                  m3x_ref[:], b1x, b2x, b3x, betas_ref[0],
                                  betas_ref[1], betas_ref[2], preact_x,
                                  c8, RHW)
            eval_z_t = _make_eval(shifted, tm, m1z_ref[:], m2z_ref[:],
                                  m3z_ref[:], b1z, b2z, b3z, betas_ref[3],
                                  betas_ref[4], betas_ref[5], preact_z,
                                  c8, RHW)
            xe_t = x + eval_x_t(x)
            return lambda z: xe_t - eval_z_t(z) - z

        tails.append(tail)

    if reps == 1:
        s = _broyden_in_kernel(resid, z0,
                               c8=c8, HW=RHW, threshold=threshold,
                               eps_i=eps_i, stall_patience=stall_patience,
                               stall_rtol=stall_rtol, stall_guard=stall_guard,
                               newton_init=newton_init, tails=tails,
                               stage_caps=stage_caps, line_search=line_search,
                               uv_refs=uv_refs)
    else:
        s = _broyden_in_kernel_packed(resid, z0,
                                      c8=c8, HW=H * W, reps=reps,
                                      threshold=threshold, eps_i=eps_i,
                                      stall_patience=stall_patience,
                                      stall_rtol=stall_rtol,
                                      stall_guard=stall_guard,
                                      newton_init=newton_init, tails=tails,
                                      stage_caps=stage_caps,
                                      line_search=line_search)

    z_out_ref[0] = s.best_z
    g_out_ref[0] = s.best_gx
    diag_ref[0] = _diag_tile(s, eps_i, reps)


def _diag_tile(s, eps_i, reps):
    """Per-example solver diagnostics as an (8, 128) f32 tile: rows
    [nstep, converged, prot, best_obj, best_step, 0, 0, 0], one example per
    lane (lane-broadcast when reps == 1). Mosaic requires (8, 128)-tileable
    output blocks."""
    f32 = jnp.float32
    if reps == 1:
        row = lambda v: jnp.broadcast_to(
            jnp.asarray(v, f32).reshape(1, 1), (1, 128))
    else:
        pad = lambda v: jnp.pad(v.astype(f32), ((0, 0), (0, 128 - reps)))
        row = lambda v: pad(v if hasattr(v, "ndim") and v.ndim == 2
                            else jnp.broadcast_to(jnp.asarray(v, f32), (1, reps)))
    zero = jnp.zeros((3, 128), f32)
    return jnp.concatenate([
        row(s.nstep), row(s.best_obj < eps_i), row(s.prot), row(s.best_obj),
        row(s.best_step), zero], axis=0)


def _make_apply_jt(shifted, mode, m3, m2, m1, s0, s1, s2, c8, HW):
    """Functional u -> J_g^T u from resident operands (the transpose-direction
    twin of ``_make_eval``; same math as ``fused_chain._make_apply_jt`` but
    carry-friendly: no scratch refs). ``mode`` is a precision-mode string
    (weight prep hoisted, see ``_make_wdot``).

    d3 contracts over the same small 9*c8 axis as the forward conv1, but
    kpack is deliberately NOT applied here: every production caller passes
    mode 'bf16' or 'f32' (chain_mode / IMNF_BWD_PRECISION), both
    single-pass — there are no emulation passes to pack."""
    d3, d2, d1 = (_make_wdot(mode, m) for m in (m3, m2, m1))

    def apply_JT(u):
        u9 = jnp.concatenate(
            [shifted(u, dy, dx) for (dy, dx) in _OFFSETS], axis=0)
        t = d3(u9) * s2                             # (mid, HW) f32
        t = d2(t) * s1
        R = d1(t)                                   # (9*c8, HW)
        v = jnp.zeros((c8, HW), jnp.float32)
        for d, (dy, dx) in enumerate(_OFFSETS):
            v += shifted(R[d * c8:(d + 1) * c8], dy, dx)
        return v * s0

    return apply_JT


def _backward_kernel(grad_ref, s0_ref, s1_ref, s2_ref,
                     m3_ref, m2_ref, m1_ref, u_out_ref,
                     *scratch, H, W, reps, c8, mid, threshold, eps_i,
                     stall_patience, stall_rtol, stall_guard, newton_init,
                     mode, line_search=False):
    """Solve u (I + J_gz) = grad for one example (or ``reps`` lane-packed
    examples), fully in VMEM: the linearization tensors s0/s1/s2 stay
    resident across all iterations (the XLA path re-streams them per VJP
    application)."""
    f32 = jnp.float32
    RHW = reps * H * W
    shifted = _make_shifted(H, W, reps)
    apply_JT = _make_apply_jt(shifted, mode, m3_ref[:], m2_ref[:], m1_ref[:],
                              s0_ref[0].astype(f32), s1_ref[0].astype(f32),
                              s2_ref[0].astype(f32), c8, RHW)
    grad = grad_ref[0]
    resid = lambda u: u + apply_JT(u) - grad
    uv_refs = (scratch[0], scratch[1]) if scratch else None
    if reps == 1:
        s = _broyden_in_kernel(resid, jnp.zeros((c8, RHW), f32),
                               c8=c8, HW=RHW, threshold=threshold,
                               eps_i=eps_i, stall_patience=stall_patience,
                               stall_rtol=stall_rtol, stall_guard=stall_guard,
                               newton_init=newton_init,
                               line_search=line_search, uv_refs=uv_refs)
    else:
        s = _broyden_in_kernel_packed(resid, jnp.zeros((c8, RHW), f32),
                                      c8=c8, HW=H * W, reps=reps,
                                      threshold=threshold, eps_i=eps_i,
                                      stall_patience=stall_patience,
                                      stall_rtol=stall_rtol,
                                      stall_guard=stall_guard,
                                      newton_init=newton_init,
                                      line_search=line_search)
    u_out_ref[0] = s.best_z


def fused_backward_solve(grad, chain_data, *, threshold, eps,
                         stall_patience, stall_rtol, stall_guard=None,
                         newton_init=False, mode="bf16", line_search=False,
                         secant_refs=False, interpret=False, reps=1):
    """Fused implicit-gradient solve ``u (I + J_gz) = grad``
    (``imBlock.Backward.backward``, reference implicit_block.py:196-206).

    ``chain_data`` is (s0, s1, s2, w1, w2, w3) from
    ``LipschitzNet.conv_chain_data`` at the linearization point (the
    re-attached z), at the caller's precision cast — identical inputs to the
    XLA path's ``jax.vjp`` chain. ``mode='bf16'`` matches the default
    IMNF_BWD_PRECISION (J_gz applications in bf16, solver state f32).
    Returns u with grad's (B, c, H, W) shape.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused_chain import (conv1x1_transpose_mat, conv3_transpose_mats,
                              conv3_transpose_mats_cout)

    B, c, H, W = grad.shape
    HW = H * W
    c8 = max(8, -(-c // 8) * 8)
    eps_i = float(eps) * ((c * H * W) ** 0.5)

    s0, s1, s2, w1, w2, w3 = [jax.lax.stop_gradient(a) for a in chain_data]
    mdt = jnp.bfloat16 if mode == "bf16" else jnp.float32
    m3 = conv3_transpose_mats(w3.astype(mdt), c8)
    m2 = conv1x1_transpose_mat(w2.astype(mdt))
    m1 = conv3_transpose_mats_cout(w1.astype(mdt), c8)
    mid = m2.shape[0]

    from .fused_chain import pack_reps, unpack_reps

    RHW = reps * HW
    pk = lambda a: pack_reps(a, reps)
    gp = pk(_pad_c(grad.astype(jnp.float32), c8))
    s0p = pk(_pad_c(s0, c8))
    fl = lambda a: pk(a.reshape(B, a.shape[1], HW))
    s1p, s2p = fl(s1), fl(s2)

    def _call(gp, s0p, s1p, s2p, m3, m2, m1):
        Bl = gp.shape[0]  # per-shard packed batch under shard_map
        ex = lambda i: (i, 0, 0)
        const2 = lambda r, s: pl.BlockSpec((r, s), lambda i: (0, 0))
        return pl.pallas_call(
            functools.partial(_backward_kernel, H=H, W=W, reps=reps, c8=c8,
                              mid=mid, threshold=int(threshold), eps_i=eps_i,
                              stall_patience=stall_patience,
                              stall_rtol=stall_rtol, stall_guard=stall_guard,
                              newton_init=newton_init, mode=mode,
                              line_search=line_search),
            grid=(Bl,),
            in_specs=[pl.BlockSpec((1, c8, RHW), ex),
                      pl.BlockSpec((1, c8, RHW), ex),
                      pl.BlockSpec((1, mid, RHW), ex),
                      pl.BlockSpec((1, mid, RHW), ex),
                      const2(mid, 9 * c8), const2(mid, mid), const2(9 * c8, mid)],
            out_specs=pl.BlockSpec((1, c8, RHW), ex),
            out_shape=jax.ShapeDtypeStruct((Bl, c8, RHW), jnp.float32),
            scratch_shapes=(
                [pltpu.VMEM((int(threshold) * c8, RHW), jnp.float32)] * 2
                if (secant_refs and reps == 1) else []),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(gp, s0p, s1p, s2p, m3, m2, m1)

    out = _maybe_shard(_call, n_batch_leading=4, n_rep_leading=0, n_out=1)(
        gp, s0p, s1p, s2p, m3, m2, m1)
    return unpack_reps(out, reps)[:, :c].reshape(B, c, H, W)


def _pad_c(a, c8):
    """(B, c, H, W) -> (B, c8, H*W) zero-padded channels."""
    B, c, H, W = a.shape
    a = a.reshape(B, c, H * W)
    return _pad_rows(a, c8, axis=1)


def _maybe_shard(call, n_batch_leading, n_rep_leading, n_out):
    """Partition a pallas-invoking function over the active mesh's 'data'
    axis via shard_map. Under GSPMD jit a pallas_call is an opaque custom
    call — with batch-sharded operands XLA would insert all-gathers and run
    it replicated; shard_map instead traces the kernel per shard (grid and
    block specs see the LOCAL batch), which is the TPU-native partitioning.

    Arg layout contract: ``n_rep_leading`` replicated args (scalars/roulette)
    first, then ``n_batch_leading`` batch-leading tensors, then replicated
    matrices. All ``n_out`` outputs are batch-leading.
    """
    from jax.sharding import PartitionSpec as P
    from jax.sharding import get_abstract_mesh

    m = get_abstract_mesh()
    names = getattr(m, "axis_names", ())
    if "data" not in names or dict(m.shape).get("data", 1) <= 1:
        return call

    def in_spec(i, a):
        if n_rep_leading <= i < n_rep_leading + n_batch_leading:
            return P("data", *([None] * (a.ndim - 1)))
        return P()

    def wrapped(*args):
        in_specs = tuple(in_spec(i, a) for i, a in enumerate(args))
        out_specs = tuple(P("data", None, None) for _ in range(n_out))
        if n_out == 1:
            out_specs = out_specs[0]
        return jax.shard_map(call, mesh=m, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(*args)

    return wrapped


def _prep_fwd(data, c8):
    """Forward-direction im2col matrices + biases from a
    ``conv_forward_data`` dict."""
    m1 = conv3_forward_mat(data["w1"].astype(jnp.float32), c8)
    m2 = conv1x1_forward_mat(data["w2"].astype(jnp.float32))
    m3 = conv3_forward_mats_cout(data["w3"].astype(jnp.float32), c8)
    b1 = data["b1"].astype(jnp.float32)[:, None]
    b2 = data["b2"].astype(jnp.float32)[:, None]
    b3 = _pad_rows(data["b3"].astype(jnp.float32), c8, 0)[:, None]
    return m1, m2, m3, b1, b2, b3


def _prep_jt(data, c8, dtype):
    """Transpose-direction (cotangent) matrices for the Neumann chain."""
    from .fused_chain import (conv1x1_transpose_mat, conv3_transpose_mats,
                              conv3_transpose_mats_cout)

    m3t = conv3_transpose_mats(data["w3"].astype(dtype), c8)
    m2t = conv1x1_transpose_mat(data["w2"].astype(dtype))
    m1t = conv3_transpose_mats_cout(data["w1"].astype(dtype), c8)
    return m3t, m2t, m1t


def _dswish_dbeta(t, b):
    s = jax.nn.sigmoid(t * b)
    return t * t * s * (1.0 - s) * jnp.float32(1.0 / 1.1)


def _d2swish(t, b):
    """d^2/dt^2 of swish(t; b) = t*sigmoid(b t)/1.1."""
    s = jax.nn.sigmoid(t * b)
    sp = s * (1.0 - s)
    return (2.0 * b * sp + b * b * t * (1.0 - 2.0 * s) * sp) * jnp.float32(1.0 / 1.1)


def _ddswish_dbeta(t, b):
    """d/db of swish'(t; b)."""
    s = jax.nn.sigmoid(t * b)
    sp = s * (1.0 - s)
    return (2.0 * t * sp + b * t * t * (1.0 - 2.0 * s) * sp) * jnp.float32(1.0 / 1.1)


def _dot_nt(dot, a, b):
    """(M, HW) x (N, HW) -> (M, N): contraction over the lane axis, at the
    same precision model as ``dot``."""
    return dot(a, jnp.transpose(b))


def _net_vjp_in_kernel(shifted, dot, mats, tmats, beta0, beta1, beta2,
                       preact, c8, HW, h, cot, want_dh):
    """First-order VJP of one residual conv net at input ``h`` with cotangent
    ``cot``, entirely from VMEM-resident operands: forward intermediates
    recomputed in-kernel, then data-grad (transpose mats) and weight-grad
    (activation outer products) passes. Returns
    ``(d_h or None, (dW1, dW2, dW3s, db1, db2, db3, dbetas))`` where the dW
    are grads w.r.t. the EFFECTIVE (soft-normalized) kernels in the fused
    im2col layouts (map back with ``conv3_forward_mat_grad`` etc.), and
    dbetas are grads w.r.t. the softplus-resolved swish slopes."""
    f32 = jnp.float32
    m1, m2, m3, b1, b2, b3 = mats
    m3t, m2t, m1t = tmats

    a0 = _swish(h, beta0) if preact else h
    a0sh = jnp.concatenate(
        [shifted(a0, -dy, -dx) for (dy, dx) in _OFFSETS], axis=0)
    h1 = dot(m1, a0sh) + b1
    a1 = _swish(h1, beta1)
    h2 = dot(m2, a1) + b2
    a2 = _swish(h2, beta2)

    csh = jnp.concatenate(
        [shifted(cot, dy, dx) for (dy, dx) in _OFFSETS], axis=0)
    dW3s = _dot_nt(dot, csh, a2)                      # (9c8, mid)
    db3 = jnp.sum(cot, axis=1, keepdims=True)         # (c8, 1)
    t2 = dot(m3t, csh)                                # (mid, HW)
    dbeta2 = jnp.sum(t2 * _dswish_dbeta(h2, beta2))
    t2h = t2 * _dswish(h2, beta2)
    db2 = jnp.sum(t2h, axis=1, keepdims=True)
    dW2 = _dot_nt(dot, t2h, a1)                       # (mid, mid)
    t1 = dot(m2t, t2h)
    dbeta1 = jnp.sum(t1 * _dswish_dbeta(h1, beta1))
    t1h = t1 * _dswish(h1, beta1)
    db1 = jnp.sum(t1h, axis=1, keepdims=True)
    dW1 = _dot_nt(dot, t1h, a0sh)                     # (mid, 9c8)

    d_h = None
    dbeta0 = jnp.zeros((), f32)
    if want_dh or preact:
        R = dot(m1t, t1h)                             # (9c8, HW)
        t0 = jnp.zeros((c8, HW), f32)
        for d, (dy, dx) in enumerate(_OFFSETS):
            t0 += shifted(R[d * c8:(d + 1) * c8], dy, dx)
        if preact:
            dbeta0 = jnp.sum(t0 * _dswish_dbeta(h, beta0))
            d_h = t0 * _dswish(h, beta0)
        else:
            d_h = t0
    dbetas = jnp.stack([dbeta0, dbeta1, dbeta2])
    return d_h, (dW1, dW2, dW3s, db1, db2, db3, dbetas)


def _reattach_vjp_kernel(betas_ref, x_ref, zh_ref, u_ref,
                         m1x_ref, m2x_ref, m3x_ref, b1x_ref, b2x_ref, b3x_ref,
                         m1z_ref, m2z_ref, m3z_ref, b1z_ref, b2z_ref, b3z_ref,
                         m3tx_ref, m2tx_ref, m1tx_ref,
                         m3tz_ref, m2tz_ref, m1tz_ref,
                         dx_ref,
                         dW1x_ref, dW2x_ref, dW3x_ref, db1x_ref, db2x_ref,
                         db3x_ref, dbx_ref,
                         dW1z_ref, dW2z_ref, dW3z_ref, db1z_ref, db2z_ref,
                         db3z_ref, dbz_ref,
                         *, H, W, reps, c8, mid, preact_x, preact_z, mode):
    """VJP of the re-attachment ``(vx, vz, xx) -> xx + g_x(xx) - g_z(z_hat)``
    with cotangent u (``_make_bwd_core``'s closing step; reference
    implicit_block.py:210-213,227) for one example per grid step, with the
    per-parameter grads accumulated across the batch in VMEM-resident output
    tiles. d_x = u + J_gx^T u; net_z sees cotangent -u; z_hat is a constant
    (no d_z). ``reps`` examples may be lane-packed per program — the
    per-parameter outputs are batch sums either way."""
    f32 = jnp.float32
    HW = reps * H * W
    shifted = _make_shifted(H, W, reps)
    dot = _make_dot(mode)
    from jax.experimental import pallas as pl

    x = x_ref[0]
    zh = zh_ref[0]
    u = u_ref[0]

    mats_x = (m1x_ref[:], m2x_ref[:], m3x_ref[:],
              b1x_ref[:], b2x_ref[:], b3x_ref[:])
    mats_z = (m1z_ref[:], m2z_ref[:], m3z_ref[:],
              b1z_ref[:], b2z_ref[:], b3z_ref[:])
    tmats_x = (m3tx_ref[:], m2tx_ref[:], m1tx_ref[:])
    tmats_z = (m3tz_ref[:], m2tz_ref[:], m1tz_ref[:])

    d_hx, gx = _net_vjp_in_kernel(
        shifted, dot, mats_x, tmats_x, betas_ref[0], betas_ref[1],
        betas_ref[2], preact_x, c8, HW, x, u, want_dh=True)
    _, gz = _net_vjp_in_kernel(
        shifted, dot, mats_z, tmats_z, betas_ref[3], betas_ref[4],
        betas_ref[5], preact_z, c8, HW, zh, -u, want_dh=False)

    dx_ref[0] = u + d_hx

    beta_tile = lambda db: jnp.concatenate(
        [jnp.broadcast_to(db[k].reshape(1, 1), (1, 128)) for k in range(3)]
        + [jnp.zeros((5, 128), f32)], axis=0)

    outs_x = (dW1x_ref, dW2x_ref, dW3x_ref, db1x_ref, db2x_ref, db3x_ref,
              dbx_ref)
    outs_z = (dW1z_ref, dW2z_ref, dW3z_ref, db1z_ref, db2z_ref, db3z_ref,
              dbz_ref)
    first = pl.program_id(0) == 0

    for outs, grads in ((outs_x, gx), (outs_z, gz)):
        vals = list(grads[:-1]) + [beta_tile(grads[-1])]
        for ref, val in zip(outs, vals):
            @pl.when(first)
            def _(ref=ref, val=val):
                ref[:] = val.astype(f32)

            @pl.when(jnp.logical_not(first))
            def _(ref=ref, val=val):
                ref[:] = ref[:] + val.astype(f32)


def conv3_forward_mat_grad(dm, O, I):
    """Adjoint of :func:`conv3_forward_mat`: (O=mid, 9*c8) grad -> (O, I, 3, 3)."""
    c8 = dm.shape[1] // 9
    g = dm.reshape(O, 9, c8)[:, :, :I]               # (O, 9, I)
    return jnp.transpose(g, (1, 0, 2)).reshape(3, 3, O, I).transpose(2, 3, 0, 1)


def conv3_forward_mats_cout_grad(dm, O, I):
    """Adjoint of :func:`conv3_forward_mats_cout`: (9*c8, I=mid) -> (O, I, 3, 3)."""
    c8 = dm.shape[0] // 9
    g = dm.reshape(9, c8, dm.shape[1])[:, :O]        # (9, O, I)
    return g.reshape(3, 3, O, dm.shape[1]).transpose(2, 3, 0, 1)


def fused_reattach_vjp(x, z_hat, u, data_x, data_z, *, mode="bf16",
                       interpret=False, reps=1):
    """Pallas re-attachment VJP: returns ``(d_x, d_data_x, d_data_z)`` where
    the d_data dicts carry grads w.r.t. the EFFECTIVE conv kernels, biases
    and softplus-resolved swish slopes of ``conv_forward_data`` — pull them
    back to raw parameters with ``jax.vjp`` of ``conv_forward_data`` (the
    soft-normalization chain is tiny and stays XLA-side)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, c, H, W = x.shape
    HW = H * W
    c8 = max(8, -(-c // 8) * 8)
    data_x = {k: (jax.lax.stop_gradient(v) if hasattr(v, "dtype") else v)
              for k, v in data_x.items()}
    data_z = {k: (jax.lax.stop_gradient(v) if hasattr(v, "dtype") else v)
              for k, v in data_z.items()}
    from .fused_chain import pack_reps, unpack_reps

    mats_x, mats_z = _prep_fwd(data_x, c8), _prep_fwd(data_z, c8)
    tm_x = _prep_jt(data_x, c8, jnp.float32)
    tm_z = _prep_jt(data_z, c8, jnp.float32)
    mid = mats_x[1].shape[0]
    betas = jnp.concatenate([data_x["betas"], data_z["betas"]]).astype(jnp.float32)

    RHW = reps * HW
    xp = pack_reps(_pad_c(x.astype(jnp.float32), c8), reps)
    zhp = pack_reps(_pad_c(z_hat.astype(jnp.float32), c8), reps)
    up = pack_reps(_pad_c(u.astype(jnp.float32), c8), reps)

    grad_shapes = [
        jax.ShapeDtypeStruct((mid, 9 * c8), jnp.float32),
        jax.ShapeDtypeStruct((mid, mid), jnp.float32),
        jax.ShapeDtypeStruct((9 * c8, mid), jnp.float32),
        jax.ShapeDtypeStruct((mid, 1), jnp.float32),
        jax.ShapeDtypeStruct((mid, 1), jnp.float32),
        jax.ShapeDtypeStruct((c8, 1), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ]

    def _call(betas, xp, zhp, up, *mats):
        Bl = xp.shape[0]
        ex = lambda i, b: (i, 0, 0)
        const2 = lambda r, s: pl.BlockSpec((r, s), lambda i, b: (0, 0))
        in_specs = [pl.BlockSpec((1, c8, RHW), ex)] * 3
        for _ in range(2):
            in_specs += [const2(mid, 9 * c8), const2(mid, mid),
                         const2(9 * c8, mid),
                         const2(mid, 1), const2(mid, 1), const2(c8, 1)]
        for _ in range(2):
            in_specs += [const2(mid, 9 * c8), const2(mid, mid),
                         const2(9 * c8, mid)]
        gspecs = [const2(mid, 9 * c8), const2(mid, mid), const2(9 * c8, mid),
                  const2(mid, 1), const2(mid, 1), const2(c8, 1),
                  const2(8, 128)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bl,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((1, c8, RHW), ex)] + gspecs + gspecs,
        )
        kernel = functools.partial(
            _reattach_vjp_kernel, H=H, W=W, reps=reps, c8=c8, mid=mid,
            preact_x=bool(data_x["preact"]), preact_z=bool(data_z["preact"]),
            mode=mode)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((Bl, c8, RHW), jnp.float32)]
                      + grad_shapes + grad_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(betas, xp, zhp, up, *mats)

    def _sharded_call(*args):
        # under shard_map the weight-grad outputs are per-shard partial sums
        # over the local batch: psum them over 'data'
        outs = _call(*args)
        dx, rest = outs[0], outs[1:]
        rest = [jax.lax.psum(r, "data") for r in rest]
        return (dx, *rest)

    from jax.sharding import PartitionSpec as P
    from jax.sharding import get_abstract_mesh

    m = get_abstract_mesh()
    names = getattr(m, "axis_names", ())
    if "data" in names and dict(m.shape).get("data", 1) > 1:
        in_specs = tuple([P()] + [P("data", None, None)] * 3
                         + [P()] * 18)
        out_specs = tuple([P("data", None, None)] + [P()] * 14)
        outs = jax.shard_map(_sharded_call, mesh=m, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(
            betas, xp, zhp, up, *mats_x, *mats_z, *tm_x, *tm_z)
    else:
        outs = _call(betas, xp, zhp, up, *mats_x, *mats_z, *tm_x, *tm_z)

    d_x = unpack_reps(outs[0], reps)[:, :c].reshape(B, c, H, W)

    def unpack(gs, data):
        dW1, dW2, dW3s, db1, db2, db3, dbt = gs
        O1, I1 = data["w1"].shape[:2]
        O3, I3 = data["w3"].shape[:2]
        d = {
            "w1": conv3_forward_mat_grad(dW1, O1, I1),
            "w2": dW2[:, :, None, None],
            "w3": conv3_forward_mats_cout_grad(dW3s, O3, I3),
            "b1": db1[:, 0],
            "b2": db2[:, 0],
            "b3": db3[:O3, 0],
            "betas": dbt[:3, 0],
        }
        return d

    d_data_x = unpack(outs[1:8], data_x)
    d_data_z = unpack(outs[8:15], data_z)
    return d_x, d_data_x, d_data_z


def _final_T_in_kernel(shifted, dot, mats, tmats, beta0, beta1, beta2,
                       preact, c8, HW, h, e, acc, sum_fn=jnp.sum):
    """T = <acc, J_g(h) e> for one example: primal forward (for the swish
    slopes) + tangent forward. Returns ``sum_fn(r2 * ta2)`` — the scalar T,
    or per-example (1, reps) sums when lane-packed."""
    m1, m2, m3, b1, b2, b3 = mats
    a0 = _swish(h, beta0) if preact else h
    a0sh = jnp.concatenate(
        [shifted(a0, -dy, -dx) for (dy, dx) in _OFFSETS], axis=0)
    h1 = dot(m1, a0sh) + b1
    h2 = dot(m2, _swish(h1, beta1)) + b2

    ta0 = _dswish(h, beta0) * e if preact else e
    ta0sh = jnp.concatenate(
        [shifted(ta0, -dy, -dx) for (dy, dx) in _OFFSETS], axis=0)
    th1 = dot(m1, ta0sh)
    th2 = dot(m2, _dswish(h1, beta1) * th1)
    ta2 = _dswish(h2, beta2) * th2
    # <acc, C3 ta2> = <C3^T acc, ta2>
    m3t = tmats[0]
    csh = jnp.concatenate(
        [shifted(acc, dy, dx) for (dy, dx) in _OFFSETS], axis=0)
    r2 = dot(m3t, csh)
    return sum_fn(r2 * ta2)


def _final_grads_in_kernel(shifted, dot, mats, tmats, beta0, beta1, beta2,
                           preact, c8, HW, h, e, acc_w):
    """Hand-derived backward of T = <acc, J_g(h) e> w.r.t. the effective
    weights, biases, swish slopes and the input h, with the scalar cotangent
    pre-folded into ``acc_w`` (everything is linear in acc). Tangent chain
    (dotted) + primal chain + double-adjoint with swish'' corrections.
    Returns (d_h, (dW1, dW2, dW3s, db1, db2, dbetas))  — db3 is exactly 0."""
    f32 = jnp.float32
    m1, m2, m3, b1, b2, b3 = mats
    m3t, m2t, m1t = tmats

    # primal forward
    a0 = _swish(h, beta0) if preact else h
    a0sh = jnp.concatenate(
        [shifted(a0, -dy, -dx) for (dy, dx) in _OFFSETS], axis=0)
    h1 = dot(m1, a0sh) + b1
    a1 = _swish(h1, beta1)
    h2 = dot(m2, a1) + b2
    s1, s2 = _dswish(h1, beta1), _dswish(h2, beta2)

    # tangent forward
    ta0 = _dswish(h, beta0) * e if preact else e
    ta0sh = jnp.concatenate(
        [shifted(ta0, -dy, -dx) for (dy, dx) in _OFFSETS], axis=0)
    th1 = dot(m1, ta0sh)
    ta1 = s1 * th1
    th2 = dot(m2, ta1)
    ta2 = s2 * th2

    # adjoints (acc_w carries the loss cotangent)
    csh = jnp.concatenate(
        [shifted(acc_w, dy, dx) for (dy, dx) in _OFFSETS], axis=0)
    r_a2t = dot(m3t, csh)                                # (mid, HW)
    dW3s = _dot_nt(dot, csh, ta2)                        # (9c8, mid)
    rh2 = s2 * r_a2t
    p_h2 = _d2swish(h2, beta2) * th2 * r_a2t
    dbeta2 = jnp.sum(_ddswish_dbeta(h2, beta2) * th2 * r_a2t)
    db2 = jnp.sum(p_h2, axis=1, keepdims=True)
    dW2 = _dot_nt(dot, rh2, ta1) + _dot_nt(dot, p_h2, a1)
    ra1 = dot(m2t, rh2)
    p_a1 = dot(m2t, p_h2)
    rh1 = s1 * ra1
    p_h1 = s1 * p_a1 + _d2swish(h1, beta1) * th1 * ra1
    dbeta1 = jnp.sum(_dswish_dbeta(h1, beta1) * p_a1
                     + _ddswish_dbeta(h1, beta1) * th1 * ra1)
    db1 = jnp.sum(p_h1, axis=1, keepdims=True)
    dW1 = _dot_nt(dot, rh1, ta0sh) + _dot_nt(dot, p_h1, a0sh)

    def back_c1(t):
        R = dot(m1t, t)
        out = jnp.zeros((c8, HW), f32)
        for d, (dy, dx) in enumerate(_OFFSETS):
            out += shifted(R[d * c8:(d + 1) * c8], dy, dx)
        return out

    p_a0 = back_c1(p_h1)
    if preact:
        ra0 = back_c1(rh1)
        d_h = _dswish(h, beta0) * p_a0 + _d2swish(h, beta0) * e * ra0
        dbeta0 = jnp.sum(_dswish_dbeta(h, beta0) * p_a0
                         + _ddswish_dbeta(h, beta0) * e * ra0)
    else:
        d_h = p_a0
        dbeta0 = jnp.zeros((), f32)
    dbetas = jnp.stack([dbeta0, dbeta1, dbeta2])
    return d_h, (dW1, dW2, dW3s, db1, db2, dbetas)


def _final_primal_kernel(betas_ref, x_ref, z_ref, ex_ref, ez_ref,
                         ax_ref, az_ref,
                         m1x_ref, m2x_ref, m3x_ref, b1x_ref, b2x_ref, b3x_ref,
                         m1z_ref, m2z_ref, m3z_ref, b1z_ref, b2z_ref, b3z_ref,
                         m3tx_ref, m2tx_ref, m1tx_ref,
                         m3tz_ref, m2tz_ref, m1tz_ref,
                         t_ref, *, H, W, reps, c8, mid, preact_x, preact_z,
                         mode):
    f32 = jnp.float32
    HW = reps * H * W
    shifted = _make_shifted(H, W, reps)
    dot = _make_dot(mode)
    if reps == 1:
        sum_fn = jnp.sum
        row = lambda v: jnp.broadcast_to(
            jnp.asarray(v, f32).reshape(1, 1), (1, 128))
    else:
        seg_sum, _ = _make_seg(reps, H * W)
        sum_fn = seg_sum
        row = lambda v: jnp.pad(v.astype(f32), ((0, 0), (0, 128 - reps)))
    mats_x = (m1x_ref[:], m2x_ref[:], m3x_ref[:],
              b1x_ref[:], b2x_ref[:], b3x_ref[:])
    mats_z = (m1z_ref[:], m2z_ref[:], m3z_ref[:],
              b1z_ref[:], b2z_ref[:], b3z_ref[:])
    T_x = _final_T_in_kernel(shifted, dot, mats_x,
                             (m3tx_ref[:], m2tx_ref[:], m1tx_ref[:]),
                             betas_ref[0], betas_ref[1], betas_ref[2],
                             preact_x, c8, HW, x_ref[0], ex_ref[0], ax_ref[0],
                             sum_fn)
    T_z = _final_T_in_kernel(shifted, dot, mats_z,
                             (m3tz_ref[:], m2tz_ref[:], m1tz_ref[:]),
                             betas_ref[3], betas_ref[4], betas_ref[5],
                             preact_z, c8, HW, z_ref[0], ez_ref[0], az_ref[0],
                             sum_fn)
    t_ref[0] = jnp.concatenate([row(T_x), row(T_z)]
                               + [jnp.zeros((6, 128), f32)], axis=0)


def _final_bwd_kernel(betas_ref, x_ref, z_ref, ex_ref, ez_ref,
                      ax_ref, az_ref,
                      m1x_ref, m2x_ref, m3x_ref, b1x_ref, b2x_ref, b3x_ref,
                      m1z_ref, m2z_ref, m3z_ref, b1z_ref, b2z_ref, b3z_ref,
                      m3tx_ref, m2tx_ref, m1tx_ref,
                      m3tz_ref, m2tz_ref, m1tz_ref,
                      dx_ref, dz_ref,
                      dW1x_ref, dW2x_ref, dW3x_ref, db1x_ref, db2x_ref, dbx_ref,
                      dW1z_ref, dW2z_ref, dW3z_ref, db1z_ref, db2z_ref, dbz_ref,
                      *, H, W, reps, c8, mid, preact_x, preact_z, mode):
    # The per-example loss cotangents are pre-folded into ax/az XLA-side
    # (everything downstream is linear in acc), so the kernel is
    # cotangent-free and lane-packing needs no per-example scalars.
    f32 = jnp.float32
    HW = reps * H * W
    shifted = _make_shifted(H, W, reps)
    dot = _make_dot(mode)
    from jax.experimental import pallas as pl

    mats_x = (m1x_ref[:], m2x_ref[:], m3x_ref[:],
              b1x_ref[:], b2x_ref[:], b3x_ref[:])
    mats_z = (m1z_ref[:], m2z_ref[:], m3z_ref[:],
              b1z_ref[:], b2z_ref[:], b3z_ref[:])
    d_hx, gx = _final_grads_in_kernel(
        shifted, dot, mats_x, (m3tx_ref[:], m2tx_ref[:], m1tx_ref[:]),
        betas_ref[0], betas_ref[1], betas_ref[2], preact_x, c8, HW,
        x_ref[0], ex_ref[0], ax_ref[0])
    d_hz, gz = _final_grads_in_kernel(
        shifted, dot, mats_z, (m3tz_ref[:], m2tz_ref[:], m1tz_ref[:]),
        betas_ref[3], betas_ref[4], betas_ref[5], preact_z, c8, HW,
        z_ref[0], ez_ref[0], az_ref[0])
    dx_ref[0] = d_hx
    dz_ref[0] = d_hz

    beta_tile = lambda db: jnp.concatenate(
        [jnp.broadcast_to(db[k].reshape(1, 1), (1, 128)) for k in range(3)]
        + [jnp.zeros((5, 128), f32)], axis=0)
    first = pl.program_id(0) == 0
    for outs, grads in (((dW1x_ref, dW2x_ref, dW3x_ref, db1x_ref, db2x_ref,
                          dbx_ref), gx),
                        ((dW1z_ref, dW2z_ref, dW3z_ref, db1z_ref, db2z_ref,
                          dbz_ref), gz)):
        vals = list(grads[:-1]) + [beta_tile(grads[-1])]
        for ref, val in zip(outs, vals):
            @pl.when(first)
            def _(ref=ref, val=val):
                ref[:] = val.astype(f32)

            @pl.when(jnp.logical_not(first))
            def _(ref=ref, val=val):
                ref[:] = ref[:] + val.astype(f32)


@functools.lru_cache(maxsize=64)
def _make_fused_final_pair(c, H, W, mid, preact_x, preact_z, mode, interpret,
                           reps=1):
    """custom_vjp function (T_x, T_z) = (<acc_x, J_gx(x) eps_x>,
    <acc_z, J_gz(z) eps_z>) with a Pallas primal and a hand-derived
    second-order Pallas backward. Grads flow to the effective-weight dicts
    (d w1/w2/w3/b1/b2/b3/betas; b3 is exactly zero) and to x/z; eps and acc
    are treated as constants (they are stop-gradient estimator state)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused_chain import pack_reps, unpack_reps

    HW = H * W
    RHW = reps * HW
    c8 = max(8, -(-c // 8) * 8)

    grad_shapes = [
        jax.ShapeDtypeStruct((mid, 9 * c8), jnp.float32),
        jax.ShapeDtypeStruct((mid, mid), jnp.float32),
        jax.ShapeDtypeStruct((9 * c8, mid), jnp.float32),
        jax.ShapeDtypeStruct((mid, 1), jnp.float32),
        jax.ShapeDtypeStruct((mid, 1), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ]

    def batch_specs(n):
        ex = lambda i, b: (i, 0, 0)
        const2 = lambda r, s: pl.BlockSpec((r, s), lambda i, b: (0, 0))
        specs = [pl.BlockSpec((1, c8, RHW), ex)] * n
        for _ in range(2):
            specs += [const2(mid, 9 * c8), const2(mid, mid),
                      const2(9 * c8, mid),
                      const2(mid, 1), const2(mid, 1), const2(c8, 1)]
        for _ in range(2):
            specs += [const2(mid, 9 * c8), const2(mid, mid),
                      const2(9 * c8, mid)]
        return specs, ex, const2

    def primal_call(betas, xp, zp, exp_, ezp, axp, azp, *mats):
        Bl = xp.shape[0]
        in_specs, ex, _ = batch_specs(6)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(Bl,), in_specs=in_specs,
            out_specs=[pl.BlockSpec((1, 8, 128), ex)])
        kernel = functools.partial(
            _final_primal_kernel, H=H, W=W, reps=reps, c8=c8, mid=mid,
            preact_x=preact_x, preact_z=preact_z, mode=mode)
        [t] = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((Bl, 8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(betas, xp, zp, exp_, ezp, axp, azp, *mats)
        return t

    def bwd_call(betas, xp, zp, exp_, ezp, axp, azp, *mats):
        Bl = xp.shape[0]
        in_specs, ex, const2 = batch_specs(6)
        gspecs = [const2(mid, 9 * c8), const2(mid, mid), const2(9 * c8, mid),
                  const2(mid, 1), const2(mid, 1), const2(8, 128)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(Bl,), in_specs=in_specs,
            out_specs=[pl.BlockSpec((1, c8, RHW), ex)] * 2 + gspecs + gspecs)
        kernel = functools.partial(
            _final_bwd_kernel, H=H, W=W, reps=reps, c8=c8, mid=mid,
            preact_x=preact_x, preact_z=preact_z, mode=mode)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((Bl, c8, RHW), jnp.float32)] * 2
                      + grad_shapes + grad_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(betas, xp, zp, exp_, ezp, axp, azp, *mats)

    def prep_all(data_x, data_z, x, z, eps_x, eps_z, acc_x, acc_z):
        dsx = {k: (jax.lax.stop_gradient(v) if hasattr(v, "dtype") else v)
               for k, v in data_x.items()}
        dsz = {k: (jax.lax.stop_gradient(v) if hasattr(v, "dtype") else v)
               for k, v in data_z.items()}
        mats = (_prep_fwd(dsx, c8) + _prep_fwd(dsz, c8)
                + _prep_jt(dsx, c8, jnp.float32) + _prep_jt(dsz, c8, jnp.float32))
        betas = jnp.concatenate([dsx["betas"], dsz["betas"]]).astype(jnp.float32)
        tens = [pack_reps(_pad_c(a.astype(jnp.float32), c8), reps)
                for a in (x, z, eps_x, eps_z, acc_x, acc_z)]
        return betas, tens, mats

    @jax.custom_vjp
    def fused_final(data_x, data_z, x, z, eps_x, eps_z, acc_x, acc_z):
        betas, tens, mats = prep_all(data_x, data_z, x, z, eps_x, eps_z,
                                     acc_x, acc_z)
        t = _maybe_shard(primal_call, n_batch_leading=6, n_rep_leading=1,
                         n_out=1)(betas, *tens, *mats)
        if reps == 1:
            return t[:, 0, 0], t[:, 1, 0]
        B = t.shape[0] * reps
        return t[:, 0, :reps].reshape(B), t[:, 1, :reps].reshape(B)

    def fwd(data_x, data_z, x, z, eps_x, eps_z, acc_x, acc_z):
        out = fused_final(data_x, data_z, x, z, eps_x, eps_z, acc_x, acc_z)
        return out, (data_x, data_z, x, z, eps_x, eps_z, acc_x, acc_z)

    def bwd(res, cots):
        data_x, data_z, x, z, eps_x, eps_z, acc_x, acc_z = res
        wx, wz = cots
        # Fold the per-example loss cotangents into the accs before packing
        # (everything downstream of acc is linear in it) — the kernel then
        # needs no per-example scalars at all.
        w4 = lambda w: w[:, None, None, None].astype(jnp.float32)
        betas, tens, mats = prep_all(data_x, data_z, x, z, eps_x, eps_z,
                                     acc_x.astype(jnp.float32) * w4(wx),
                                     acc_z.astype(jnp.float32) * w4(wz))

        from jax.sharding import PartitionSpec as P
        from jax.sharding import get_abstract_mesh
        m = get_abstract_mesh()
        names = getattr(m, "axis_names", ())
        if "data" in names and dict(m.shape).get("data", 1) > 1:
            def sharded_bwd(*args):
                os_ = bwd_call(*args)
                return (os_[0], os_[1],
                        *[jax.lax.psum(r, "data") for r in os_[2:]])
            in_specs = tuple([P()] + [P("data", None, None)] * 6 + [P()] * 18)
            out_specs = tuple([P("data", None, None)] * 2 + [P()] * 12)
            outs = jax.shard_map(sharded_bwd, mesh=m, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False)(
                betas, *tens, *mats)
        else:
            outs = bwd_call(betas, *tens, *mats)
        d_x = unpack_reps(outs[0], reps)[:, :c].reshape(x.shape)
        d_z = unpack_reps(outs[1], reps)[:, :c].reshape(z.shape)

        def unpack(gs, data):
            dW1, dW2, dW3s, db1, db2, dbt = gs
            O1, I1 = data["w1"].shape[:2]
            O3, I3 = data["w3"].shape[:2]
            return {
                "w1": conv3_forward_mat_grad(dW1, O1, I1),
                "w2": dW2[:, :, None, None],
                "w3": conv3_forward_mats_cout_grad(dW3s, O3, I3),
                "b1": db1[:, 0],
                "b2": db2[:, 0],
                "b3": jnp.zeros_like(data["b3"]),
                "betas": dbt[:3, 0],
            }

        d_data_x = unpack(outs[2:8], data_x)
        d_data_z = unpack(outs[8:14], data_z)
        return (d_data_x, d_data_z, d_x, d_z,
                jnp.zeros_like(eps_x), jnp.zeros_like(eps_z),
                jnp.zeros_like(acc_x), jnp.zeros_like(acc_z))

    fused_final.defvjp(fwd, bwd)
    return fused_final


def fused_final_pair(data_x, data_z, x, z, eps_x, eps_z, acc_x, acc_z, *,
                     mode="bf16", interpret=False, reps=1):
    """Both nets' differentiable estimator-final terms
    (``ops.logdet.neumann_final`` semantics: T = <J^T acc, eps> = <acc, J eps>)
    as one Pallas primal + one hand-derived second-order Pallas backward.
    ``data_*`` must carry TRACED effective weights (``conv_forward_data`` on
    the live variables) so the soft-normalization pullback happens XLA-side.
    Returns (T_x, T_z) with gradients to data/x/z."""
    B, c, H, W = x.shape
    mid = data_x["w2"].shape[0]
    fn = _make_fused_final_pair(c, H, W, mid, bool(data_x["preact"]),
                                bool(data_z["preact"]), mode, interpret,
                                reps)
    strip = lambda d: {k: v for k, v in d.items() if k != "preact"}
    return fn(strip(data_x), strip(data_z), x, z, eps_x, eps_z, acc_x, acc_z)


def _block_fwd_kernel(betas_ref, sc_ref, n_ref, x_ref, epsx_ref, epsz_ref,
                      m1x_ref, m2x_ref, m3x_ref, b1x_ref, b2x_ref, b3x_ref,
                      m1z_ref, m2z_ref, m3z_ref, b1z_ref, b2z_ref, b3z_ref,
                      m3tx_ref, m2tx_ref, m1tx_ref,
                      m3tz_ref, m2tz_ref, m1tz_ref,
                      z_out_ref, g_out_ref, diag_ref, accx_ref, accz_ref,
                      *scratch, H, W, c8, mid, threshold, eps_i,
                      stall_patience, stall_rtol, stall_guard, newton_init,
                      preact_x, preact_z, warm_start, mode, tail_mode=None,
                      tail_start=None, line_search=False):
    """One example's ENTIRE implicit-block forward compute: the Broyden solve
    (both nets' conv evals in-kernel) followed by BOTH nets' Neumann-chain
    accumulations, with the activation-derivative tensors built from the
    solve's own pre-activation byproducts — they never touch HBM, and the
    XLA-side linearization recompute (``conv_chain_data``) disappears.

    Estimator linearization points: net_x at x (exact, from the embedding
    eval) and net_z at the solver's best iterate z_hat — the XLA path
    linearizes at the re-attached z = z_hat + g(z_hat), which differs by the
    solver tolerance; the difference is orders below the estimator's MC
    noise (and below the bf16 rounding of the chain itself).
    """
    f32 = jnp.float32
    HW = H * W
    shifted = _make_shifted(H, W)
    # chain precision: bf16 in production (matches IMNF_BF16_EST default);
    # full f32 when the solve runs exact (exactness tests)
    cdtype = f32 if mode == "f32" else jnp.bfloat16
    chain_mode = "f32" if mode == "f32" else "bf16"

    x = x_ref[0]
    bx = (betas_ref[0], betas_ref[1], betas_ref[2])
    bz = (betas_ref[3], betas_ref[4], betas_ref[5])
    eval_x = _make_eval(shifted, mode, m1x_ref[:], m2x_ref[:], m3x_ref[:],
                        b1x_ref[:], b2x_ref[:], b3x_ref[:], *bx,
                        preact_x, c8, HW, want_aux=True)
    eval_z = _make_eval(shifted, mode, m1z_ref[:], m2z_ref[:], m3z_ref[:],
                        b1z_ref[:], b2z_ref[:], b3z_ref[:], *bz,
                        preact_z, c8, HW, want_aux=True)

    gx_x, (h1x, h2x) = eval_x(x)
    x_embed = x + gx_x

    def resid(z):
        gz, _ = eval_z(z)
        return x_embed - gz - z

    tail_modes, stage_caps = _norm_ladder(threshold, tail_mode, tail_start)
    tails = []
    for tm in tail_modes:
        def tail(tm=tm):
            # built inside the stage's lax.cond — see _solve_kernel
            eval_x_t = _make_eval(shifted, tm, m1x_ref[:], m2x_ref[:],
                                  m3x_ref[:], b1x_ref[:], b2x_ref[:],
                                  b3x_ref[:], *bx, preact_x, c8, HW)
            eval_z_t = _make_eval(shifted, tm, m1z_ref[:], m2z_ref[:],
                                  m3z_ref[:], b1z_ref[:], b2z_ref[:],
                                  b3z_ref[:], *bz, preact_z, c8, HW)
            xe_t = x + eval_x_t(x)
            return lambda z: xe_t - eval_z_t(z) - z

        tails.append(tail)

    s = _broyden_in_kernel(resid, x if warm_start else jnp.zeros((c8, HW), f32),
                           c8=c8, HW=HW, threshold=threshold, eps_i=eps_i,
                           stall_patience=stall_patience,
                           stall_rtol=stall_rtol, stall_guard=stall_guard,
                           newton_init=newton_init, tails=tails,
                           stage_caps=stage_caps, line_search=line_search,
                           uv_refs=(scratch[0], scratch[1]) if scratch
                           else None)
    # One extra eval at the best iterate for the chain linearization —
    # cheaper than carrying (h1, h2) through the while loop (measured: the
    # bigger carry costs ~2.5 ms/block at 32x32; the eval ~0.7 ms).
    _, (h1z, h2z) = eval_z(s.best_z)

    z_out_ref[0] = s.best_z
    g_out_ref[0] = s.best_gx
    row = lambda v: jnp.broadcast_to(jnp.asarray(v, f32).reshape(1, 1), (1, 128))
    diag_ref[0] = jnp.concatenate([
        row(s.nstep), row(s.best_obj < eps_i), row(s.prot), row(s.best_obj),
        row(s.best_step), row(0.0), row(0.0), row(0.0)], axis=0)

    # ---- Neumann chains (semantics of fused_chain._chain2_kernel) ----
    s0x = _dswish(x, bx[0]) if preact_x else jnp.ones((c8, HW), f32)
    s0z = _dswish(s.best_z, bz[0]) if preact_z else jnp.ones((c8, HW), f32)
    s1x, s2x = _dswish(h1x, bx[1]), _dswish(h2x, bx[2])
    s1z, s2z = _dswish(h1z, bz[1]), _dswish(h2z, bz[2])
    jt_x = _make_apply_jt(shifted, chain_mode, m3tx_ref[:], m2tx_ref[:],
                          m1tx_ref[:], s0x, s1x, s2x, c8, HW)
    jt_z = _make_apply_jt(shifted, chain_mode, m3tz_ref[:], m2tz_ref[:],
                          m1tz_ref[:], s0z, s1z, s2z, c8, HW)

    def body(k, carry):
        ux, uz, ax, az = carry
        ux = jt_x(ux).astype(cdtype)
        uz = jt_z(uz).astype(cdtype)
        c = sc_ref[k]
        return ux, uz, ax + c * ux.astype(f32), az + c * uz.astype(f32)

    ex = epsx_ref[0].astype(cdtype)
    ez = epsz_ref[0].astype(cdtype)
    _, _, accx, accz = jax.lax.fori_loop(
        0, n_ref[0], body, (ex, ez, ex.astype(f32), ez.astype(f32)))
    accx_ref[0] = accx
    accz_ref[0] = accz


def fused_block_forward(x, data_x, data_z, eps_x, eps_z, signed_coeffs,
                        n_power, *, threshold, eps, stall_patience,
                        stall_rtol, stall_guard=None, newton_init=False,
                        warm_start=False, mode="tf32", tail_mode=None,
                        tail_start=None, line_search=False, secant_refs=False,
                        interpret=False):
    """Fused solve + both Neumann-chain accumulations for one implicit block.

    ``eps_x``/``eps_z``: (B, c, H, W) Rademacher probes. ``signed_coeffs``:
    (cap,) roulette coefficients with the (-1)^k sign folded in;
    ``n_power``: traced int32 chain length. Returns
    ``(FusedSolveResult, acc_x, acc_z)`` with accs shaped like x (f32) —
    feed them to the single differentiable VJP exactly as
    ``ops.logdet.neumann_logdet_pair_fused`` does.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, c, H, W = x.shape
    HW = H * W
    c8 = max(8, -(-c // 8) * 8)
    eps_i = float(eps) * ((c * H * W) ** 0.5)

    cdtype = jnp.float32 if mode == "f32" else jnp.bfloat16
    mats_x, mats_z = _prep_fwd(data_x, c8), _prep_fwd(data_z, c8)
    jt_x = _prep_jt(data_x, c8, cdtype)
    jt_z = _prep_jt(data_z, c8, cdtype)
    mid = mats_x[1].shape[0]
    betas = jnp.concatenate([data_x["betas"], data_z["betas"]]).astype(jnp.float32)

    xp = _pad_c(x.astype(jnp.float32), c8)
    exp_ = _pad_c(eps_x.astype(cdtype), c8)
    ezp = _pad_c(eps_z.astype(cdtype), c8)

    def _call(betas, signed, n_arr, xp, exp_, ezp, *mats):
        Bl = xp.shape[0]  # per-shard batch under shard_map
        ex = lambda i, b, sc, n: (i, 0, 0)
        const2 = lambda r, s: pl.BlockSpec((r, s), lambda i, b, sc, n: (0, 0))
        in_specs = [pl.BlockSpec((1, c8, HW), ex),
                    pl.BlockSpec((1, c8, HW), ex),
                    pl.BlockSpec((1, c8, HW), ex)]
        for _ in range(2):
            in_specs += [const2(mid, 9 * c8), const2(mid, mid),
                         const2(9 * c8, mid),
                         const2(mid, 1), const2(mid, 1), const2(c8, 1)]
        for _ in range(2):
            in_specs += [const2(mid, 9 * c8), const2(mid, mid),
                         const2(9 * c8, mid)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(Bl,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((1, c8, HW), ex),
                       pl.BlockSpec((1, c8, HW), ex),
                       pl.BlockSpec((1, 8, 128), ex),
                       pl.BlockSpec((1, c8, HW), ex),
                       pl.BlockSpec((1, c8, HW), ex)],
            scratch_shapes=(
                [pltpu.VMEM((int(threshold) * c8, HW), jnp.float32)] * 2
                if secant_refs else []),
        )
        kernel = functools.partial(
            _block_fwd_kernel, H=H, W=W, c8=c8, mid=mid,
            threshold=int(threshold), eps_i=eps_i,
            stall_patience=stall_patience, stall_rtol=stall_rtol,
            stall_guard=stall_guard, newton_init=newton_init,
            preact_x=bool(data_x["preact"]), preact_z=bool(data_z["preact"]),
            warm_start=bool(warm_start), mode=mode,
            tail_start=(tuple(tail_start)
                        if isinstance(tail_start, (tuple, list))
                        else None if tail_start is None
                        else int(tail_start)),
            tail_mode=(tuple(tail_mode)
                       if isinstance(tail_mode, (tuple, list))
                       else tail_mode),
            line_search=bool(line_search))
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((Bl, c8, HW), jnp.float32),
                       jax.ShapeDtypeStruct((Bl, c8, HW), jnp.float32),
                       jax.ShapeDtypeStruct((Bl, 8, 128), jnp.float32),
                       jax.ShapeDtypeStruct((Bl, c8, HW), jnp.float32),
                       jax.ShapeDtypeStruct((Bl, c8, HW), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )(betas, signed, n_arr, xp, exp_, ezp, *mats)

    z_p, g_p, diag, accx, accz = _maybe_shard(
        _call, n_batch_leading=3, n_rep_leading=3, n_out=5)(
        betas, signed_coeffs.astype(jnp.float32),
        jnp.asarray(n_power, jnp.int32).reshape(1),
        xp, exp_, ezp, *mats_x, *mats_z, *jt_x, *jt_z)

    unpad = lambda a: a[:, :c].reshape(B, c, H, W)
    diag = diag[:, :, 0]
    res = FusedSolveResult(
        result=unpad(z_p), gx=unpad(g_p),
        nstep=diag[:, 0].astype(jnp.int32),
        diff=diag[:, 3],
        prot_break=diag[:, 2] > 0.5,
        converged=diag[:, 1] > 0.5,
    )
    return res, unpad(accx), unpad(accz)


def fused_broyden_solve(x, data_x, data_z, *, threshold, eps,
                        stall_patience, stall_rtol, stall_guard=None,
                        newton_init=False, warm_start=False,
                        mode="tf32", tail_mode=None, tail_start=None,
                        line_search=False, secant_refs=False,
                        interpret=False, reps=1) -> FusedSolveResult:
    """Solve ``z : x + g_x(x) = z + g_z(z)`` for a batch, fully in-kernel.

    Args:
      x: (B, c, H, W) f32 block input.
      data_x / data_z: ``LipschitzNet.conv_forward_data`` dicts for the
        embedding net (evaluated once at ``x``) and the solved net.
      threshold: max Broyden iterations (== rank budget K).
      eps: base tolerance; the per-example tolerance is ``eps * sqrt(D)``
        with D the TRUE (unpadded) dimensionality, matching ``ops.broyden``.
      warm_start: start from x instead of zeros.
      mode: 'tf32' (3-pass bf16 split, matches IMNF_SOLVER_PRECISION default)
        or 'f32'.
      tail_mode / tail_start: precision ladder — run the first phase at
        ``mode`` up to ``tail_start`` iterations, then re-arm still-
        unconverged examples at ``tail_mode`` (typically 'f32') under the
        same shared ``threshold`` budget. Converged examples never pay the
        higher precision (the whole tail sits under a lax.cond).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, c, H, W = x.shape
    HW = H * W
    c8 = max(8, -(-c // 8) * 8)
    D = c * H * W
    eps_i = float(eps) * (D ** 0.5)

    from .fused_chain import pack_reps, unpack_reps

    mats_x, mats_z = _prep_fwd(data_x, c8), _prep_fwd(data_z, c8)
    mid = mats_x[1].shape[0]
    betas = jnp.concatenate([data_x["betas"], data_z["betas"]]).astype(jnp.float32)

    RHW = reps * HW
    xp = pack_reps(_pad_c(x.astype(jnp.float32), c8), reps)

    def _call(betas, xp, *mats):
        Bl = xp.shape[0]  # per-shard packed batch under shard_map
        ex = lambda i, b: (i, 0, 0)
        const2 = lambda r, s: pl.BlockSpec((r, s), lambda i, b: (0, 0))
        in_specs = [pl.BlockSpec((1, c8, RHW), ex)]
        for _ in range(2):
            in_specs += [const2(mid, 9 * c8), const2(mid, mid),
                         const2(9 * c8, mid),
                         const2(mid, 1), const2(mid, 1), const2(c8, 1)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bl,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((1, c8, RHW), ex),
                       pl.BlockSpec((1, c8, RHW), ex),
                       pl.BlockSpec((1, 8, 128), ex)],
            scratch_shapes=(
                [pltpu.VMEM((threshold * c8, RHW), jnp.float32)] * 2
                if (secant_refs and reps == 1) else []),
        )
        kernel = functools.partial(
            _solve_kernel, H=H, W=W, reps=reps, c8=c8, mid=mid,
            threshold=int(threshold),
            eps_i=eps_i, stall_patience=stall_patience, stall_rtol=stall_rtol,
            stall_guard=stall_guard, newton_init=newton_init,
            preact_x=bool(data_x["preact"]), preact_z=bool(data_z["preact"]),
            warm_start=bool(warm_start), mode=mode,
            tail_start=(tuple(tail_start)
                        if isinstance(tail_start, (tuple, list))
                        else None if tail_start is None
                        else int(tail_start)),
            tail_mode=(tuple(tail_mode)
                       if isinstance(tail_mode, (tuple, list))
                       else tail_mode),
            line_search=bool(line_search))
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((Bl, c8, RHW), jnp.float32),
                       jax.ShapeDtypeStruct((Bl, c8, RHW), jnp.float32),
                       jax.ShapeDtypeStruct((Bl, 8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(betas, xp, *mats)

    z_p, g_p, diag = _maybe_shard(_call, n_batch_leading=1, n_rep_leading=1,
                                  n_out=3)(betas, xp, *mats_x, *mats_z)

    unpad = lambda a: unpack_reps(a, reps)[:, :c].reshape(B, c, H, W)
    diag = _unpack_diag(diag, reps)
    return FusedSolveResult(
        result=unpad(z_p), gx=unpad(g_p),
        nstep=diag[:, 0].astype(jnp.int32),
        diff=diag[:, 3],
        prot_break=diag[:, 2] > 0.5,
        converged=diag[:, 1] > 0.5,
    )


def _unpack_diag(diag, reps):
    """(Bg, 8, 128) diag tiles -> (B, 8) per-example rows (lane b of row r is
    example ``g*reps + b``'s quantity when packed; lane 0 when reps == 1)."""
    if reps == 1:
        return diag[:, :, 0]
    Bg = diag.shape[0]
    return diag[:, :, :reps].transpose(0, 2, 1).reshape(Bg * reps, 8)
