"""Microbench: attribute the in-kernel fused Broyden solve cost (round 5).

The r4 sustained trace put the two 32x32 fused block solves at ~25 ms each
(~1.8 ms per in-kernel net eval at nstep ~13), ~4x above the tf32 dot
roofline, and blamed the K=72 im2col dots (conv1 contraction / conv3 output
rows under-fill the 128-lane MXU). This bench measures, on the real chip at
the flagship per-block shapes (c=3, 32x32, mid=512, B=64):

  1. the production solve at pinned iteration counts (slope = ms/iter);
  2. a pure-eval kernel (fori_loop of eval_z, no Broyden algebra) to split
     "conv evals" from "secant update" cost;
  3. eval variants: current 3-pass tf32 vs K-packed tf32 (one fat dot with
     hi/lo parts concatenated along the contraction) vs pre-split weights.

Usage: python experiments/fused_solve_microbench.py [--out FILE.json]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from implicit_normalizing_flows_tpu.ops import fused_solve as fs

C, H, W, MID, B = 3, 32, 32, 512, 64
HW = H * W
C8 = 8


def make_data(key, scale=0.35):
    """CIFAR-shaped conv_forward_data dict with contraction-scaled weights."""
    ks = jax.random.split(key, 6)
    w1 = scale * jax.random.normal(ks[0], (MID, C, 3, 3)) / np.sqrt(9 * C)
    w2 = scale * jax.random.normal(ks[1], (MID, MID, 1, 1)) / np.sqrt(MID)
    w3 = scale * jax.random.normal(ks[2], (C, MID, 3, 3)) / np.sqrt(9 * MID)
    return dict(
        w1=w1, w2=w2, w3=w3,
        b1=0.01 * jax.random.normal(ks[3], (MID,)),
        b2=0.01 * jax.random.normal(ks[4], (MID,)),
        b3=0.01 * jax.random.normal(ks[5], (C,)),
        betas=jnp.ones((3,)),
        preact=False,
    )


def timeit(fn, *args, n=8):
    out = fn(*args)  # warmup/compile
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_solve(x, dx, dz, threshold, **kw):
    f = jax.jit(lambda x: fs.fused_broyden_solve(
        x, dx, dz, threshold=threshold, eps=1e-12,
        stall_patience=None, stall_rtol=0.05, stall_guard=None, **kw))
    r = f(x)
    nstep = np.asarray(r.nstep)
    return timeit(lambda: f(x).result, n=6), float(nstep.mean())


# ---------------------------------------------------------------- eval-only
def _eval_only_kernel(betas_ref, x_ref, m1_ref, m2_ref, m3_ref,
                      b1_ref, b2_ref, b3_ref, out_ref, *, H, W, c8,
                      n_iters, mode, variant):
    """fori_loop of n_iters sequential net evals (each consuming the last
    output, so nothing can be hoisted), no solver algebra."""
    shifted = fs._make_shifted(H, W)
    ev = make_eval_variant(variant, mode, shifted,
                           m1_ref[:], m2_ref[:], m3_ref[:],
                           b1_ref[:], b2_ref[:], b3_ref[:],
                           betas_ref[0], betas_ref[1], betas_ref[2],
                           c8, H * W)
    x = x_ref[0]
    out_ref[0] = jax.lax.fori_loop(
        0, n_iters, lambda i, h: x + 0.5 * ev(h), x)


def make_eval_variant(variant, mode, shifted, m1, m2, m3, b1, b2, b3,
                      beta0, beta1, beta2, c8, HW):
    """Variants of _make_eval's body.

    current   — production _make_eval (3 separate dots per tf32 matmul).
    kpack     — tf32 via ONE dot per matmul with the hi/lo parts concatenated
                along the contraction axis: [Whi Whi Wlo] @ [Thi; Tlo; Thi].
                conv1's K goes 72 -> 216 (2 full K-tiles instead of 3 passes
                at 72/128 fill); conv2/conv3 keep their pass counts but fuse
                3 Mosaic dots into 1.
    presplit  — like current but the WEIGHT hi/lo splits hoisted out of the
                loop body (they are loop-invariant; measures whether Mosaic
                already hoists them).
    """
    f32 = jnp.float32
    dn = (((1,), (0,)), ((), ()))

    if variant == "current":
        dot = fs._make_dot(mode)

        def eval_net(h):
            xsh = jnp.concatenate(
                [shifted(h, -dy, -dx) for (dy, dx) in fs._OFFSETS], axis=0)
            h1 = dot(m1, xsh) + b1
            t = fs._swish(h1, beta1)
            h2 = dot(m2, t) + b2
            t = fs._swish(h2, beta2)
            R = dot(m3, t)
            y = jnp.zeros((c8, HW), f32)
            for d, (dy, dx) in enumerate(fs._OFFSETS):
                y += shifted(R[d * c8:(d + 1) * c8], -dy, -dx)
            return y + b3
        return eval_net

    if variant == "presplit":
        splits = [fs._split_hi_lo(m) for m in (m1, m2, m3)]

        def dot_ps(i, t):
            w_hi, w_lo = splits[i]
            t_hi, t_lo = fs._split_hi_lo(t)
            out = jax.lax.dot_general(w_hi, t_hi, dn, preferred_element_type=f32)
            out += jax.lax.dot_general(w_hi, t_lo, dn, preferred_element_type=f32)
            out += jax.lax.dot_general(w_lo, t_hi, dn, preferred_element_type=f32)
            return out

        def eval_net(h):
            xsh = jnp.concatenate(
                [shifted(h, -dy, -dx) for (dy, dx) in fs._OFFSETS], axis=0)
            h1 = dot_ps(0, xsh) + b1
            t = fs._swish(h1, beta1)
            h2 = dot_ps(1, t) + b2
            t = fs._swish(h2, beta2)
            R = dot_ps(2, t)
            y = jnp.zeros((c8, HW), f32)
            for d, (dy, dx) in enumerate(fs._OFFSETS):
                y += shifted(R[d * c8:(d + 1) * c8], -dy, -dx)
            return y + b3
        return eval_net

    if variant == "kpack":
        packs = []
        for m in (m1, m2, m3):
            hi, lo = fs._split_hi_lo(m)
            packs.append(jnp.concatenate([hi, hi, lo], axis=1))  # (M, 3K)

        def dot_kp(i, t):
            t_hi, t_lo = fs._split_hi_lo(t)
            tp = jnp.concatenate([t_hi, t_lo, t_hi], axis=0)      # (3K, N)
            return jax.lax.dot_general(packs[i], tp, dn,
                                       preferred_element_type=f32)

        def eval_net(h):
            xsh = jnp.concatenate(
                [shifted(h, -dy, -dx) for (dy, dx) in fs._OFFSETS], axis=0)
            h1 = dot_kp(0, xsh) + b1
            t = fs._swish(h1, beta1)
            h2 = dot_kp(1, t) + b2
            t = fs._swish(h2, beta2)
            R = dot_kp(2, t)
            y = jnp.zeros((c8, HW), f32)
            for d, (dy, dx) in enumerate(fs._OFFSETS):
                y += shifted(R[d * c8:(d + 1) * c8], -dy, -dx)
            return y + b3
        return eval_net

    raise ValueError(variant)


def bench_eval_only(x, data, n_iters, mode="tf32", variant="current"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mats = fs._prep_fwd(data, C8)
    m1, m2, m3 = mats[0], mats[1], mats[2]
    b1, b2, b3 = mats[3], mats[4], mats[5]
    betas = data["betas"].astype(jnp.float32)
    xp = fs._pad_c(x.astype(jnp.float32), C8)

    def _call(betas, xp, m1, m2, m3, b1, b2, b3):
        ex = lambda i, b: (i, 0, 0)
        const2 = lambda r, s: pl.BlockSpec((r, s), lambda i, b: (0, 0))
        mid = m2.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, C8, HW), ex),
                      const2(mid, 9 * C8), const2(mid, mid),
                      const2(9 * C8, mid),
                      const2(mid, 1), const2(mid, 1), const2(C8, 1)],
            out_specs=pl.BlockSpec((1, C8, HW), ex),
        )
        return pl.pallas_call(
            functools.partial(_eval_only_kernel, H=H, W=W, c8=C8,
                              n_iters=n_iters, mode=mode, variant=variant),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, C8, HW), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(betas, xp, m1, m2, m3, b1, b2, b3)

    f = jax.jit(lambda: _call(betas, xp, m1, m2, m3, b1, b2, b3))
    return timeit(lambda: f(), n=6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="experiments/fused_solve_microbench_r5.json")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    dx = make_data(jax.random.fold_in(key, 1))
    dz = make_data(jax.random.fold_in(key, 2))
    x = 0.5 * jax.random.normal(jax.random.fold_in(key, 3), (B, C, H, W))

    out = {"shapes": dict(C=C, H=H, W=W, MID=MID, B=B),
           "device": str(jax.devices()[0])}

    # 1. production solve, pinned nstep (eps below the tf32 floor)
    for thr in (10, 20):
        t, ns = bench_solve(x, dx, dz, thr, mode="tf32")
        out[f"solve_tf32_thr{thr}_ms"] = t * 1e3
        out[f"solve_tf32_thr{thr}_nstep"] = ns
        print(f"solve tf32 thr={thr}: {t*1e3:.2f} ms (nstep {ns:.1f})")
    slope = (out["solve_tf32_thr20_ms"] - out["solve_tf32_thr10_ms"]) / 10.0
    out["solve_ms_per_iter"] = slope
    print(f"  -> {slope:.3f} ms per solver iteration (B={B})")

    # 2/3. eval-only kernels
    for variant in ("current", "presplit", "kpack"):
        for n_it in (10, 20):
            t = bench_eval_only(x, dx, n_it, mode="tf32", variant=variant)
            out[f"eval_{variant}_n{n_it}_ms"] = t * 1e3
        sl = (out[f"eval_{variant}_n20_ms"] - out[f"eval_{variant}_n10_ms"]) / 10.0
        out[f"eval_{variant}_ms_per_eval"] = sl
        print(f"eval-only [{variant}]: {sl:.3f} ms per eval (B={B})")

    out["note"] = ("kpack parity is asserted in tests/test_fused_solve.py "
                   "once integrated; this bench is timing-only")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
