"""Probe (r5): can Mosaic overlap VPU and MXU across two independent eval
chains in one kernel program?

The 32x32 fused-solve iteration is a serial conv1->swish->conv2->swish->conv3
chain: the MXU idles during the (512,1024) sigmoid/hi-lo-split VPU work and
vice versa. Two INDEPENDENT per-example chains in one program give the
scheduler freedom to interleave. Device-trace timed (wall clock over the
axon tunnel is RPC noise).

  single : n_iters sequential evals of one example  (the current shape)
  duo    : n_iters sequential evals of TWO examples, chains independent

If duo << 2x single per iteration, a two-example solve kernel is worth
building; if duo ~= 2x single, Mosaic doesn't interleave and the idea dies.
"""
import functools
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from implicit_normalizing_flows_tpu.ops import fused_solve as fs

C, H, W, MID, B = 3, 32, 32, 512, 64
HW = H * W
C8 = 8


def _eval_kernel(betas_ref, x_ref, m1_ref, m2_ref, m3_ref,
                 b1_ref, b2_ref, b3_ref, out_ref, *, n_iters, duo):
    shifted = fs._make_shifted(H, W)
    ev = fs._make_eval(shifted, "tf32", m1_ref[:], m2_ref[:], m3_ref[:],
                       b1_ref[:], b2_ref[:], b3_ref[:],
                       betas_ref[0], betas_ref[1], betas_ref[2],
                       False, C8, HW)
    if duo:
        xa, xb = x_ref[0], x_ref[1]

        def body(i, hw):
            ha, hb = hw
            return xa + 0.5 * ev(ha), xb + 0.5 * ev(hb)

        ya, yb = jax.lax.fori_loop(0, n_iters, body, (xa, xb))
        out_ref[0], out_ref[1] = ya, yb
    else:
        x = x_ref[0]
        out_ref[0] = jax.lax.fori_loop(
            0, n_iters, lambda i, h: x + 0.5 * ev(h), x)


def run(x, data, n_iters, duo):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mats = fs._prep_fwd(data, C8)
    m1, m2, m3, b1, b2, b3 = mats
    betas = data["betas"].astype(jnp.float32)
    xp = fs._pad_c(x.astype(jnp.float32), C8)
    per = 2 if duo else 1

    def _call(betas, xp, *ms):
        ex = lambda i, b: (i, 0, 0)
        const2 = lambda r, s: pl.BlockSpec((r, s), lambda i, b: (0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // per,),
            in_specs=[pl.BlockSpec((per, C8, HW), ex),
                      const2(MID, 9 * C8), const2(MID, MID),
                      const2(9 * C8, MID),
                      const2(MID, 1), const2(MID, 1), const2(C8, 1)],
            out_specs=pl.BlockSpec((per, C8, HW), ex),
        )
        return pl.pallas_call(
            functools.partial(_eval_kernel, n_iters=n_iters, duo=duo),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, C8, HW), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(betas, xp, *ms)

    f = jax.jit(lambda: _call(betas, xp, m1, m2, m3, b1, b2, b3))
    f().block_until_ready()
    td = f"/tmp/duo_trace_{n_iters}_{duo}"
    shutil.rmtree(td, ignore_errors=True)
    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 0
    jax.profiler.start_trace(td, profiler_options=opts)
    for _ in range(6):
        f().block_until_ready()
    jax.profiler.stop_trace()
    from experiments.solve_lab import _device_ms
    return _device_ms(td) / 6


def main():
    key = jax.random.PRNGKey(0)
    from experiments.fused_solve_microbench import make_data
    data = make_data(jax.random.fold_in(key, 1))
    x = 0.5 * jax.random.normal(jax.random.fold_in(key, 3), (B, C, H, W))

    out = {}
    for duo in (False, True):
        t10 = run(x, data, 10, duo)
        t20 = run(x, data, 20, duo)
        slope = (t20 - t10) / 10.0  # ms per iteration, whole batch B=64
        tag = "duo" if duo else "single"
        out[f"{tag}_n10_ms"] = t10
        out[f"{tag}_n20_ms"] = t20
        out[f"{tag}_ms_per_iter_batch"] = slope
        print(f"{tag}: n10 {t10:.2f} n20 {t20:.2f} -> "
              f"{slope:.3f} ms/iter (batch {B})", flush=True)
    r = out["duo_ms_per_iter_batch"] / out["single_ms_per_iter_batch"]
    out["duo_over_single"] = r
    print(f"duo/single per-iteration ratio: {r:.3f} "
          f"(1.0 = perfect overlap at equal grid, lower is better)")
    with open("experiments/duo_probe_r5.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
