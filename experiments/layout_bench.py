"""NCHW vs NHWC conv-stack microbenchmark on the TPU chip.

The framework keeps the reference's channels-first (B, C, H, W) tensor
convention. XLA:TPU relayouts convolutions internally, but if an explicit
channels-last program is materially faster end-to-end, an internal NHWC data
path would be worth the refactor. This times the recipe's residual-net conv
stack (3x3 c->512, 1x1 512->512, 3x3 512->c, swish between) forward and
forward+VJP in both layouts at tf32 and bf16.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


def make_stack(layout, dtype):
    if layout == "NCHW":
        dn = ("NCHW", "OIHW", "NCHW")
    else:
        dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME", dimension_numbers=dn)

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 3)
    if layout == "NCHW":
        ws = [jax.random.normal(ks[0], (512, 3, 3, 3), dtype) * 0.05,
              jax.random.normal(ks[1], (512, 512, 1, 1), dtype) * 0.02,
              jax.random.normal(ks[2], (3, 512, 3, 3), dtype) * 0.02]
        x = jax.random.normal(k, (64, 3, 32, 32), dtype)
    else:
        ws = [jax.random.normal(ks[0], (3, 3, 3, 512), dtype) * 0.05,
              jax.random.normal(ks[1], (1, 1, 512, 512), dtype) * 0.02,
              jax.random.normal(ks[2], (3, 3, 512, 3), dtype) * 0.02]
        x = jax.random.normal(k, (64, 32, 32, 3), dtype)

    def net(x, ws):
        h = conv(x, ws[0])
        h = jax.nn.swish(h)
        h = conv(h, ws[1])
        h = jax.nn.swish(h)
        return conv(h, ws[2])

    return net, x, ws


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    # hard sync through a materialised scalar (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = time.perf_counter() - t0
    assert s == s
    return 1000 * dt / iters


def main():
    prec = sys.argv[1] if len(sys.argv) > 1 else "tensorfloat32"
    dtype = jnp.bfloat16 if prec == "bf16" else jnp.float32
    mm = "bfloat16" if prec == "bf16" else prec
    for layout in ("NCHW", "NHWC"):
        net, x, ws = make_stack(layout, dtype)

        @jax.jit
        def fwd(x, ws):
            with jax.default_matmul_precision(mm):
                return net(x, ws)

        @jax.jit
        def fwd_vjp_chain(x, ws, n=12):
            # n repeated VJP applications at one linearization point — the
            # estimator chain shape
            with jax.default_matmul_precision(mm):
                y, vjp = jax.vjp(lambda xx: net(xx, ws), x)
                def body(i, u):
                    return vjp(u)[0]
                return jax.lax.fori_loop(0, n, body, y)

        t_f = timeit(fwd, x, ws)
        t_c = timeit(fwd_vjp_chain, x, ws)
        print(json.dumps({"layout": layout, "precision": prec,
                          "fwd_ms": round(t_f, 3),
                          "vjp_chain12_ms": round(t_c, 3)}), flush=True)


if __name__ == "__main__":
    main()
