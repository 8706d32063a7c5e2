"""Estimator VJP-chain: autodiff vs hand-written transposed convs.

The Neumann/basic estimators apply u <- u J repeatedly through the residual
net (3x3 c->512, swish, 1x1 512->512, swish, 3x3 512->c). Per application
jax.vjp costs ~1.9 ms bf16 on v5e — ~5x over the HBM bound. This checks
whether the autodiff graph is the problem by timing the same linear map
written manually: cotangent conv = conv with spatially-flipped,
io-swapped kernels; swish' factors precomputed once at the linearization
point.

All timing inside ONE jitted program (lax.fori_loop) — a single tunnel RPC.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

B, H, W, CIN, CMID = 64, 32, 32, 3, 512
N_APPS = 24


def conv(x, w, dn=("NCHW", "OIHW", "NCHW")):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME", dimension_numbers=dn)


def swish(x):
    return x * jax.nn.sigmoid(x) / 1.1


def dswish(x):
    s = jax.nn.sigmoid(x)
    return (s + x * s * (1 - s)) / 1.1


def rot(w):
    # OIHW cotangent kernel: flip H/W, swap O<->I
    return jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)


def main():
    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    w1 = jax.random.normal(ks[0], (CMID, CIN, 3, 3), dtype) * 0.05
    w2 = jax.random.normal(ks[1], (CMID, CMID, 1, 1), dtype) * 0.02
    w3 = jax.random.normal(ks[2], (CIN, CMID, 3, 3), dtype) * 0.02
    x = jax.random.normal(ks[3], (B, CIN, H, W), dtype)

    def net(xx):
        h1 = conv(xx, w1)
        a1 = swish(h1)
        h2 = conv(a1, w2)
        a2 = swish(h2)
        return conv(a2, w3)

    @jax.jit
    def vjp_chain(x):
        with jax.default_matmul_precision("bfloat16"):
            y, vjp = jax.vjp(net, x)
            u = jax.lax.fori_loop(0, N_APPS, lambda i, u: vjp(u)[0], y)
            return jnp.sum(u.astype(jnp.float32))

    @jax.jit
    def manual_chain(x):
        with jax.default_matmul_precision("bfloat16"):
            h1 = conv(x, w1)
            s1 = dswish(h1)
            h2 = conv(swish(h1), w2)
            s2 = dswish(h2)
            y = conv(swish(h2), w3)
            r3, r2, r1 = rot(w3), rot(w2), rot(w1)

            def app(i, u):
                t2 = conv(u, r3) * s2
                t1 = conv(t2, r2) * s1
                return conv(t1, r1)

            u = jax.lax.fori_loop(0, N_APPS, app, y)
            return jnp.sum(u.astype(jnp.float32))

    @jax.jit
    def jvp_chain(x):
        # forward-mode: u <- J u via jax.linearize (plain forward convs)
        with jax.default_matmul_precision("bfloat16"):
            y, f_lin = jax.linearize(net, x)
            u = jax.lax.fori_loop(0, N_APPS, lambda i, u: f_lin(u), y)
            return jnp.sum(u.astype(jnp.float32))

    @jax.jit
    def manual_jvp_chain(x):
        with jax.default_matmul_precision("bfloat16"):
            h1 = conv(x, w1)
            s1 = dswish(h1)
            h2 = conv(swish(h1), w2)
            s2 = dswish(h2)
            y = conv(swish(h2), w3)

            def app(i, u):
                t1 = conv(u, w1) * s1
                t2 = conv(t1, w2) * s2
                return conv(t2, w3)

            u = jax.lax.fori_loop(0, N_APPS, app, y)
            return jnp.sum(u.astype(jnp.float32))

    for name, fn in (("vjp", vjp_chain), ("manual", manual_chain),
                     ("jvp", jvp_chain), ("manual_jvp", manual_jvp_chain)):
        s = float(fn(x))  # compile+run
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            s = float(fn(x))
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"chain": name, "n_apps": N_APPS,
                          "total_ms": round(1000 * dt, 2),
                          "per_app_ms": round(1000 * dt / N_APPS, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
