"""Fused Neumann-chain kernel vs XLA vjp while_loop on the real chip.

Production shapes: mid=512, (c, H, W) in {(3,32,32), (12,16,16), (48,8,8)},
B=64, bf16 chain, n_power=12.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from implicit_normalizing_flows_tpu.ops.fused_chain import (
    conv1x1_transpose_mat,
    conv3_transpose_mats,
    conv3_transpose_mats_cout,
    fused_neumann_chain,
)

B, MID, NPOW, CAP = 64, 512, 12, 34


def run(c, H, W):
    bf = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    w1 = (jax.random.normal(ks[0], (MID, c, 3, 3)) * 0.2).astype(bf)
    w2 = (jax.random.normal(ks[1], (MID, MID, 1, 1)) * 0.1).astype(bf)
    w3 = (jax.random.normal(ks[2], (c, MID, 3, 3)) * 0.2).astype(bf)
    x = jax.random.normal(ks[3], (B, c, H, W)).astype(bf)
    eps = jax.random.normal(ks[4], (B, c, H, W)).astype(bf)
    s0 = jax.nn.sigmoid(jax.random.normal(ks[5], (B, c, H, W))).astype(bf)
    s1 = jax.nn.sigmoid(jax.random.normal(ks[6], (B, MID, H, W))).astype(bf)
    s2 = jax.nn.sigmoid(jax.random.normal(ks[7], (B, MID, H, W))).astype(bf)
    coeffs = jnp.linspace(1.0, 0.2, CAP)
    kk = jnp.arange(1, CAP + 1)
    signed = jnp.where(kk % 2 == 0, 1.0, -1.0) * coeffs

    c8 = max(8, -(-c // 8) * 8)
    pad = lambda a: jnp.pad(a, ((0, 0), (0, c8 - c), (0, 0), (0, 0)))
    flat = lambda a: a.reshape(a.shape[0], a.shape[1], H * W)
    m3 = conv3_transpose_mats(w3, c8)
    m2 = conv1x1_transpose_mat(w2)
    m1 = conv3_transpose_mats_cout(w1, c8)
    epsf, s0f, s1f, s2f = flat(pad(eps)), flat(pad(s0)), flat(s1), flat(s2)

    @jax.jit
    def fused(epsf, s0f, s1f, s2f, n):
        return fused_neumann_chain(epsf, s0f, s1f, s2f, m3, m2, m1, signed, n,
                                   H=H, W=W)

    def conv(a, w):
        return jax.lax.conv_general_dilated(
            a, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))

    @jax.jit
    def xla_chain(eps, s0, s1, s2, n):
        with jax.default_matmul_precision("bfloat16"):
            def JT(u):
                t = conv(u, jnp.flip(w3, (2, 3)).transpose(1, 0, 2, 3)) * s2
                t = conv(t, w2.transpose(1, 0, 2, 3)) * s1
                return conv(t, jnp.flip(w1, (2, 3)).transpose(1, 0, 2, 3)) * s0

            def body(carry):
                k, u, acc = carry
                u = JT(u)
                return k + 1, u, acc + signed[k - 1] * u.astype(jnp.float32)

            _, _, acc = jax.lax.while_loop(
                lambda cr: cr[0] <= n, body,
                (jnp.ones((), jnp.int32), eps, eps.astype(jnp.float32)))
            return acc

    from implicit_normalizing_flows_tpu.ops.fused_chain import fused_neumann_chain2

    chain_tuple = (epsf, s0f, s1f, s2f, m3, m2, m1)

    @jax.jit
    def fused2(epsf, s0f, s1f, s2f, n):
        ct = (epsf, s0f, s1f, s2f, m3, m2, m1)
        ax, az = fused_neumann_chain2(ct, chain_tuple, signed, n, H=H, W=W)
        return ax + az

    @jax.jit
    def xla2(eps, s0, s1, s2, n):
        return xla_chain(eps, s0, s1, s2, n) + xla_chain(eps + 1.0, s0, s1, s2, n)

    n = jnp.asarray(NPOW, jnp.int32)
    out = {}
    for name, fn, args in (("fused", fused, (epsf, s0f, s1f, s2f, n)),
                           ("xla", xla_chain, (eps, s0, s1, s2, n)),
                           ("fused2", fused2, (epsf, s0f, s1f, s2f, n)),
                           ("xla2", xla2, (eps, s0, s1, s2, n))):
        r = fn(*args)
        _ = float(jnp.sum(r))
        t0 = time.perf_counter()
        reps = 10
        for _i in range(reps):
            r = fn(*args)
        _ = float(jnp.sum(r))
        out[name] = round(1000 * (time.perf_counter() - t0) / reps, 3)
    print(json.dumps({"shape": [c, H, W], "n_power": NPOW, **out,
                      "speedup": round(out["xla"] / out["fused"], 2),
                      "speedup2": round(out["xla2"] / out["fused2"], 2)}),
          flush=True)


if __name__ == "__main__":
    for c, H, W in ((3, 32, 32), (12, 16, 16), (48, 8, 8)):
        run(c, H, W)
