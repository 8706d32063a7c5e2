"""Backward implicit-gradient solve budget sweep (CIFAR-10 recipe shapes).

For budgets {2, 4, 8} vs the 30-iteration truth: cosine similarity and
relative L2 error of the FULL train-step parameter gradient on a fixed batch
with a fixed rng (same probes / roulette draw, so differences isolate the
backward-solve truncation). The round-1 default of 8 was chosen at
cos 0.99999988 / rel 4.8e-4; this re-runs the sweep with the fused estimator
chain in place to see whether a lower budget stays in the same noise floor.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def grads_at_budget(budget):
    os.environ["IMNF_BWD_THRESHOLD"] = str(budget)
    import importlib

    import jax
    import jax.numpy as jnp

    # model rebuild picks up the env at block construction
    from implicit_normalizing_flows_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import __graft_entry__ as ge
    importlib.reload(ge)
    from implicit_normalizing_flows_tpu.training.loops import (
        add_padding, dequantize, standard_normal_logprob)

    batch, size = 64, 32
    model = ge._build([2, 2, 2], 512, size, batch)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (batch, 3, size, size),
                            minval=0.05, maxval=0.95)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x0)
    variables = jax.jit(model.init_with_batch)(variables, x0,
                                               rng=jax.random.PRNGKey(2))
    params, state = variables["params"], variables["state"]

    x_u8 = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, size=(batch, 3, size, size), dtype=np.uint8))

    import math

    def loss_fn(params):
        k_noise, k_fwd = jax.random.split(jax.random.PRNGKey(7))
        x = dequantize(x_u8, k_noise)
        z, dlogp, _ = model.forward({"params": params, "state": state}, x,
                                    jnp.zeros((batch,)), rng=k_fwd, train=True)
        logpz = standard_normal_logprob(z)
        logpx = logpz - dlogp - math.log(256) * 3072
        return -jnp.mean(logpx) / 3072 / math.log(2)

    g = jax.jit(jax.grad(loss_fn))(params)
    flat = jnp.concatenate([a.reshape(-1).astype(jnp.float64)
                            if False else a.reshape(-1)
                            for a in jax.tree.leaves(g)])
    return np.asarray(flat, np.float64)


def main():
    budgets = [int(b) for b in (sys.argv[1:] or ["30", "8", "4", "2"])]
    truth = None
    for b in budgets:
        g = grads_at_budget(b)
        if truth is None:
            truth = g
            print(json.dumps({"budget": b, "role": "truth",
                              "norm": float(np.linalg.norm(g))}), flush=True)
            continue
        cos = float(np.dot(g, truth) /
                    (np.linalg.norm(g) * np.linalg.norm(truth)))
        rel = float(np.linalg.norm(g - truth) / np.linalg.norm(truth))
        print(json.dumps({"budget": b, "cos": round(cos, 8),
                          "rel_err": round(rel, 6)}), flush=True)


if __name__ == "__main__":
    main()
