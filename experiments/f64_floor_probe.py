"""Decisive follow-up to the sigma audit (r4 verdict #2): is the epoch-13
strict-convergence failure conditioning, or the f32 arithmetic floor?

The audit (sigma_audit_r5.json) found every layer's TRUE sigma exceeds the
power-iteration estimate by 3-11% (all checkpoints, including init), but the
per-net products stay <= 0.81 < 1 — the solve map remains a genuine
contraction even under the underestimation. A 0.81-contraction converges to
ANY tolerance in exact arithmetic (0.81^120 ~ 1e-11), so the r4 hard-regime
lab's budget-120 f32 "truth" solve failing strictly on 50% of examples can
only be an arithmetic floor: the residual cannot be EVALUATED below the f32
rounding of the net's internal magnitudes, which sits right at
eps*sqrt(D) = 5.5e-5 once the raw sigmas (and hence pre-normalization
activation scales) have grown 8 -> 20.

Proof: solve the SAME epoch-13 block residuals in float64 on CPU. If f64
converges strictly where f32 cannot, the regime is floor-limited — no sigma
hardening or solver policy can change it (and none is needed: production bpd
error vs truth is ~1e-4 bits/dim, hard_regime_r4.json) — and the honest name
for the r4 "conditioning-limited" label is "f32-floor-limited".

Usage: JAX_PLATFORMS=cpu python experiments/f64_floor_probe.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(HERE, "experiments/cifar10_long_r4/checkpt-0013.pkl")
BATCH = 16


def capture_first_block(dtype):
    """(x, data_x, data_z) of the FIRST 32x32 block at the checkpoint, by
    spying the solver call during a CPU forward on a structured batch."""
    from implicit_normalizing_flows_tpu.training.checkpoints import load_checkpoint
    from implicit_normalizing_flows_tpu.layers import LogitTransform
    from implicit_normalizing_flows_tpu.models import ImplicitFlow
    from implicit_normalizing_flows_tpu.data.images import _synthetic_structured
    import importlib
    import sys as _sys
    importlib.import_module("implicit_normalizing_flows_tpu.ops.broyden")
    # ops/__init__ re-exports the FUNCTION under the submodule's name, so
    # `import ...ops.broyden as m` binds the function; take the module
    ob_mod = _sys.modules["implicit_normalizing_flows_tpu.ops.broyden"]

    size = 32
    model = ImplicitFlow(
        input_size=(BATCH, 3, size, size), n_blocks=[2, 2, 2],
        intermediate_dim=512, factor_out=False, init_layer=LogitTransform(0.05),
        actnorm=True, coeff=0.9, vnorms="2222",
        n_lipschitz_iters=None, sn_atol=1e-3, sn_rtol=1e-3,
        n_power_series=None, n_dist="poisson",
        kernels="3-1-3", activation_fn="swish", fc_end=False,
        n_exact_terms=10, preact=True,
        neumann_grad=True, grad_in_forward=False, first_resblock=True,
    )
    ck = load_checkpoint(CKPT)
    params, state = ck["model"]["params"] if "model" in ck else ck["params"], \
        ck["model"]["state"] if "model" in ck else ck["state"]
    cast = lambda t: jax.tree.map(
        lambda a: np.asarray(a, dtype)
        if getattr(a, "dtype", None) in (np.float16, np.float32, np.float64)
        else a, t)
    params, state = cast(params), cast(state)
    x_u8 = jnp.asarray(
        _synthetic_structured("bench", BATCH, 3, size, size, seed=7).x)
    x = (x_u8.astype(dtype) + 0.5) / 256.0

    captured = []
    # the XLA forward path goes through ops.broyden.root_solve, which looks
    # up `broyden` as a module global — patch it at the module level
    orig = ob_mod.broyden

    def spy(g, x0, threshold, eps, **kw):
        captured.append((np.asarray(x0), g, float(eps), kw))
        return orig(g, x0, threshold, eps, **kw)

    ob_mod.broyden = spy
    try:
        model.forward({"params": params, "state": state}, x,
                      rng=jax.random.PRNGKey(1), train=True)
    finally:
        ob_mod.broyden = orig
    return captured


def main():
    from implicit_normalizing_flows_tpu.ops.broyden import broyden

    out = {"ckpt": os.path.relpath(CKPT, HERE), "batch": BATCH,
           "budget": 120, "blocks": []}
    for tag, dt in (("f32", np.float32), ("f64", np.float64)):
        # capture per dtype: lax convs demand matching operand dtypes, so
        # the whole model (weights AND iterates) runs at dt — the SAME
        # residual maps, evaluated at two precisions
        solves = capture_first_block(dt)
        print(f"[{tag}] captured {len(solves)} block solves", flush=True)
        for bi, (x0, g_fn, eps, kw) in enumerate(solves):
            D = x0.shape[1]
            eps_i = eps * np.sqrt(D)
            res = broyden(g_fn, jnp.asarray(x0, dt),
                          threshold=120, eps=eps, stall_patience=None,
                          newton_init=kw.get("newton_init", True))
            diff = np.asarray(res.diff, np.float64)
            row = {
                "block": bi, "dtype": tag, "eps_i": eps_i,
                "strict_converged": float(np.mean(diff < eps_i)),
                "median_best_obj_over_eps_i": float(np.median(diff) / eps_i),
                "max_best_obj_over_eps_i": float(np.max(diff) / eps_i),
                "nstep": int(res.nstep),
            }
            out["blocks"].append(row)
            print(f"  block {bi} [{tag}]: strict {row['strict_converged']:.3f}"
                  f", median obj/eps {row['median_best_obj_over_eps_i']:.2f},"
                  f" max {row['max_best_obj_over_eps_i']:.2f},"
                  f" nstep {row['nstep']}", flush=True)

    worst32 = min(r["strict_converged"] for r in out["blocks"]
                  if r["dtype"] == "f32")
    worst64 = min(r["strict_converged"] for r in out["blocks"]
                  if r["dtype"] == "f64")
    out["worst_block_strict_f32"] = worst32
    out["worst_block_strict_f64"] = worst64
    out["floor_proven"] = worst64 >= 0.99 and worst32 < 0.9
    with open(os.path.join(HERE, "experiments/f64_floor_probe_r5.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("floor_proven:", out["floor_proven"])


if __name__ == "__main__":
    main()
