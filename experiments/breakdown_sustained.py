"""Step-time breakdown in the SUSTAINED regime (round 5).

Same single-knob ablation method as breakdown_step.py, but at the weights of
the committed bench checkpoint (experiments/cifar10_long_r4/bench_ckpt.npz,
epoch 7 of the r4 flagship — nstep ~13-16, the regime that pays long-horizon
wall-clock). Each variant runs in a fresh process (env knobs are captured at
import time by KernelConfig).

  base   : production config (precision ladder on, fused everything)
  fwd2   : IMNF_FWD_THRESHOLD=2  -> forward-solve share
  bwd2   : IMNF_BWD_THRESHOLD=2  -> backward-solve share
  notail : IMNF_SOLVER_TAIL=""   -> ladder tail share
  est2   : n_exact_terms=2       -> estimator chain+VJP share
  pi2    : n_lipschitz_iters=2   -> power-iteration share

Usage: python experiments/breakdown_sustained.py VARIANT
       (or with no args: spawns each variant in a subprocess, collects JSON)
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},
    "fwd2": {"_env": {"IMNF_FWD_THRESHOLD": "2"}},
    "bwd2": {"_env": {"IMNF_BWD_THRESHOLD": "2"}},
    "notail": {"_env": {"IMNF_SOLVER_TAIL": ""}},
    "est2": {"n_exact_terms": 2},
    "pi2": {"n_lip_iters": 2},
    # bf16 head stage: run the first few iterations at single-pass bf16
    # (~1/3 the dot cost of the 3-pass tf32 emulation), then re-arm every
    # lane through the regular ladder. The carried secant factors survive
    # the re-arm, so the cheap head may precondition the tf32 stage — or
    # poison it with bf16-noise secant updates; this measures which.
    "bf16head5": {"_env": {"IMNF_SOLVER_PRECISION": "bfloat16",
                           "IMNF_SOLVER_TAIL": "tf32,tf32x,f32",
                           "IMNF_LADDER_START": "5"}},
    "bf16head8": {"_env": {"IMNF_SOLVER_PRECISION": "bfloat16",
                           "IMNF_SOLVER_TAIL": "tf32,tf32x,f32",
                           "IMNF_LADDER_START": "8"}},
}

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "experiments/cifar10_long_r4/bench_ckpt.npz")


def run(name, steps=20, warmup=8):
    cfg = VARIANTS[name]
    for k, v in cfg.get("_env", {}).items():
        os.environ[k] = v

    import jax
    import jax.numpy as jnp
    from implicit_normalizing_flows_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from implicit_normalizing_flows_tpu.training import adam, ema_init, linear_warmup
    from implicit_normalizing_flows_tpu.training.loops import make_image_step
    from implicit_normalizing_flows_tpu.training.checkpoints import load_checkpoint
    from implicit_normalizing_flows_tpu.layers import LogitTransform
    from implicit_normalizing_flows_tpu.models import ImplicitFlow
    from implicit_normalizing_flows_tpu.data.images import _synthetic_structured

    batch, size = 64, 32
    model = ImplicitFlow(
        input_size=(batch, 3, size, size), n_blocks=[2, 2, 2],
        intermediate_dim=512, factor_out=False, init_layer=LogitTransform(0.05),
        actnorm=True, coeff=0.9, vnorms="2222",
        n_lipschitz_iters=cfg.get("n_lip_iters"), sn_atol=1e-3, sn_rtol=1e-3,
        n_power_series=cfg.get("n_power_series"), n_dist="poisson",
        kernels="3-1-3", activation_fn="swish", fc_end=False,
        n_exact_terms=cfg.get("n_exact_terms", 10), preact=True,
        neumann_grad=True, grad_in_forward=False, first_resblock=True,
    )
    ck = load_checkpoint(CKPT)
    params, state = ck["params"], ck["state"]
    if ck.get("compact_f16"):
        cast = lambda t: jax.tree.map(
            lambda a: np.asarray(a, np.float32)
            if getattr(a, "dtype", None) == np.float16 else a, t)
        params, state = cast(params), cast(state)
    optimizer = adam(linear_warmup(1e-3, 1000), betas=(0.9, 0.99), grad_clip=1.0)
    opt_state, shadow = optimizer.init(params), ema_init(params)
    step = make_image_step(model, optimizer, im_dim=3, imagesize=size,
                           task="density",
                           n_lipschitz_iters=cfg.get("n_lip_iters"))

    x_u8 = jnp.asarray(
        _synthetic_structured("bench", batch, 3, size, size, seed=1).x)
    y = jnp.zeros((batch,), jnp.int32)
    key = jax.random.PRNGKey(9)
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        params, state, opt_state, shadow, m = step(
            params, state, opt_state, shadow, x_u8, y, sub, jnp.ones(()))
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, state, opt_state, shadow, m = step(
            params, state, opt_state, shadow, x_u8, y, sub, jnp.ones(()))
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({"variant": name, "step_ms": round(1000 * dt / steps, 2),
                      "bpd": round(float(m["bpd"]), 4),
                      "nstep": round(float(m.get("broyden_nstep", -1)), 2),
                      "converged": round(float(m.get("broyden_converged", -1)), 3)}),
          flush=True)


def main():
    if len(sys.argv) > 1:
        run(sys.argv[1])
        return
    results = []
    for name in VARIANTS:
        p = subprocess.run([sys.executable, __file__, name],
                           capture_output=True, text=True, timeout=1200)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if line:
            results.append(json.loads(line[-1]))
            print(line[-1], flush=True)
        else:
            print(json.dumps({"variant": name, "error": p.stderr[-400:]}),
                  flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "breakdown_sustained_r5.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
