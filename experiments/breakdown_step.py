"""Step-time breakdown on the CIFAR-10 recipe via ablations.

Times the full fused train step under single-knob variants to attribute the
~132 ms/step (batch 64, one v5e chip):

  base   : recipe exact (n-exact-terms 10, adaptive power iteration, bwd 8)
  est2   : n_exact_terms=2  -> series length drop isolates per-VJP-term cost
  pi2    : n_lipschitz_iters=2 -> adaptive power-iteration share
  bwd2   : IMNF_BWD_THRESHOLD=2 -> backward-solve share
  noest  : n_power_series=1 -> almost-no estimator (1 term, biased) share

Usage: python experiments/breakdown_step.py [variant ...]
Prints one JSON line per variant.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},
    "est2": {"n_exact_terms": 2},
    "pi2": {"n_lip_iters": 2},
    "bwd2": {"_env": {"IMNF_BWD_THRESHOLD": "2"}},
    "noest": {"n_power_series": 1},
    # Forward-solve share: cap the Broyden budget (timing attribution only —
    # the solve is left unconverged, so bpd is off).
    "fwd2": {"_env": {"IMNF_FWD_THRESHOLD": "2"}},
    "fwd1": {"_env": {"IMNF_FWD_THRESHOLD": "1"}},
}


def run(name, steps=20, warmup=12):
    cfg = VARIANTS[name]
    for k, v in cfg.get("_env", {}).items():
        os.environ[k] = v

    import jax
    import jax.numpy as jnp
    from implicit_normalizing_flows_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from implicit_normalizing_flows_tpu.training import adam, ema_init, linear_warmup
    from implicit_normalizing_flows_tpu.training.loops import make_image_step
    from implicit_normalizing_flows_tpu.layers import LogitTransform
    from implicit_normalizing_flows_tpu.models import ImplicitFlow

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
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (batch, 3, size, size),
                            minval=0.05, maxval=0.95)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x0)
    variables = jax.jit(model.init_with_batch)(variables, x0, rng=jax.random.PRNGKey(2))
    params, state = variables["params"], variables["state"]
    optimizer = adam(linear_warmup(1e-3, 1000), betas=(0.9, 0.99), grad_clip=1.0)
    opt_state, shadow = optimizer.init(params), ema_init(params)
    step = make_image_step(model, optimizer, im_dim=3, imagesize=size,
                           task="density",
                           n_lipschitz_iters=cfg.get("n_lip_iters"))

    x_u8 = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, size=(batch, 3, size, size), dtype=np.uint8))
    y = jnp.zeros((batch,), jnp.int32)
    key = jax.random.PRNGKey(3)
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
                      "nstep": round(float(m.get("broyden_nstep", -1)), 2)}),
          flush=True)


if __name__ == "__main__":
    run(sys.argv[1])
