"""Capture a device trace of the sustained-regime train step (bench ckpt).

Usage: python experiments/profile_sustained.py [outdir]
Then:  python experiments/parse_trace.py <outdir> 40
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sustained_trace"

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
        n_lipschitz_iters=None, sn_atol=1e-3, sn_rtol=1e-3,
        n_power_series=None, n_dist="poisson",
        kernels="3-1-3", activation_fn="swish", fc_end=False,
        n_exact_terms=10, preact=True,
        neumann_grad=True, grad_in_forward=False, first_resblock=True,
    )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = load_checkpoint(os.path.join(
        here, "experiments/cifar10_long_r4/bench_ckpt.npz"))
    params, state = ck["params"], ck["state"]
    cast = lambda t: jax.tree.map(
        lambda a: np.asarray(a, np.float32)
        if getattr(a, "dtype", None) == np.float16 else a, t)
    params, state = cast(params), cast(state)
    optimizer = adam(linear_warmup(1e-3, 1000), betas=(0.9, 0.99), grad_clip=1.0)
    opt_state, shadow = optimizer.init(params), ema_init(params)
    step = make_image_step(model, optimizer, im_dim=3, imagesize=size,
                           task="density", n_lipschitz_iters=None)
    x_u8 = jnp.asarray(
        _synthetic_structured("bench", batch, 3, size, size, seed=1).x)
    y = jnp.zeros((batch,), jnp.int32)
    key = jax.random.PRNGKey(9)

    def one(params, state, opt_state, shadow, key):
        key, sub = jax.random.split(key)
        params, state, opt_state, shadow, m = step(
            params, state, opt_state, shadow, x_u8, y, sub, jnp.ones(()))
        return params, state, opt_state, shadow, key, m

    for _ in range(8):
        params, state, opt_state, shadow, key, m = one(
            params, state, opt_state, shadow, key)
    _ = float(m["loss"])

    try:
        opts = jax.profiler.ProfileOptions()
        opts.python_tracer_level = 0
        opts.host_tracer_level = 1
        jax.profiler.start_trace(outdir, profiler_options=opts)
    except Exception:
        jax.profiler.start_trace(outdir)
    for _ in range(3):
        params, state, opt_state, shadow, key, m = one(
            params, state, opt_state, shadow, key)
    _ = float(m["loss"])
    jax.profiler.stop_trace()
    print("trace ->", outdir)


if __name__ == "__main__":
    main()
