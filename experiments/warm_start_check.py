"""Warm-vs-cold solver-init bpd-trajectory check on the CIFAR recipe.

Trains the bench config twice from identical init/keys/data for N steps —
IMNF_WARM_START on vs off — and prints both bpd trajectories. The stopping
criterion (eps*sqrt(D)) is identical, so the roots agree to solver
tolerance; this verifies the training trajectories stay bpd-equal.

Usage: python experiments/warm_start_check.py [nsteps]
(runs each arm in a subprocess so the env var takes effect cleanly)
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def arm(nsteps):
    import numpy as np

    import jax
    import jax.numpy as jnp
    from implicit_normalizing_flows_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from implicit_normalizing_flows_tpu.training import adam, ema_init, linear_warmup
    from implicit_normalizing_flows_tpu.training.loops import make_image_step
    from __graft_entry__ import _build

    batch, size = 64, 32
    model = _build([2, 2, 2], 512, size, batch, n_exact_terms=10,
                   coeff=0.9, fc_end=False, n_lip_iters=None, sn_tol=1e-3)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (batch, 3, size, size),
                            minval=0.05, maxval=0.95)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x0)
    variables = jax.jit(model.init_with_batch)(variables, x0, rng=jax.random.PRNGKey(2))
    params, state = variables["params"], variables["state"]
    optimizer = adam(linear_warmup(1e-3, 1000), betas=(0.9, 0.99), grad_clip=1.0)
    opt_state, shadow = optimizer.init(params), ema_init(params)
    step = make_image_step(model, optimizer, im_dim=3, imagesize=size,
                           task="density", n_lipschitz_iters=None)
    rng_np = np.random.RandomState(0)
    key = jax.random.PRNGKey(3)
    traj = []
    for i in range(nsteps):
        x_u8 = jnp.asarray(rng_np.randint(0, 256, size=(batch, 3, size, size),
                                          dtype=np.uint8))
        y = jnp.zeros((batch,), jnp.int32)
        key, sub = jax.random.split(key)
        params, state, opt_state, shadow, m = step(
            params, state, opt_state, shadow, x_u8, y, sub, jnp.ones(()))
        if (i + 1) % 50 == 0 or i == 0:
            traj.append((i + 1, round(float(m["bpd"]), 4),
                         round(float(m.get("broyden_nstep", -1)), 2)))
    print(json.dumps({"warm": os.environ.get("IMNF_WARM_START", "1"),
                      "traj": traj}), flush=True)


if __name__ == "__main__":
    if "--inner" in sys.argv:
        arm(int(sys.argv[-1]))
        sys.exit(0)
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    for ws in ("1", "0"):
        env = dict(os.environ, IMNF_WARM_START=ws)
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--inner", str(nsteps)],
                           env=env, capture_output=True, text=True,
                           timeout=2400)
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(out[-1] if out else f"arm ws={ws} failed: {r.stderr[-800:]}")
