"""Capture a jax profiler trace of the CIFAR-recipe train step and print a
duration breakdown by HLO/kernel name groups (no TensorBoard needed: parses
the trace-viewer JSON events).

Usage: python experiments/profile_step.py [outdir]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(outdir):
    import jax
    import jax.numpy as jnp
    import numpy as np
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
    x_u8 = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, size=(batch, 3, size, size), dtype=np.uint8))
    y = jnp.zeros((batch,), jnp.int32)
    key = jax.random.PRNGKey(3)

    def one(k):
        nonlocal params, state, opt_state, shadow
        params, state, opt_state, shadow, m = step(
            params, state, opt_state, shadow, x_u8, y, k, jnp.ones(()))
        return m

    for _ in range(8):
        key, sub = jax.random.split(key)
        m = one(sub)
    _ = float(m["loss"])

    with jax.profiler.trace(outdir):
        for _ in range(3):
            key, sub = jax.random.split(key)
            m = one(sub)
        _ = float(m["loss"])


def analyze(outdir):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # keep complete events on device lanes (XLA ops); group by name heuristics
    groups = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        # device traces have pid names like "/device:TPU:0" in metadata; we
        # filter by tid/pid later — simplest: keep events whose args have a
        # 'run_id' or whose name looks like an HLO op.
        name = e.get("name", "")
        cat = e.get("args", {}).get("group_by", "")
        lane = e.get("pid", -1)
        if not name or name.startswith("$"):
            continue
        groups[(lane, _bucket(name))] += e["dur"]
        total += e["dur"]
    # collapse lanes: report the lane with the largest total (device lane)
    by_lane = defaultdict(float)
    for (lane, b), d in groups.items():
        by_lane[lane] += d
    device_lane = max(by_lane, key=by_lane.get)
    rows = sorted(((d, b) for (lane, b), d in groups.items()
                   if lane == device_lane), reverse=True)
    print(f"trace: {path}\ndevice lane {device_lane}, total {by_lane[device_lane]/1e3:.1f} ms over 3 steps")
    for d, b in rows[:25]:
        print(f"{d/3e3:9.3f} ms/step  {b}")


def _bucket(name):
    n = name.lower()
    for key in ("_solve_kernel", "_backward_kernel", "_chain2_kernel",
                "_chain_kernel", "fused"):
        if key in n:
            return key
    for key in ("conv", "dot", "while", "fusion", "copy", "transpose",
                "reduce", "scatter", "dynamic", "rng", "all-reduce"):
        if key in n:
            return key
    return name.split(".")[0][:40]


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/imnf_trace"
    if os.environ.get("IMNF_PROFILE_ANALYZE_ONLY") != "1":
        capture(outdir)
    analyze(outdir)
