"""Solve lab (round 5): time the production fused Broyden solves in isolation.

Captures the EXACT (x, data_x, data_z) inputs of every fused forward solve in
one sustained-regime forward pass (eager capture via monkeypatch on the bench
checkpoint + bench batch), then times each 32x32 solve standalone under
production solver args and under variants. This is the honest A/B harness for
kernel work: driver steps cost ~4 min per datapoint and mix in 60+ ms of
non-solve work; this isolates the 44 ms that VERDICT r4 item 1 targets.

Usage: python experiments/solve_lab.py [--variants v1,v2,...]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture_solves():
    import jax
    import jax.numpy as jnp
    from implicit_normalizing_flows_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from implicit_normalizing_flows_tpu.training.checkpoints import load_checkpoint
    from implicit_normalizing_flows_tpu.layers import LogitTransform
    from implicit_normalizing_flows_tpu.models import ImplicitFlow
    from implicit_normalizing_flows_tpu.data.images import _synthetic_structured
    from implicit_normalizing_flows_tpu.ops import fused_solve as fs

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
    cast = lambda t: jax.tree.map(
        lambda a: np.asarray(a, np.float32)
        if getattr(a, "dtype", None) == np.float16 else a, t)
    params, state = cast(ck["params"]), cast(ck["state"])
    x_u8 = jnp.asarray(
        _synthetic_structured("bench", batch, 3, size, size, seed=1).x)
    x = (x_u8.astype(jnp.float32) + jax.random.uniform(
        jax.random.PRNGKey(0), x_u8.shape)) / 256.0

    captured = []
    orig = fs.fused_broyden_solve

    def spy(xs, data_x, data_z, **kw):
        captured.append((np.asarray(xs),
                         jax.tree.map(np.asarray, dict(data_x)),
                         jax.tree.map(np.asarray, dict(data_z)),
                         {k: v for k, v in kw.items()
                          if k not in ("interpret",)}))
        return orig(xs, data_x, data_z, **kw)

    fs.fused_broyden_solve = spy
    try:  # eager forward (capture needs concrete arrays)
        variables = {"params": params, "state": state}
        model.forward(variables, x, rng=jax.random.PRNGKey(1), train=True)
    finally:
        fs.fused_broyden_solve = orig
    return captured


def _device_ms(trace_dir):
    """Sum TPU device-op time in a profiler trace (parse_trace.py logic)."""
    import collections
    import glob
    import gzip

    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {trace_dir}"
    d = json.load(gzip.open(paths[-1]))
    events = d["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e["pid"], ""):
            continue
        if e["name"].startswith("jit_") or len(e["name"]) <= 3:
            continue  # parent/module events double-count their children
        total += e["dur"]
    return total / 1000.0


_trace_seq = [0]


def time_solve(x, data_x, data_z, kw, n=10):
    """Device-trace timing: wall clock over the axon tunnel carries tens of
    ms of load-dependent RPC overhead per dispatch (r3 notes), so the solve
    is timed by summing TPU device-op time over n traced executions."""
    import shutil

    import jax
    from implicit_normalizing_flows_tpu.ops import fused_solve as fs

    f = jax.jit(lambda x: fs.fused_broyden_solve(x, data_x, data_z, **kw))
    r = f(x)
    r.result.block_until_ready()
    nstep = float(np.asarray(r.nstep).mean())
    conv = float(np.asarray(r.converged).mean())
    _trace_seq[0] += 1
    td = f"/tmp/solve_lab_trace_{_trace_seq[0]}"
    shutil.rmtree(td, ignore_errors=True)
    try:
        opts = jax.profiler.ProfileOptions()
        opts.python_tracer_level = 0
        opts.host_tracer_level = 1
        jax.profiler.start_trace(td, profiler_options=opts)
    except Exception:
        jax.profiler.start_trace(td)
    for _ in range(n):
        f(x).result.block_until_ready()
    jax.profiler.stop_trace()
    return _device_ms(td) / n, nstep, conv


VARIANTS = {
    "prod": {},                                       # as captured
    "notail": {"tail_mode": None, "tail_start": None},
    "tail_tf32x": {"tail_mode": "tf32x"},
    "refs": {"secant_refs": True},
    "norefs": {"secant_refs": False},
    "f32": {"mode": "f32", "tail_mode": None, "tail_start": None},
    "multi": {"tail_mode": ("tf32x", "f32"), "tail_start": (15, 22)},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="prod,notail,tail_tf32x,refs,f32")
    ap.add_argument("--out", default="experiments/solve_lab_r5.json")
    ap.add_argument("--reps-filter", type=int, default=1,
                    help="only time solves with this reps (1 = the 32x32/16x16)")
    args = ap.parse_args()

    solves = capture_solves()
    print(f"captured {len(solves)} fused forward solves")
    out = []
    for i, (x, dx, dz, kw) in enumerate(solves):
        if kw.get("reps", 1) != args.reps_filter:
            print(f"solve {i}: shape {x.shape} reps={kw.get('reps')} (skipped)")
            continue
        row = {"solve": i, "shape": list(x.shape), "kw_prod": {
            k: v for k, v in kw.items() if not hasattr(v, "shape")}}
        for name in args.variants.split(","):
            kv = dict(kw)
            kv.update(VARIANTS[name])
            ms, nstep, conv = time_solve(x, dx, dz, kv)
            row[name] = {"ms": round(ms, 2), "nstep": round(nstep, 2),
                         "converged": round(conv, 3)}
            print(f"solve {i} {x.shape} [{name}]: {ms:.2f} ms "
                  f"nstep {nstep:.1f} conv {conv:.2f}", flush=True)
        out.append(row)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
