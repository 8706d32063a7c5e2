"""Throughput bench: CIFAR-10 recipe training samples/s on the local device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "samples/s", "vs_baseline": N}

Config matches ``run_cifar10.sh`` (nblocks 2-2-2, idim 512, swish, kernels
3-1-3, vnorms 2222, coeff 0.9, n-exact-terms 10, preact, fc-end False, batch
64, Adam beta(0.9,0.99), warmup, clip 1.0, EMA 0.999) on synthetic
CIFAR-shaped uint8 data (the dataset is not downloadable in a zero-egress
image; dequantisation noise makes the compute identical).

``vs_baseline``: the reference publishes no numbers (BASELINE.md). We pin an
estimated reference GPU throughput of 20 samples/s (batch 64 at ~3.2 s/step
for the same recipe on a V100-class GPU — implicit flows are solver-dominated
and train for days in the paper's setting). This constant is an estimate, not
a measurement; the absolute samples/s is the durable metric.

Env overrides: BENCH_STEPS, BENCH_BATCH, BENCH_WARMUP.
"""
import json
import os
import sys
import time

import numpy as np

REFERENCE_GPU_SAMPLES_PER_SEC_ESTIMATE = 20.0
TPU_V5E_PEAK_BF16_FLOPS = 197e12  # per chip, published spec


def estimate_step_flops(batch, nstep, n_terms=12.0, bwd_iters=4, idim=512,
                        kernels=(3, 1, 3), scales=((3, 1024), (12, 256), (48, 64)),
                        blocks_per_scale=2):
    """Analytic FLOPs/step for the CIFAR-10 recipe, in net-eval equivalents.

    One net eval = the 3-conv Lipschitz stack (2*B*HW*Cin*Cout*k^2 per conv).
    Per imBlock and step the solver/estimator structure costs, in evals
    (VJP ~ 2 evals):
      forward solve   1 (x-embed) + nstep+1 (z evals)
      re-attachment   2 fwd + ~4 VJP (data+weight grads, both nets)
      estimator       2*n_terms  (ONE J^T apply per term per net — this
                      framework applies the chain transposes per term and
                      takes the weight-side VJP once at the end; the r4
                      model's 4*n_terms was the reference's per-term-
                      backprop count and over-counted: it implied the
                      measured 18.1 ms chain kernels ran at 1.5x the bf16
                      peak, experiments/mfu_crosscheck_r5.json)
      est-final       ~4 VJP-evals (the once-at-the-end weight VJPs)
      backward solve  2*bwd_iters (VJPs through nnet_z)
    n_terms defaults to n_exact_terms(10) + mean Poisson tail (~2).
    Cross-checked against the measured sustained device trace (r4 verdict
    #6): per-class implied throughputs land at each class's attainable
    rate — chains 0.75 of bf16 peak, tf32 solver evals 0.19, bwd/VJP 0.32.
    This remains a first-order model (ignores power iteration, actnorm,
    optimizer — sub-1% each).
    """
    evals = (1 + (nstep + 1)) + 6 + (2 * n_terms + 4) + 2 * bwd_iters
    k0, k1, k2 = kernels
    per_eval = 0.0
    for c, hw in scales:
        per_eval += 2 * batch * hw * idim * (c * k0 * k0 + idim * k1 * k1 + c * k2 * k2)
    return evals * per_eval * blocks_per_scale


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from implicit_normalizing_flows_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from implicit_normalizing_flows_tpu.training import adam, ema_init, linear_warmup
    from implicit_normalizing_flows_tpu.training.loops import make_image_step
    from __graft_entry__ import _build

    batch = int(os.environ.get("BENCH_BATCH", 64))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    # enough warmup steps that weights/Lipschitz state move off the easy
    # at-init solver regime before timing
    warmup = int(os.environ.get("BENCH_WARMUP", 20))
    size = 32

    # run_cifar10.sh recipe exactly: adaptive power iteration
    # (n-lipschitz-iters None, sn-tol 1e-3 — train_img.py defaults)
    model = _build([2, 2, 2], 512, size, batch, n_exact_terms=10,
                   coeff=0.9, fc_end=False, n_lip_iters=None, sn_tol=1e-3)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (batch, 3, size, size),
                            minval=0.05, maxval=0.95)
    # Whole init as ONE jitted program: the tunnel backend charges a slow
    # (occasionally hung) RPC per dispatched program, so minimise programs.
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), x0)
    variables = jax.jit(model.init_with_batch)(variables, x0, rng=jax.random.PRNGKey(2))
    params, state = variables["params"], variables["state"]

    optimizer = adam(linear_warmup(1e-3, 1000), betas=(0.9, 0.99), grad_clip=1.0)
    opt_state = optimizer.init(params)
    shadow = ema_init(params)
    step = make_image_step(model, optimizer, im_dim=3, imagesize=size,
                           task="density", n_lipschitz_iters=None)

    rng_np = np.random.RandomState(0)
    x_u8 = jnp.asarray(rng_np.randint(0, 256, size=(batch, 3, size, size), dtype=np.uint8))
    y = jnp.zeros((batch,), jnp.int32)
    key = jax.random.PRNGKey(3)

    for i in range(warmup):
        key, sub = jax.random.split(key)
        params, state, opt_state, shadow, m = step(
            params, state, opt_state, shadow, x_u8, y, sub, jnp.ones(()))
    warm_metrics = {k: float(v) for k, v in m.items()}  # forces sync

    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, state, opt_state, shadow, m = step(
            params, state, opt_state, shadow, x_u8, y, sub, jnp.ones(()))
    # Hard sync: materialise a value that depends on the full step chain
    # (block_until_ready on this tunnel backend returns before execution
    # finishes, which silently inflated earlier numbers ~100x).
    final_loss = float(m["loss"])
    dt = time.perf_counter() - t0

    samples_per_sec = batch * steps / dt
    nstep = warm_metrics.get("broyden_nstep", 3.0)
    flops = estimate_step_flops(batch, nstep)
    mfu = flops / (dt / steps) / TPU_V5E_PEAK_BF16_FLOPS
    out = {
        "metric": "cifar10_train_samples_per_sec",
        "value": round(samples_per_sec, 3),
        "unit": "samples/s",
        # vs_baseline is an ESTIMATE: the reference publishes no numbers
        # (BASELINE.md); 20 samples/s is the pinned V100-class guess.
        "vs_baseline": round(samples_per_sec / REFERENCE_GPU_SAMPLES_PER_SEC_ESTIMATE, 3),
        "vs_baseline_is_estimate": True,
        "step_ms": round(1000 * dt / steps, 3),
        # analytic-model FLOPs (see estimate_step_flops) / v5e bf16 peak
        "tflops_per_step_est": round(flops / 1e12, 2),
        "mfu_est": round(mfu, 4),
        "bpd": round(warm_metrics.get("bpd", float("nan")), 4),
        "broyden_nstep": round(nstep, 2),
        "broyden_converged": round(warm_metrics.get("broyden_converged", float("nan")), 3),
        # the health band next to the throughput (VERDICT r3 item 10):
        # fraction of examples within 3x eps, and the reference's own
        # batch-RMS criterion as a multiple of its tolerance
        "broyden_conv3eps": round(warm_metrics.get("broyden_converged_3eps", float("nan")), 3),
        "broyden_rms_over_tol": round(warm_metrics.get("broyden_rms_over_tol", float("nan")), 3),
    }
    if os.environ.get("BENCH_SKIP_SUSTAINED"):
        out["sustained_note"] = "skipped (BENCH_SKIP_SUSTAINED)"
    else:
        try:
            out.update(sustained_section(model, step, optimizer, batch, size,
                                         steps))
        except Exception as e:  # never lose the at-init line to a ckpt mismatch
            out["sustained_samples_per_sec"] = None
            out["sustained_note"] = f"sustained section failed: {e}"
    print(json.dumps(out))


# The committed compact (params+state, f16) saturated checkpoint: a FIXED
# measurement point that survives fresh clones, so sustained numbers compare
# like-for-like across rounds. (The r3 full checkpoints were gitignored and
# lost between rounds, silently dropping the sustained section; and
# end-of-run checkpoints get harder every round as runs train further —
# r4's epoch-13 regime is conditioning-limited per hard_regime_r4.json.)
# npz (non-executable) per the r4 advisor: np.load(allow_pickle=False)
SUSTAINED_CKPT_FIXED = "experiments/cifar10_long_r4/bench_ckpt.npz"
# End-of-run checkpoints (hardest regime reached), reported as
# sustained_final_* when present in the tree: the newest LOCAL end-of-run
# .pkl wins when a run has just produced one; the last entry is a COMMITTED
# compact npz so the section survives a fresh clone (the full .pkl
# checkpoints are gitignored and vanish between rounds, which silently
# dropped sustained_final in r5 until the flagship re-run regenerated it).
SUSTAINED_CKPTS_FINAL = [
    "experiments/cifar10_long_r5b/most_recent.pkl",
    "experiments/cifar10_long_r5/most_recent.pkl",
    "experiments/cifar10_long_r4/most_recent.pkl",
    "experiments/cifar10_long_r5b/final_ckpt.npz",
]


def _measure_ckpt(ckpt_path, step, optimizer, batch, size, steps, tag):
    """Resume a checkpoint and time `steps` training steps on structured
    synthetic batches (the distribution the checkpoint was trained on);
    returns {tag}_* throughput + solver-health fields."""
    import jax
    import jax.numpy as jnp

    from implicit_normalizing_flows_tpu.training import ema_init
    from implicit_normalizing_flows_tpu.training.checkpoints import load_checkpoint

    here = os.path.dirname(os.path.abspath(__file__))
    ck = load_checkpoint(ckpt_path)
    # the checkpointed model matches the bench recipe (CIFAR-10 2-2-2);
    # reuse the already-compiled step with the checkpoint's params/state
    params, state = ck["params"], ck["state"]
    if ck.get("compact_f16"):
        # committed compact export (experiments/export_bench_ckpt.py):
        # f16 storage -> f32 compute types
        import numpy as _np

        cast = lambda t: jax.tree.map(
            lambda a: _np.asarray(a, _np.float32)
            if getattr(a, "dtype", None) == _np.float16 else a, t)
        params, state = cast(params), cast(state)
    opt_state = optimizer.init(params)
    shadow = ema_init(params)
    from implicit_normalizing_flows_tpu.data.images import _synthetic_structured
    x_u8 = jnp.asarray(
        _synthetic_structured("bench", batch, 3, size, size, seed=1).x)
    y = jnp.zeros((batch,), jnp.int32)
    key = jax.random.PRNGKey(9)
    m = None
    for i in range(5):  # settle optimizer/EMA state
        key, sub = jax.random.split(key)
        params, state, opt_state, shadow, m = step(
            params, state, opt_state, shadow, x_u8, y, sub, jnp.ones(()))
    warm = {k: float(v) for k, v in m.items()}
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, state, opt_state, shadow, m = step(
            params, state, opt_state, shadow, x_u8, y, sub, jnp.ones(()))
    _ = float(m["loss"])  # hard sync (see at-init section)
    dt = time.perf_counter() - t0
    nstep = warm.get("broyden_nstep", float("nan"))
    flops = estimate_step_flops(batch, nstep)
    return {
        f"{tag}_samples_per_sec": round(batch * steps / dt, 3),
        f"{tag}_step_ms": round(1000 * dt / steps, 3),
        f"{tag}_mfu_est": round(flops / (dt / steps) / TPU_V5E_PEAK_BF16_FLOPS, 4),
        f"broyden_nstep_{tag}": round(nstep, 2),
        f"broyden_converged_{tag}": round(warm.get("broyden_converged", float("nan")), 3),
        f"broyden_conv3eps_{tag}": round(warm.get("broyden_converged_3eps", float("nan")), 3),
        f"broyden_rms_over_tol_{tag}": round(warm.get("broyden_rms_over_tol", float("nan")), 3),
        f"{tag}_ckpt": os.path.relpath(ckpt_path, here),
    }


def sustained_section(model, step, optimizer, batch, size, steps):
    """Mid-training (saturated-Lipschitz) throughput: the at-init number
    describes only the first ~100 steps of a run's life (round-2 verdict).
    Two measurement points: `sustained_*` on the COMMITTED fixed checkpoint
    (stable across rounds), and `sustained_final_*` on the newest end-of-run
    checkpoint when one exists in the tree (the hardest regime the run
    reached — conditioning-limited at r4's epoch 13, hard_regime_r4.json)."""
    here = os.path.dirname(os.path.abspath(__file__))
    out = {}
    fixed = os.path.join(here, SUSTAINED_CKPT_FIXED)
    if os.path.exists(fixed):
        out.update(_measure_ckpt(fixed, step, optimizer, batch, size, steps,
                                 "sustained"))
    else:
        if os.environ.get("BENCH_REQUIRE_SUSTAINED"):
            raise SystemExit(
                f"BENCH_REQUIRE_SUSTAINED=1 but {fixed} is missing: the "
                "headline sustained number would silently vanish")
        out["sustained_samples_per_sec"] = None
        out["sustained_note"] = "fixed bench checkpoint missing"
    final = next((os.path.join(here, p) for p in SUSTAINED_CKPTS_FINAL
                  if os.path.exists(os.path.join(here, p))), None)
    if final is not None:
        out.update(_measure_ckpt(final, step, optimizer, batch, size, steps,
                                 "sustained_final"))
    return out


def main_with_retries():
    """The TPU tunnel in this image occasionally loses a compile RPC and a
    process hangs forever; run the measurement in a subprocess with a timeout
    and retry so the driver always receives its JSON line."""
    import subprocess

    attempts = int(os.environ.get("BENCH_ATTEMPTS", 3))
    timeout_s = int(os.environ.get("BENCH_TIMEOUT_S", 1500))
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"],
                capture_output=True, text=True, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            print(f"bench attempt {i + 1} timed out; retrying", file=sys.stderr)
            continue
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode == 0 and lines:
            print(lines[-1])
            return 0
        print(f"bench attempt {i + 1} failed rc={r.returncode}:\n{r.stderr[-2000:]}",
              file=sys.stderr)
    print(json.dumps({
        "metric": "cifar10_train_samples_per_sec", "value": 0.0,
        "unit": "samples/s", "vs_baseline": 0.0,
        "error": "all bench attempts failed (TPU tunnel)",
    }))
    return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(main_with_retries())
