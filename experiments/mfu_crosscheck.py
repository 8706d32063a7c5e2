"""Cross-check bench.py's analytic flop model against a measured device
trace (r4 verdict #6).

Classifies the sustained-regime trace's device ops into the model's classes
(forward solves / estimator chains / backward+VJP fusions / other), sums
measured time per class, and compares the implied per-class throughput with
the model's flop attribution. Conclusion feeds BASELINE.md and, where the
model's eval counts are wrong, bench.py::estimate_step_flops.

Usage: python experiments/profile_sustained.py /tmp/tr && \
       python experiments/mfu_crosscheck.py /tmp/tr --nstep 13.3
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def per_class_ms(trace_dir, n_steps=None):
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {trace_dir}"
    d = json.load(gzip.open(paths[-1]))
    events = d["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    mod_events = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e["pid"], ""):
            continue
        name = e["name"]
        if name.startswith("jit_") or len(name) <= 3:
            if len(name) <= 3 and e["dur"] > 20e3:  # >20ms: step modules
                mod_events[name] += 1
            continue
        dur[name] += e["dur"]
    if n_steps is None:
        n_steps = sum(mod_events.values())
    assert n_steps > 0
    cls = collections.Counter()
    for name, us in dur.items():
        if "fused_neumann_chain" in name:
            cls["chains"] += us
        elif name.startswith("transpose_jvp"):
            cls["bwd+vjp"] += us
        elif name.startswith("jvp"):
            # forward-direction custom-call kernels: the fused solves (by far
            # the largest members; solve_lab cross-checks the two 32x32 ones)
            # plus reattach-forward fusions
            cls["fwd_solves+reattach"] += us
        else:
            cls["other_fusions"] += us
    return {k: v / 1000.0 / n_steps for k, v in cls.items()}, n_steps


def model_class_flops(batch, nstep, n_terms=12.0, bwd_iters=4, idim=512,
                      kernels=(3, 1, 3),
                      scales=((3, 1024), (12, 256), (48, 64)),
                      blocks_per_scale=2):
    """Per-class flops under the CORRECTED eval-count model (r5):
      fwd solve    1 (x-embed) + nstep+1 (z evals)
      reattach     2 fwd + ~4 VJP-evals
      chains       2*n_terms J^T applies (ONE eval each — this framework's
                   estimator applies J^T per term and takes the weight-side
                   VJP once at the end, unlike the reference's per-term
                   backprop; bench.py's old 4*n_terms double-counted)
      est-final    ~4 VJP-evals
      bwd solve    2*bwd_iters VJP-evals
    """
    k0, k1, k2 = kernels
    per_eval = 0.0
    for c, hw in scales:
        per_eval += 2 * batch * hw * idim * (
            c * k0 * k0 + idim * k1 * k1 + c * k2 * k2)
    ev = {
        "fwd_solves+reattach": (1 + nstep + 1) + 6,
        "chains": 2 * n_terms,
        "bwd+vjp": 4 + 2 * bwd_iters,
        "other_fusions": 0.0,
    }
    return {k: v * per_eval * blocks_per_scale for k, v in ev.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--nstep", type=float, required=True)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=None,
                    help="steps traced (default: infer from >20ms module events)")
    ap.add_argument("--out", default="experiments/mfu_crosscheck_r5.json")
    args = ap.parse_args()

    meas, n_steps = per_class_ms(args.trace_dir, args.steps)
    flops = model_class_flops(args.batch, args.nstep)
    peak = 197e12
    rows = {}
    tot_ms = sum(meas.values())
    tot_fl = sum(flops.values())
    for k in sorted(meas):
        f = flops.get(k, 0.0)
        ms = meas[k]
        rows[k] = {
            "measured_ms": round(ms, 2),
            "model_tflop": round(f / 1e12, 3),
            "implied_tflops_per_s": round(f / (ms / 1e3) / 1e12, 1) if ms else None,
            "implied_frac_of_bf16_peak": round(f / (ms / 1e3) / peak, 3) if ms else None,
        }
        print(f"{k:22s} measured {ms:7.2f} ms  model {f/1e12:6.3f} TF "
              f"-> {f/(ms/1e3)/peak if ms else 0:.2f} of bf16 peak")
    out = {
        "n_steps_in_trace": n_steps,
        "total_measured_ms": round(tot_ms, 2),
        "total_model_tflop": round(tot_fl / 1e12, 3),
        "mfu_measured_against_device_time": round(
            tot_fl / (tot_ms / 1e3) / peak, 4),
        "classes": rows,
        "note": ("implied_frac_of_bf16_peak per class should sit at the "
                 "class's attainable rate: chains ~0.85-0.9 (bf16 1-pass), "
                 "solver evals ~0.3-0.5 (tf32 3-pass = 1/3 rate x fill "
                 "losses), VJP convs ~0.3-0.5; a class far above 1.0 means "
                 "the model OVER-counts its flops, far below its rate means "
                 "under-counts or the kernel is inefficient"),
    }
    print(f"\ntotal: {tot_ms:.1f} ms, {tot_fl/1e12:.2f} TF model -> "
          f"MFU vs device time {out['mfu_measured_against_device_time']:.3f}")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
