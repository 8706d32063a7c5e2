"""Distill a train_tabular.py log into a health-verdict JSON
(experiments/tabular_power_r4.json — VERDICT round 3, missing item 8).

Usage: python experiments/tabular_health.py <save_dir> [out.json]

Healthy requires: descending val NLL (last val < first val), every train
point inside the solver budget, and the 3x-eps acceptance band >= 0.95
throughout (same gates as experiments/long_horizon.py, tabular flavor:
the tabular driver logs NLL instead of bits/dim and has no eval-solver
telemetry lines).
"""
import json
import os
import re
import sys


def main():
    save = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else None
    log = os.path.join(save, "logs")
    train_re = re.compile(
        r"Epoch \[(\d+)\]\[(\d+)\] \| Time ([\d.]+) \| "
        r"NLL ([-\d.]+)\(([-\d.]+)\).*?BroydenIters ([\d.]+) \| "
        r"Converged ([\d.]+) \| Conv3eps ([\d.]+) \| RefRMS ([\d.]+)")
    val_re = re.compile(r"Epoch (\d+) \| Val NLL ([-\d.]+)")
    test_re = re.compile(r"Epoch (\d+) \| Test NLL ([-\d.]+)")

    train, vals, tests = [], [], []
    with open(log) as f:
        for line in f:
            m = train_re.search(line)
            if m:
                e, i, t, nll, nll_avg, nstep, conv, c3, rms = m.groups()
                train.append((int(e), int(i), float(t), float(nll_avg),
                              float(nstep), float(conv), float(c3),
                              float(rms)))
                continue
            m = val_re.search(line)
            if m:
                vals.append((int(m.group(1)), float(m.group(2))))
                continue
            m = test_re.search(line)
            if m:
                tests.append((int(m.group(1)), float(m.group(2))))

    if not train or not vals:
        raise SystemExit(f"no parsable train/val lines in {log}")

    k = max(1, len(train) // 10)
    nsteps = [t[4] for t in train]
    summary = {
        "n_train_points": len(train),
        "epochs": train[-1][0] + 1,
        "train_nll_first_decile_avg": round(
            sum(t[3] for t in train[:k]) / k, 4),
        "train_nll_last_decile_avg": round(
            sum(t[3] for t in train[-k:]) / k, 4),
        "val_nll_trajectory": vals,
        "test_nll_trajectory": tests,
        "best_val_nll": min(v for _, v in vals),
        "step_time_last_decile_avg": round(
            sum(t[2] for t in train[-k:]) / k, 4),
        "broyden_nstep_first": nsteps[0],
        "broyden_nstep_last": nsteps[-1],
        "broyden_nstep_max": max(nsteps),
        "min_converged_fraction": min(t[5] for t in train),
        "min_converged_3eps": min(t[6] for t in train),
        "max_ref_rms_over_tol": max(t[7] for t in train),
    }
    summary["healthy"] = bool(
        vals[-1][1] < vals[0][1]
        and summary["min_converged_3eps"] >= 0.95
        and summary["broyden_nstep_max"] <= 30)
    text = json.dumps(summary, indent=1)
    print(text)
    if out:
        with open(out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
