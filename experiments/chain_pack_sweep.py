"""On-chip sweep of IMNF_CHAIN_PACK_LANES (and optionally other kernel
knobs) on the CIFAR-10 recipe: per-variant steady-state step time via the
bench harness in a fresh subprocess per setting (env must be set before jax
initialises the kernels' traces).

Usage: python experiments/chain_pack_sweep.py [lanes ...]
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(env_extra):
    env = dict(os.environ, **env_extra)
    try:
        p = subprocess.run([sys.executable, os.path.join(HERE, "bench.py")],
                           capture_output=True, text=True, env=env,
                           timeout=1500)
    except subprocess.TimeoutExpired:
        return {"error": "bench subprocess timed out (1500s)"}
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    if p.returncode != 0:
        return {"error": f"rc={p.returncode}: {p.stderr[-400:]}"}
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return {"error": p.stderr[-400:]}


def main():
    lanes = [int(a) for a in sys.argv[1:]] or [256, 512, 1024, 2048]
    for ln in lanes:
        r = run_one({"IMNF_CHAIN_PACK_LANES": str(ln)})
        row = {"chain_pack_lanes": ln,
               "samples_per_sec": r.get("value"),
               "step_ms": r.get("step_ms"),
               "bpd": r.get("bpd")}
        if "error" in r:
            row["error"] = r["error"]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
