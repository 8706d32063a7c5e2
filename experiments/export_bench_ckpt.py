"""Export a compact, committable bench checkpoint from a full training
checkpoint: params + state only (no optimizer/EMA), float16 storage, npz
format (non-executable; ``load_npz_tree`` reads with allow_pickle=False —
the r4 advisor's objection to shipping pickles in-repo).

The round-3 full checkpoints were gitignored and lost between rounds, which
silently dropped bench.py's sustained (mid-training) section. A ~20 MB
f16 npz export of the saturated weights IS committable; bench.py casts the
leaves back to f32 on load (the sustained section re-inits optimizer/EMA
anyway, and the bench needs a representative saturated-Lipschitz state,
not bit-exactness).

Usage: python experiments/export_bench_ckpt.py IN.pkl OUT.npz
"""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from implicit_normalizing_flows_tpu.training.checkpoints import save_npz_tree


def compact(tree):
    if isinstance(tree, dict):
        return {k: compact(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(compact(v) for v in tree)
    a = np.asarray(tree)
    if a.dtype == np.float32:
        if np.nanmax(np.abs(a), initial=0.0) >= 6e4:  # beyond f16 range
            return a
        return a.astype(np.float16)
    return a


def main():
    src, dst = sys.argv[1], sys.argv[2]
    if not dst.endswith(".npz"):
        raise SystemExit(f"OUT must be .npz (got {dst}): bench.py and "
                         "tests/test_bench_assets.py require the "
                         "non-executable npz format")
    with open(src, "rb") as f:
        ck = pickle.load(f)
    out = {"params": compact(ck["params"]), "state": compact(ck["state"]),
           "epoch": ck.get("epoch"), "compact_f16": True}
    save_npz_tree(out, dst)
    print(f"{dst}: {os.path.getsize(dst) / 1e6:.1f} MB (epoch {out['epoch']})")


if __name__ == "__main__":
    main()
