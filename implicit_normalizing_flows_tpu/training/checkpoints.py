"""Checkpoint save/restore with the reference's rotation discipline
(``lib/utils.py:90-100``: rotating keep-N by epoch + ``most_recent`` every
epoch, ``train_img.py:842-858``). Pytrees are host-transferred to numpy and
pickled; restore re-places them on device lazily at first use.
"""
from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    """Device arrays -> host numpy; python scalars/strings (e.g. the embedded
    args namespace) pass through untouched."""
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
    )


def save_checkpoint(state: dict, save_dir: str, epoch: int,
                    last_checkpoints=None, num_checkpoints=None):
    """state is an arbitrary pytree/dict (params, opt state, EMA shadow, args,
    metrics — mirroring the reference dict, ``train_img.py:844-850``)."""
    os.makedirs(save_dir, exist_ok=True)
    filename = os.path.join(save_dir, f"checkpt-{epoch:04d}.pkl")
    with open(filename, "wb") as f:
        pickle.dump(_to_numpy(state), f)
    if last_checkpoints is not None and num_checkpoints is not None:
        last_checkpoints.append(epoch)
        if len(last_checkpoints) > num_checkpoints:
            rm_epoch = last_checkpoints.pop(0)
            old = os.path.join(save_dir, f"checkpt-{rm_epoch:04d}.pkl")
            if os.path.exists(old):
                os.remove(old)
    return filename


def save_most_recent(state: dict, save_dir: str):
    os.makedirs(save_dir, exist_ok=True)
    filename = os.path.join(save_dir, "most_recent.pkl")
    with open(filename, "wb") as f:
        pickle.dump(_to_numpy(state), f)
    return filename


def load_checkpoint(path: str):
    if path.endswith(".npz"):
        return load_npz_tree(path)
    with open(path, "rb") as f:
        return pickle.load(f)


# ---------------------------------------------------------------------------
# npz tree storage: a non-executable format for REPO-COMMITTED checkpoints
# (the fixed sustained-bench measurement point). Unlike pickle, np.load with
# allow_pickle=False cannot execute code on load. Structure: a `__spec__`
# JSON encodes the nesting with leaves either inline JSON scalars or "@arr_N"
# references into the archive's arrays.

def save_npz_tree(tree, path: str):
    import json

    arrays = {}

    def enc(node):
        if isinstance(node, dict):
            bad_keys = [k for k in node if not isinstance(k, str)]
            if bad_keys:
                # json.dumps would silently stringify these, corrupting the
                # round-trip (load would return str keys).
                raise TypeError(
                    f"save_npz_tree: non-string dict keys {bad_keys!r}")
            return {"t": "d", "v": {k: enc(v) for k, v in node.items()}}
        if isinstance(node, (list, tuple)):
            return {"t": "l" if isinstance(node, list) else "t",
                    "v": [enc(v) for v in node]}
        if node is None or isinstance(node, (bool, int, float, str)):
            return {"t": "s", "v": node}
        a = np.asarray(node)
        if a.dtype == object:
            # np.savez would PICKLE an object array silently (allow_pickle
            # defaults True on save) — the archive would then both defeat
            # the non-executable-format contract and be unreadable by
            # load_npz_tree's allow_pickle=False load. Fail at save time.
            raise TypeError(
                f"save_npz_tree: leaf of type {type(node).__name__} is not "
                "a numeric array/scalar; npz trees hold arrays and "
                "JSON-encodable scalars only")
        name = f"arr_{len(arrays)}"
        arrays[name] = a
        return {"t": "a", "v": name}

    spec = enc(_to_numpy(tree))
    np.savez_compressed(path, __spec__=np.frombuffer(
        json.dumps(spec).encode(), dtype=np.uint8), **arrays)
    return path


def load_npz_tree(path: str):
    import json

    with np.load(path, allow_pickle=False) as z:
        spec = json.loads(bytes(z["__spec__"]).decode())

        def dec(node):
            t, v = node["t"], node["v"]
            if t == "d":
                return {k: dec(x) for k, x in v.items()}
            if t == "l":
                return [dec(x) for x in v]
            if t == "t":
                return tuple(dec(x) for x in v)
            if t == "s":
                return v
            return z[v]

        return dec(spec)
