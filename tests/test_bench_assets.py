"""Guards for the committed bench measurement points (round-4 verdict #9).

bench.py's sustained section silently reports null when the fixed checkpoint
is missing; these tests make the headline number's prerequisites a CI
failure instead. The checkpoint is stored as npz (np.load with
allow_pickle=False — non-executable, unlike pickle; r4 advisor finding).
"""
import os

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_attr(name):
    # bench.py imports jax at module level through its deps; read the
    # constant textually so this test stays sub-second.
    import re

    with open(os.path.join(HERE, "bench.py")) as f:
        src = f.read()
    m = re.search(rf'{name} = "([^"]+)"', src)
    assert m, f"bench.py no longer defines {name}"
    return m.group(1)


def test_fixed_sustained_checkpoint_exists_and_loads():
    rel = _bench_attr("SUSTAINED_CKPT_FIXED")
    path = os.path.join(HERE, rel)
    assert os.path.exists(path), (
        f"fixed sustained-bench checkpoint missing: {rel} — bench.py would "
        "silently drop the headline sustained_samples_per_sec")
    assert path.endswith(".npz"), "fixed bench checkpoint must be npz (non-executable)"

    from implicit_normalizing_flows_tpu.training.checkpoints import load_npz_tree

    ck = load_npz_tree(path)
    assert ck.get("compact_f16") is True
    assert "params" in ck and "state" in ck
    leaves = [a for a in _iter_arrays(ck["params"])]
    assert len(leaves) > 50  # the full 2-2-2 CIFAR stack, not a stub
    assert all(np.isfinite(a).all() for a in leaves if a.dtype.kind == "f")


def _iter_arrays(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_arrays(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _iter_arrays(v)
    elif isinstance(tree, np.ndarray):
        yield tree


def test_npz_tree_roundtrip(tmp_path):
    from implicit_normalizing_flows_tpu.training.checkpoints import (
        load_npz_tree, save_npz_tree)

    tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                       "lst": [np.ones(2, np.float16), "name", None]},
            "epoch": 7, "compact_f16": True,
            "tup": (1.5, np.zeros((1,), np.int32))}
    p = str(tmp_path / "t.npz")
    save_npz_tree(tree, p)
    rt = load_npz_tree(p)
    assert rt["epoch"] == 7 and rt["compact_f16"] is True
    assert isinstance(rt["tup"], tuple) and rt["tup"][0] == 1.5
    assert rt["params"]["lst"][1] == "name" and rt["params"]["lst"][2] is None
    np.testing.assert_array_equal(rt["params"]["w"], tree["params"]["w"])
    assert rt["params"]["lst"][0].dtype == np.float16


def test_npz_tree_rejects_object_leaves_and_bad_keys(tmp_path):
    """save_npz_tree must FAIL at save time on leaves np.savez would
    silently pickle (object arrays — unreadable by the allow_pickle=False
    load, and executable content in a 'non-executable' format) and on
    non-string dict keys (json would silently stringify them)."""
    import argparse

    import pytest

    from implicit_normalizing_flows_tpu.training.checkpoints import save_npz_tree

    p = str(tmp_path / "bad.npz")
    with pytest.raises(TypeError, match="not a numeric array"):
        save_npz_tree({"args": argparse.Namespace(lr=1e-3)}, p)
    with pytest.raises(TypeError, match="non-string dict keys"):
        save_npz_tree({3: np.zeros(2)}, p)
