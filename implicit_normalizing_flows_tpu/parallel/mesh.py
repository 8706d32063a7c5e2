"""Device mesh + sharding for data/trace-parallel training.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
scatter/gather (``train_img.py:203-204``; SURVEY.md §2.5 P1/P6). The
TPU-native story is single-controller JAX over a ``Mesh``:

* ``data`` axis: batch sharded; gradients reduce over ICI automatically when
  the jitted loss takes a mean over the sharded batch.
* ``trace`` axis (optional): Hutchinson estimator samples are embarrassingly
  parallel (``n_samples``, ``implicit_block.py:114``) — replicate the batch
  and average independent estimator draws with distinct fold_in keys.
* a ``model`` axis is left available for future tensor parallelism (the
  reference models are small enough that replication is correct —
  SURVEY.md §2.5).

Per-example convergence masks in the Broyden solver mean the only cross-
device collectives inside the solve are the tiny ``any(active)`` loop
predicates; no per-iteration host syncs anywhere.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_trace: int = 1, devices=None,
              n_model: int = 1) -> Mesh:
    """3-axis device mesh: 'data' (batch), 'trace' (Hutchinson probes),
    'model' (tensor parallelism over the Lipschitz nets' channel dim)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_trace * n_model)
    devs = np.array(devices[: n_data * n_trace * n_model]).reshape(
        n_data, n_trace, n_model)
    return Mesh(devs, ("data", "trace", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch axis over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_batch(mesh: Mesh, x):
    return jax.device_put(x, batch_sharding(mesh, x.ndim))


def place_replicated(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def constrain_probe_axis(arr):
    """Shard a (P, B, ...) Hutchinson-probe array over the mesh 'trace' axis.

    The ``n_probes`` axis is embarrassingly parallel — each probe runs an
    independent estimator chain and only the final mean couples them (one
    tiny ICI all-reduce). Called inside jit on the sampled Rademacher
    tensors; a no-op unless the caller activated a mesh carrying a 'trace'
    axis (``jax.sharding.set_mesh(make_mesh(...))``) whose sizes divide the
    probe/batch axes, so single-mesh and mesh-free runs are untouched.
    """
    from jax.sharding import PartitionSpec, get_abstract_mesh

    m = get_abstract_mesh()
    names = getattr(m, "axis_names", ())
    if "trace" not in names:
        return arr
    shape = dict(m.shape)
    if shape.get("trace", 1) <= 1 or arr.shape[0] % shape["trace"] != 0:
        return arr
    batch = "data" if ("data" in names and arr.ndim > 1
                       and arr.shape[1] % shape.get("data", 1) == 0) else None
    spec = PartitionSpec("trace", batch, *([None] * (arr.ndim - 2)))
    return jax.lax.with_sharding_constraint(arr, spec)


def place_batch_axis(mesh: Mesh, x, axis: int = 0):
    """Shard one chosen axis over 'data' (e.g. axis=1 for the stacked
    (accum, B, ...) microbatch layout of gradient accumulation)."""
    spec = [None] * x.ndim
    spec[axis] = "data"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def tp_sharding(mesh: Mesh, tree, channel_size: int):
    """Tensor-parallel shardings for a params/state pytree: the first array
    dim equal to ``channel_size`` (the Lipschitz nets' intermediate_dim /
    idim) shards over 'model'; everything else replicates. GSPMD propagates
    through the convs/denses and inserts the all-reduces — no reference
    analogue (the reference's only parallelism is DataParallel)."""

    def spec(a):
        shape = getattr(a, "shape", ())
        dims = [None] * len(shape)
        for i, d in enumerate(shape):
            if d == channel_size:
                dims[i] = "model"
                break
        return NamedSharding(mesh, P(*dims))

    return jax.tree.map(spec, tree)


def place_tp(mesh: Mesh, tree, channel_size: int):
    """device_put the pytree with tensor-parallel channel shardings."""
    return jax.tree.map(jax.device_put, tree, tp_sharding(mesh, tree, channel_size))
