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


def _place_sharded(mesh: Mesh, x, sharding: NamedSharding, axis: int):
    """device_put single-process; assemble a global array from this
    process's local shard when the mesh spans multiple processes (the
    caller passes ONLY its local rows — multihost.local_shard)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    global_shape = list(x.shape)
    global_shape[axis] = x.shape[axis] * jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(x), tuple(global_shape))


def place_batch(mesh: Mesh, x):
    return _place_sharded(mesh, x, batch_sharding(mesh, x.ndim), 0)


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
    (accum, B, ...) microbatch layout of gradient accumulation). Multi-
    process: x is this process's local shard along that axis."""
    spec = [None] * x.ndim
    spec[axis] = "data"
    return _place_sharded(mesh, x, NamedSharding(mesh, P(*spec)), axis)


def tp_sharding(mesh: Mesh, tree, channel_size: int):
    """Tensor-parallel shardings for a params/state pytree, by param path.

    Only arrays inside the Lipschitz nets (path contains ``nnet_x``/
    ``nnet_z``/``nnet`` — the imBlock/iResBlock conv/dense stacks whose
    hidden width is ``channel_size`` = idim) are sharded over 'model':

    * conv/dense ``weight`` (out, in, ...): out-channels (dim 0) when
      ``out == channel_size`` (column-parallel hidden layers), else
      in-channels (dim 1) when ``in == channel_size`` (row-parallel final
      projection);
    * 1-D vectors (bias, power-iteration u/v) of length ``channel_size``:
      dim 0, following the activation sharding.

    Everything else — actnorm scales, classifier heads, coincidentally
    idim-sized tensors outside the nets — replicates, which the previous
    dim-size-only heuristic got wrong. GSPMD propagates the shardings
    through the convs/power-iteration/estimator and inserts the
    all-reduces. No reference analogue (the reference's only parallelism is
    DataParallel)."""
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    leaves, treedef = tree_flatten_with_path(tree)

    def spec(path, a):
        shape = getattr(a, "shape", ())
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        in_net = any(k in ("nnet_x", "nnet_z", "nnet") for k in keys)
        if not in_net or not shape:
            return NamedSharding(mesh, P())
        dims = [None] * len(shape)
        if len(shape) >= 2:
            if shape[0] == channel_size:
                dims[0] = "model"
            elif shape[1] == channel_size:
                dims[1] = "model"
        elif shape[0] == channel_size:
            dims[0] = "model"
        return NamedSharding(mesh, P(*dims))

    return tree_unflatten(treedef, [spec(p, a) for p, a in leaves])


def place_tp(mesh: Mesh, tree, channel_size: int):
    """device_put the pytree with tensor-parallel channel shardings.

    Composition with the fused Pallas kernels: the kernels partition over
    the 'data' axis only (``ops.fused_solve._maybe_shard`` shard_maps with
    replicated weight specs), so under a data x model mesh GSPMD
    all-gathers the model-sharded weights at each kernel boundary and the
    kernels run data-parallel with full weights. That is the intended
    trade: these Lipschitz stacks are activation-dominated (a 512-channel
    3x3 kernel is ~2.4 MB vs ~128 MB of per-batch solver state), so
    gathering weights over ICI is cheap while activations never move.
    Executed end-to-end by ``__graft_entry__.dryrun_multichip`` phase 5
    (pallas-interpret x data2xmodel2 vs the XLA path on the same mesh)."""
    return jax.tree.map(jax.device_put, tree, tp_sharding(mesh, tree, channel_size))
