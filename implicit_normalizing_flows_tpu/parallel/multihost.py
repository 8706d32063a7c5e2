"""Multi-host (multi-process) SPMD bootstrapping.

The reference has NO multi-host story — its only parallelism is the
single-process ``torch.nn.DataParallel`` scatter/gather
(``/root/reference/train_img.py:203-204``; SURVEY.md §2.5 P1/P6). The
TPU-native design is multi-controller JAX: every process runs the same
driver, ``jax.distributed.initialize`` wires the TPU coordination service,
and one global ``Mesh`` spans all chips — gradient all-reduces ride ICI
within a slice and DCN across hosts, inserted by GSPMD from the shardings
(SURVEY.md §5 "Distributed communication backend").

Host responsibilities split by ``jax.process_index()``:

* each process feeds its contiguous shard of every global batch
  (``local_shard``) and assembles the global device array with
  ``jax.make_array_from_process_local_data``;
* checkpoints / visualisation / log files are written by process 0 only
  (replicated outputs are addressable everywhere, so reads need no
  gather);
* ``sync_global_devices`` barriers guard cross-process filesystem races.

Tested via a 2-process CPU fixture (``tests/test_multihost.py``): two
subprocesses, each with 2 virtual CPU devices, assert step-level parity
with the single-process 4-device run.
"""
from __future__ import annotations

import jax


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Bootstrap multi-controller JAX (``--coordinator host:port
    --num-processes N --process-id I`` in every driver). No-op (returns
    False) when no coordinator is given: single-process mode, local devices
    only. Must run before anything queries ``jax.devices()``."""
    if coordinator is None:
        return False
    kwargs = {"coordinator_address": coordinator}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main() -> bool:
    """True on the process that owns checkpoint/log/viz writes."""
    return jax.process_index() == 0


def local_shard(x, axis: int = 0):
    """This process's contiguous slice of a host-global batch.

    Every process computes the same shuffled batch (same numpy seed), then
    keeps rows ``[i*B/n, (i+1)*B/n)`` — process-sharded data loading without
    any cross-host coordination. Identity when single-process."""
    n = jax.process_count()
    if n == 1:
        return x
    i = jax.process_index()
    per = x.shape[axis] // n
    if per * n != x.shape[axis]:
        raise ValueError(
            f"batch axis {axis} ({x.shape[axis]}) not divisible by the "
            f"process count ({n})")
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(i * per, (i + 1) * per)
    return x[tuple(sl)]


def add_distributed_flags(parser) -> None:
    """The three bootstrap flags every driver exposes (multi-host runs invoke
    the same driver once per process)."""
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of the jax.distributed coordinator; "
                             "enables multi-host training")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu", "axon"],
                        help="force the JAX backend (site config may pin "
                             "JAX_PLATFORMS; this wins if set before first "
                             "device use)")


def setup_distributed(args) -> int:
    """init_distributed from driver args; broadcast process 0's seed so every
    process draws the same host-side batch permutation. Returns the process
    count."""
    if getattr(args, "platform", None):
        # must precede any jax device/backend query (including
        # init_distributed); overrides a sitecustomize-pinned JAX_PLATFORMS
        jax.config.update("jax_platforms", args.platform)
    init_distributed(getattr(args, "coordinator", None),
                     getattr(args, "num_processes", None),
                     getattr(args, "process_id", None))
    n = jax.process_count()
    if n > 1 and getattr(args, "seed", None) is not None:
        import numpy as np
        from jax.experimental import multihost_utils

        args.seed = int(multihost_utils.broadcast_one_to_all(
            np.asarray(args.seed, np.int64)))
    return n


def sync(name: str = "sync") -> None:
    """Barrier across all processes (checkpoint-write ordering). No-op
    single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
