"""TPU-native implicit normalizing flows.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
musikisomorphie/implicit-normalizing-flows (ICLR 2021, arXiv:2103.09527).

Design stance (see /root/repo/SURVEY.md §7): the reference's mutable
nn.Modules, host-driven solver loops, and autograd.Function graph surgery are
replaced by

* pure functions over explicit ``{'params': ..., 'state': ...}`` pytrees,
* a batched Broyden solver as an on-device ``lax.while_loop`` with
  *per-example* convergence masks (reference: batch-global ``.item()`` syncs,
  ``lib/layers/broyden.py:145,157``),
* ``jax.custom_vjp`` for the implicit-function-theorem backward solve
  (reference: ``imBlock.Backward``, ``lib/layers/implicit_block.py:165-217``),
* a ``jax.sharding.Mesh`` data/trace-parallel training step (reference:
  ``torch.nn.DataParallel`` only).
"""

__version__ = "0.1.0"

from . import ops, layers, models, parallel, training, data, utils  # noqa: F401
