"""The flow-layer protocol: static layer objects over explicit variable pytrees.

The reference expresses every flow layer as a mutable ``nn.Module`` with the
uniform protocol ``forward(x, logpx=None[, restore]) -> y[, logpy]`` /
``inverse(y, logpy=None) -> x[, logpx]`` (``lib/layers/container.py:12-30``,
``lib/layers/act_norm.py:22-59``). Here the same protocol is functional:

* a layer instance is **static configuration only** (hashable, closed over by
  jit);
* all numeric data lives in ``variables = {'params': ..., 'state': ...}``;
* ``forward`` returns ``(y, logpy, new_state)`` so the few genuinely stateful
  pieces (MovingBatchNorm running means, estimator moment diagnostics) thread
  functionally instead of mutating buffers;
* data-dependent initialisation (ActNorm's first batch, the reference's
  ``restore=True`` dummy forward — ``train_img.py:502-507``) is the explicit
  ``init_with_batch`` pass;
* the out-of-band Lipschitz power iteration (``update_lipschitz``,
  ``train_img.py:786-792``) is the pure ``update_lipschitz`` map
  ``variables -> variables``, jitted once for the whole model.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Variables = dict  # {'params': pytree, 'state': pytree}


def make_vars(params=None, state=None) -> Variables:
    return {"params": params if params is not None else {},
            "state": state if state is not None else {}}


class Flow:
    """Base class for invertible layers. Subclasses override the `_` methods."""

    # ---- construction ----
    def init(self, rng: jax.Array, x: jax.Array) -> Variables:
        """Create variables given an example batch (shapes/dtypes only matter)."""
        return make_vars()

    def init_with_batch(self, variables: Variables, x: jax.Array,
                        rng: Optional[jax.Array] = None) -> Variables:
        """Data-dependent init (ActNorm et al.); default: no-op."""
        return variables

    # ---- the flow protocol ----
    def forward(self, variables: Variables, x, logpx=None, *, rng=None,
                train: bool = False):
        """Returns (y, logpy, new_state); logpy is None iff logpx is None."""
        raise NotImplementedError

    def inverse(self, variables: Variables, y, logpy=None, *, rng=None):
        """Returns (x, logpx)."""
        raise NotImplementedError

    def init_forward(self, variables, x, rng=None):
        """Shape/value threading during parameter init. Default runs the real
        forward; shape-preserving solver blocks override this to skip the
        (expensive, value-irrelevant) fixed-point solve — parameter init only
        consumes shapes, and the reference's data-dependent init happens in
        the separate ``init_with_batch`` restore pass."""
        y, _, _ = self.forward(variables, x, None, rng=rng)
        return y

    # ---- out-of-band maintenance ----
    def update_lipschitz(self, variables: Variables, n_iterations=None) -> Variables:
        """Re-run power iteration into fresh state; default: no-op."""
        return variables

    def lipschitz_sigmas(self, variables: Variables) -> list:
        """Diagnostic per-layer sigma estimates (train_img.py:774-783)."""
        return []

    def lipschitz_one_iter(self, variables: Variables):
        """(sum_of_sigmas, count) differentiable w.r.t. learned p-orders
        (``compute_p_grads``, train_toy.py:133-144); default contributes 0."""
        return jnp.zeros(()), 0

    def ords(self, variables: Variables) -> list:
        """Learned/static (domain, codomain) orders (train_toy.py:166-178)."""
        return []


class Inverse(Flow):
    """Wrap a flow so forward <-> inverse swap (container.py:33-43)."""

    def __init__(self, flow: Flow):
        self.flow = flow

    def init(self, rng, x):
        return self.flow.init(rng, x)

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        y, logpy = self.flow.inverse(variables, x, logpx, rng=rng)
        return y, logpy, variables["state"]

    def inverse(self, variables, y, logpy=None, *, rng=None):
        x, logpx, _ = self.flow.forward(variables, y, logpy, rng=rng)
        return x, logpx

    def update_lipschitz(self, variables, n_iterations=None):
        return self.flow.update_lipschitz(variables, n_iterations)

    def lipschitz_sigmas(self, variables):
        return self.flow.lipschitz_sigmas(variables)


def fold_rng(rng, i: int):
    """Deterministic per-child key; None passes through."""
    if rng is None:
        return None
    return jax.random.fold_in(rng, i)
