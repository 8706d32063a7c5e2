"""Flow containers (reference: ``lib/layers/container.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .protocol import Flow, Variables, fold_rng, make_vars


class SequentialFlow(Flow):
    """Chain with logp threading (container.py:12-30).

    Child variables live in parallel lists: ``params = [p0, p1, ...]``,
    ``state = [s0, s1, ...]``.
    """

    def __init__(self, chain):
        self.chain = list(chain)

    def __len__(self):
        return len(self.chain)

    def child_vars(self, variables: Variables, i: int) -> Variables:
        return {"params": variables["params"][i], "state": variables["state"][i]}

    def init(self, rng, x):
        params, states = [], []
        for i, layer in enumerate(self.chain):
            v = layer.init(fold_rng(rng, i), x)
            params.append(v["params"])
            states.append(v["state"])
            x = layer.init_forward(v, x, rng=fold_rng(rng, 10_000 + i))
        return make_vars(params, states)

    def init_forward(self, variables, x, rng=None):
        for i, layer in enumerate(self.chain):
            x = layer.init_forward(self.child_vars(variables, i), x,
                                   rng=fold_rng(rng, i))
        return x

    def init_with_batch(self, variables, x, rng=None):
        """Run children in order, letting each see the activations produced by
        the already-initialised prefix (reference restore pass semantics:
        imBlock.forward(restore=True) + ActNorm lazy init, SURVEY.md §3.3)."""
        params = list(variables["params"])
        states = list(variables["state"])
        for i, layer in enumerate(self.chain):
            v = {"params": params[i], "state": states[i]}
            v = layer.init_with_batch(v, x, rng=fold_rng(rng, i) if rng is not None else None)
            params[i], states[i] = v["params"], v["state"]
            x, _, _ = layer.forward(v, x, None, rng=fold_rng(rng, 10_000 + i) if rng is not None else None)
        return make_vars(params, states)

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        new_states = []
        for i, layer in enumerate(self.chain):
            v = self.child_vars(variables, i)
            x, logpx, s = layer.forward(v, x, logpx, rng=fold_rng(rng, i), train=train)
            new_states.append(s)
        return x, logpx, new_states

    def inverse(self, variables, y, logpy=None, *, rng=None):
        for i in range(len(self.chain) - 1, -1, -1):
            v = self.child_vars(variables, i)
            y, logpy = self.chain[i].inverse(v, y, logpy, rng=fold_rng(rng, i))
        return y, logpy

    def update_lipschitz(self, variables, n_iterations=None):
        params = list(variables["params"])
        states = list(variables["state"])
        for i, layer in enumerate(self.chain):
            v = layer.update_lipschitz({"params": params[i], "state": states[i]}, n_iterations)
            params[i], states[i] = v["params"], v["state"]
        return make_vars(params, states)

    def lipschitz_sigmas(self, variables):
        out = []
        for i, layer in enumerate(self.chain):
            out.extend(layer.lipschitz_sigmas(self.child_vars(variables, i)))
        return out

    def lipschitz_one_iter(self, variables):
        total, count = jnp.zeros(()), 0
        for i, layer in enumerate(self.chain):
            t, c = layer.lipschitz_one_iter(self.child_vars(variables, i))
            total, count = total + t, count + c
        return total, count

    def ords(self, variables):
        out = []
        for i, layer in enumerate(self.chain):
            out.extend(layer.ords(self.child_vars(variables, i)))
        return out


def _slice_vars(stacked, i):
    return jax.tree.map(lambda a: a[i], stacked)


class ScanRepeat(Flow):
    """``n`` copies of one structurally identical flow unit, executed as a
    single ``lax.scan`` over stacked per-copy variables.

    The reference's deep same-scale stacks (``n_blocks`` imBlocks per scale,
    implicit_flow.py:64-97; the CIFAR default is 16-16-16) unroll the block
    body N times through autograd. Under XLA that unrolling is paid at
    *compile* time: N structurally identical solve+estimator programs. Since
    every repeat at a scale shares one structure (same nets, same shapes),
    the TPU-native form stacks their params/state on a leading axis and scans
    — program size and compile time O(1) in depth, identical math per slice.

    The per-copy RNG is ``fold_rng(rng, i)`` with the scan index, matching
    what a hand-written loop over the same unit would draw (tests assert
    exact agreement with that loop).
    """

    def __init__(self, unit: Flow, n: int):
        assert n >= 1
        self.unit = unit
        self.n = int(n)

    # ---- construction ----
    def init(self, rng, x):
        # Scan units are shape-preserving by construction (fixed scan
        # carry), and parameter init consumes only shapes — so every slice
        # initialises against the same example batch and the whole stack is
        # ONE vmap over per-slice keys (O(1) program size, vs tracing n
        # separate unit inits).
        idx = jnp.arange(self.n)
        return jax.vmap(lambda i: self.unit.init(fold_rng(rng, i), x))(idx)

    def init_forward(self, variables, x, rng=None):
        def body(x, sl):
            v, i = sl
            return self.unit.init_forward(v, x, rng=fold_rng(rng, i)), None
        x, _ = jax.lax.scan(body, x, (variables, jnp.arange(self.n)))
        return x

    def init_with_batch(self, variables, x, rng=None):
        # Data-dependent init is inherently sequential (each slice sees the
        # activations of the already-initialised prefix) — expressed as a
        # scan with the activations as carry so the traced program stays
        # O(1) in depth.
        def body(x, sl):
            v, i = sl
            v = self.unit.init_with_batch(
                v, x, rng=fold_rng(rng, i) if rng is not None else None)
            x, _, _ = self.unit.forward(
                v, x, None,
                rng=fold_rng(rng, 10_000 + i) if rng is not None else None)
            return x, v
        _, out = jax.lax.scan(body, x, (variables, jnp.arange(self.n)))
        return out

    # ---- the flow protocol ----
    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        unit, idx = self.unit, jnp.arange(self.n)
        if logpx is None:
            def body(x, sl):
                v, i = sl
                y, _, s = unit.forward(v, x, None, rng=fold_rng(rng, i),
                                       train=train)
                return y, s
            y, new_state = jax.lax.scan(body, x, (variables, idx))
            return y, None, new_state

        def body(carry, sl):
            x, lp = carry
            v, i = sl
            y, lp, s = unit.forward(v, x, lp, rng=fold_rng(rng, i),
                                    train=train)
            return (y, lp), s
        (y, logpy), new_state = jax.lax.scan(body, (x, logpx), (variables, idx))
        return y, logpy, new_state

    def inverse(self, variables, y, logpy=None, *, rng=None):
        unit, idx = self.unit, jnp.arange(self.n)
        if logpy is None:
            def body(y, sl):
                v, i = sl
                x, _ = unit.inverse(v, y, None, rng=fold_rng(rng, i))
                return x, None
            x, _ = jax.lax.scan(body, y, (variables, idx), reverse=True)
            return x, None

        def body(carry, sl):
            y, lp = carry
            v, i = sl
            x, lp = unit.inverse(v, y, lp, rng=fold_rng(rng, i))
            return (x, lp), None
        (x, logpx), _ = jax.lax.scan(body, (y, logpy), (variables, idx),
                                     reverse=True)
        return x, logpx

    # ---- out-of-band maintenance ----
    def update_lipschitz(self, variables, n_iterations=None):
        # Slices are independent; scan (not vmap) keeps per-slice convs in
        # their native layout — vmapping conv kernels lowers to grouped
        # convolutions with worse MXU layouts.
        def body(_, v):
            return None, self.unit.update_lipschitz(v, n_iterations)
        _, out = jax.lax.scan(body, None, variables)
        return out

    def lipschitz_sigmas(self, variables):
        out = []
        for i in range(self.n):
            out.extend(self.unit.lipschitz_sigmas(_slice_vars(variables, i)))
        return out

    def lipschitz_one_iter(self, variables):
        total, count = jnp.zeros(()), 0
        for i in range(self.n):
            t, c = self.unit.lipschitz_one_iter(_slice_vars(variables, i))
            total, count = total + t, count + c
        return total, count

    def ords(self, variables):
        out = []
        for i in range(self.n):
            out.extend(self.unit.ords(_slice_vars(variables, i)))
        return out
