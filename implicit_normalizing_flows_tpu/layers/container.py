"""Flow containers (reference: ``lib/layers/container.py``)."""
from __future__ import annotations

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
