"""Invertible 1x1 ("quadratic"/glow) layers (reference: ``lib/layers/glow.py``).

Permutation-initialised dense weight; logdet = log|det W| (x H*W for conv);
inverse uses the explicit matrix inverse (glow.py:21,50) — a small O(C^3) op
that XLA runs on-chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .protocol import Flow, make_vars


class InvertibleLinear(Flow):
    def __init__(self, dim):
        self.dim = dim

    def init(self, rng, x=None):
        perm = jax.random.permutation(rng, self.dim)
        return make_vars(params={"weight": jnp.eye(self.dim)[perm]})

    def _logdet(self, w):
        return jnp.linalg.slogdet(w)[1]

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        w = variables["params"]["weight"]
        y = x @ w.T
        if logpx is None:
            return y, None, variables["state"]
        return y, logpx - self._logdet(w), variables["state"]

    def inverse(self, variables, y, logpy=None, *, rng=None):
        w = variables["params"]["weight"]
        x = y @ jnp.linalg.inv(w).T
        if logpy is None:
            return x, None
        return x, logpy + self._logdet(w)


class InvertibleConv2d(Flow):
    def __init__(self, dim):
        self.dim = dim

    def init(self, rng, x=None):
        perm = jax.random.permutation(rng, self.dim)
        return make_vars(params={"weight": jnp.eye(self.dim)[perm]})

    def _logdet(self, w):
        return jnp.linalg.slogdet(w)[1]

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        w = variables["params"]["weight"]
        y = jnp.einsum("oi,bihw->bohw", w, x)
        if logpx is None:
            return y, None, variables["state"]
        logdet = self._logdet(w) * x.shape[2] * x.shape[3]
        return y, logpx - logdet, variables["state"]

    def inverse(self, variables, y, logpy=None, *, rng=None):
        w = variables["params"]["weight"]
        x = jnp.einsum("oi,bihw->bohw", jnp.linalg.inv(w), y)
        if logpy is None:
            return x, None
        logdet = self._logdet(w) * y.shape[2] * y.shape[3]
        return x, logpy + logdet
