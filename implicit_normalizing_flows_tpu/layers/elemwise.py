"""Elementwise transforms (reference: ``lib/layers/elemwise.py``)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .protocol import Flow

_DEFAULT_ALPHA = 1e-6


class ZeroMeanTransform(Flow):
    """x - 0.5, volume preserving (elemwise.py:8-23)."""

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        return x - 0.5, logpx, variables["state"]

    def inverse(self, variables, y, logpy=None, *, rng=None):
        return y + 0.5, logpy


class Normalize(Flow):
    """Per-channel (mean, std) normalisation of the first len(mean) channels
    (classification init layer, elemwise.py:26-55)."""

    def __init__(self, mean, std):
        self.mean = jnp.asarray(mean, jnp.float32)
        self.std = jnp.asarray(std, jnp.float32)

    def _logdetgrad(self, x):
        per_pixel = -jnp.log(jnp.abs(self.std))
        return jnp.sum(per_pixel) * x.shape[2] * x.shape[3] * jnp.ones((x.shape[0],))

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        c = self.mean.shape[0]
        y = x.at[:, :c].set((x[:, :c] - self.mean[None, :, None, None]) / self.std[None, :, None, None])
        if logpx is None:
            return y, None, variables["state"]
        return y, logpx - self._logdetgrad(x), variables["state"]

    def inverse(self, variables, y, logpy=None, *, rng=None):
        c = self.mean.shape[0]
        x = y.at[:, :c].set(y[:, :c] * self.std[None, :, None, None] + self.mean[None, :, None, None])
        if logpy is None:
            return x, None
        return x, logpy + self._logdetgrad(x)


class LogitTransform(Flow):
    """RealNVP preprocessing: y = logit(alpha + (1-2 alpha) x)
    (elemwise.py:58-88)."""

    def __init__(self, alpha=_DEFAULT_ALPHA):
        self.alpha = alpha

    def _logdetgrad(self, x):
        s = self.alpha + (1 - 2 * self.alpha) * x
        per_elem = -jnp.log(s - s * s) + math.log(1 - 2 * self.alpha)
        return jnp.sum(per_elem.reshape(x.shape[0], -1), axis=1)

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        s = self.alpha + (1 - 2 * self.alpha) * x
        y = jnp.log(s) - jnp.log(1 - s)
        if logpx is None:
            return y, None, variables["state"]
        return y, logpx - self._logdetgrad(x), variables["state"]

    def inverse(self, variables, y, logpy=None, *, rng=None):
        x = (jax.nn.sigmoid(y) - self.alpha) / (1 - 2 * self.alpha)
        if logpy is None:
            return x, None
        return x, logpy + self._logdetgrad(x)
