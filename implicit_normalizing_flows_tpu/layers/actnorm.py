"""Activation normalisation (reference: ``lib/layers/act_norm.py``).

Data-dependent init is the explicit ``init_with_batch`` pass instead of the
reference's first-forward lazy mutation (``act_norm.py:25-37``): bias is set
to -mean, log-scale to ``-0.5 log(max(var, 0.2))`` from the init batch.
"""
from __future__ import annotations

import jax.numpy as jnp

from .protocol import Flow, make_vars


class _ActNorm(Flow):
    def __init__(self, num_features, eps=1e-12):
        self.num_features = num_features
        self.eps = eps

    @property
    def _shape(self):
        raise NotImplementedError

    def init(self, rng, x=None):
        return make_vars(
            params={
                "weight": jnp.zeros((self.num_features,)),
                "bias": jnp.zeros((self.num_features,)),
            },
            state={"initialized": jnp.zeros((), jnp.int32)},
        )

    def init_with_batch(self, variables, x, rng=None):
        # channel-major batch stats (act_norm.py:27-36); var clamped >= 0.2
        c = self.num_features
        x_t = jnp.moveaxis(x, 1, 0).reshape(c, -1)
        batch_mean = jnp.mean(x_t, axis=1)
        batch_var = jnp.var(x_t, axis=1, ddof=1)
        batch_var = jnp.maximum(batch_var, 0.2)
        params = {
            "bias": -batch_mean,
            "weight": -0.5 * jnp.log(batch_var),
        }
        return make_vars(params, {"initialized": jnp.ones((), jnp.int32)})

    def _logdetgrad(self, variables, x):
        # weight summed over all non-batch dims (act_norm.py:62)
        n_per_channel = x.size // (x.shape[0] * self.num_features)
        return jnp.sum(variables["params"]["weight"]) * n_per_channel

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        shape = self._shape
        bias = variables["params"]["bias"].reshape(shape)
        weight = variables["params"]["weight"].reshape(shape)
        y = (x + bias) * jnp.exp(weight)
        if logpx is None:
            return y, None, variables["state"]
        # Flow convention (container threading): forward subtracts
        # logdet|dy/dx|, inverse adds it (act_norm.py:42-62).
        return y, logpx - self._logdetgrad(variables, x), variables["state"]

    def inverse(self, variables, y, logpy=None, *, rng=None):
        shape = self._shape
        bias = variables["params"]["bias"].reshape(shape)
        weight = variables["params"]["weight"].reshape(shape)
        x = y * jnp.exp(-weight) - bias
        if logpy is None:
            return x, None
        return x, logpy + self._logdetgrad(variables, x)


class ActNorm1d(_ActNorm):
    @property
    def _shape(self):
        return (1, -1)


class ActNorm2d(_ActNorm):
    @property
    def _shape(self):
        return (1, -1, 1, 1)
