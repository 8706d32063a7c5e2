"""Mean-only moving batch norm (reference: ``lib/layers/normalization.py``).

Volume-preserving (logp passes through, ``normalization.py:61-64``). The
running mean and step counter live in ``state`` and thread through forward —
the functional replacement for the reference's in-place buffer updates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .protocol import Flow, make_vars


class _MovingBatchNorm(Flow):
    def __init__(self, num_features, eps=1e-4, decay=0.1, bn_lag=0.0, affine=True):
        self.num_features = num_features
        self.eps = eps
        self.decay = decay
        self.bn_lag = bn_lag
        self.affine = affine

    @property
    def _shape(self):
        raise NotImplementedError

    def init(self, rng, x=None):
        params = {}
        if self.affine:
            params["bias"] = jnp.zeros((self.num_features,))
        state = {
            "running_mean": jnp.zeros((self.num_features,)),
            "step": jnp.zeros((1,)),
        }
        return make_vars(params, state)

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        c = self.num_features
        state = variables["state"]
        used_mean = state["running_mean"]

        if train:
            x_t = jnp.moveaxis(x, 1, 0).reshape(c, -1)
            batch_mean = jnp.mean(x_t, axis=1)
            if self.bn_lag > 0:
                used_mean = batch_mean - (1 - self.bn_lag) * (batch_mean - used_mean)
                used_mean = used_mean / (1.0 - self.bn_lag ** (state["step"][0] + 1))
            # NB: with bn_lag == 0 the reference normalises by the *old*
            # running mean, not the batch mean (normalization.py:36-50).
            new_state = {
                "running_mean": state["running_mean"]
                - self.decay * (state["running_mean"] - jax.lax.stop_gradient(batch_mean)),
                "step": state["step"] + 1,
            }
        else:
            new_state = state

        y = x - used_mean.reshape(self._shape)
        if self.affine:
            y = y + variables["params"]["bias"].reshape(self._shape)
        return y, logpx, new_state

    def inverse(self, variables, y, logpy=None, *, rng=None):
        if self.affine:
            y = y - variables["params"]["bias"].reshape(self._shape)
        x = y + variables["state"]["running_mean"].reshape(self._shape)
        return x, logpy


class MovingBatchNorm1d(_MovingBatchNorm):
    @property
    def _shape(self):
        return (1, -1)


class MovingBatchNorm2d(_MovingBatchNorm):
    @property
    def _shape(self):
        return (1, -1, 1, 1)
