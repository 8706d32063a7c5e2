"""Plain (unconstrained) conv/dense modules for classification heads and
baseline nets (reference uses raw ``nn.Conv2d``/``nn.Linear`` there,
``lib/implicit_flow.py:177-187``)."""
from __future__ import annotations

import math

import jax

from ..layers.protocol import make_vars
from ..ops.power_iter import conv_apply


class PlainDense:
    def __init__(self, in_features, out_features, bias=True):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias

    def init(self, rng, x=None):
        kw, kb = jax.random.split(rng)
        bound = 1.0 / math.sqrt(self.in_features)
        params = {
            "weight": jax.random.uniform(
                kw, (self.out_features, self.in_features), minval=-bound, maxval=bound
            )
        }
        if self.use_bias:
            params["bias"] = jax.random.uniform(
                kb, (self.out_features,), minval=-bound, maxval=bound
            )
        return make_vars(params)

    def apply(self, variables, x, *, rng=None, train=False):
        y = x @ variables["params"]["weight"].T
        if self.use_bias:
            y = y + variables["params"]["bias"]
        return y

    def update_lipschitz(self, variables, n_iterations=None):
        return variables

    def lipschitz_sigmas(self, variables):
        return []


class PlainConv2d:
    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0, bias=True):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        self.stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
        self.padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
        self.use_bias = bias

    def init(self, rng, x=None):
        kw, kb = jax.random.split(rng)
        fan_in = self.in_channels * self.kernel_size[0] * self.kernel_size[1]
        bound = 1.0 / math.sqrt(fan_in)
        params = {
            "weight": jax.random.uniform(
                kw, (self.out_channels, self.in_channels) + self.kernel_size,
                minval=-bound, maxval=bound,
            )
        }
        if self.use_bias:
            params["bias"] = jax.random.uniform(
                kb, (self.out_channels,), minval=-bound, maxval=bound
            )
        return make_vars(params)

    def apply(self, variables, x, *, rng=None, train=False):
        y = conv_apply(variables["params"]["weight"], x, self.stride, self.padding)
        if self.use_bias:
            y = y + variables["params"]["bias"][None, :, None, None]
        return y

    def update_lipschitz(self, variables, n_iterations=None):
        return variables

    def lipschitz_sigmas(self, variables):
        return []
