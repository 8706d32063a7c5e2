"""1-Lipschitz activations (reference: ``lib/layers/base/activations.py``).

Activations follow the ``Net`` protocol (init/apply) so they slot into the
residual nets inside implicit blocks. All are elementwise VPU ops that XLA
fuses into the surrounding matmuls/convs; no custom autograd is needed (the
reference's hand-written ``SwishFn`` backward, ``activations.py:46-61``, is
just what JAX derives automatically).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .protocol import make_vars


class Activation:
    """Stateless elementwise net."""

    def init(self, rng, x):
        return make_vars()

    def apply(self, variables, x, *, rng=None, train=False):
        return self._fn(x)

    def _fn(self, x):
        raise NotImplementedError

    # Net-protocol no-ops so activations compose in LipschitzNet.
    def update_lipschitz(self, variables, n_iterations=None):
        return variables

    def lipschitz_sigmas(self, variables):
        return []


class Sin(Activation):
    """sin(2 pi x) / (2 pi)  (activations.py:7-12)."""

    def _fn(self, x):
        return jnp.sin(2.0 * math.pi * x) / math.pi * 0.5


class Identity(Activation):
    def _fn(self, x):
        return x


class Zero(Activation):
    def _fn(self, x):
        return jnp.zeros_like(x)


class FullSort(Activation):
    """Sort features ascending (activations.py:25-28); norm-preserving."""

    def _fn(self, x):
        return jnp.sort(x, axis=1)


class MaxMin(Activation):
    """Pairwise max/min split (activations.py:31-37)."""

    def _fn(self, x):
        b, d = x.shape
        pairs = x.reshape(b, d // 2, 2)
        return jnp.concatenate([jnp.max(pairs, 2), jnp.min(pairs, 2)], axis=1)


class LipschitzCube(Activation):
    """Piecewise cubic with |f'| <= 1 (activations.py:40-43)."""

    def _fn(self, x):
        return (
            (x >= 1) * (x - 2 / 3)
            + (x <= -1) * (x + 2 / 3)
            + ((x > -1) & (x < 1)) * x ** 3 / 3
        ).astype(x.dtype)


class ReLU(Activation):
    def _fn(self, x):
        return jax.nn.relu(x)


class ELU(Activation):
    def _fn(self, x):
        return jax.nn.elu(x)


class SELU(Activation):
    def _fn(self, x):
        return jax.nn.selu(x)


class Tanh(Activation):
    def _fn(self, x):
        return jnp.tanh(x)


class Softplus(Activation):
    def _fn(self, x):
        return jax.nn.softplus(x)


class Swish(Activation):
    """x * sigmoid(x * softplus(beta)) / 1.1 with learnable beta
    (activations.py:64-71; the 1/1.1 keeps |f'| <= 1)."""

    def init(self, rng, x):
        return make_vars(params={"beta": jnp.asarray([0.5], jnp.float32)})

    def apply(self, variables, x, *, rng=None, train=False):
        beta = jax.nn.softplus(variables["params"]["beta"])
        return x * jax.nn.sigmoid(x * beta) / 1.1


ACT_FNS = {
    "softplus": Softplus,
    "elu": ELU,
    "swish": Swish,
    "lcube": LipschitzCube,
    "identity": Identity,
    "relu": ReLU,
    "sin": Sin,
    "zero": Zero,
    "tanh": Tanh,
    "selu": SELU,
    "fullsort": FullSort,
    "maxmin": MaxMin,
}
