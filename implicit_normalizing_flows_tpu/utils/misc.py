"""Small utilities for parity with lib/utils.py."""
from __future__ import annotations

import jax.numpy as jnp


def inf_generator(iterable):
    """Loop a finite iterable forever (utils.py:78-87)."""
    while True:
        yield from iterable


def logsumexp(value, axis=None, keepdims=False):
    """Numerically stable log-sum-exp (utils.py:106-123)."""
    m = jnp.max(value, axis=axis, keepdims=True)
    out = m + jnp.log(jnp.sum(jnp.exp(value - m), axis=axis, keepdims=True))
    if not keepdims:
        out = jnp.squeeze(out, axis=axis) if axis is not None else jnp.squeeze(out)
    return out
