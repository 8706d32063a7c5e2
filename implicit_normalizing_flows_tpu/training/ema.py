"""Exponential moving average over the params pytree
(reference: ``ExponentialMovingAverage``, ``lib/utils.py:126-169``;
decay 0.999 default: ``utils.py:128``)."""
from __future__ import annotations

import jax


def ema_init(params):
    return jax.tree.map(lambda p: p, params)


def ema_apply(shadow, params, decay=0.999):
    """shadow -= (1 - decay) * (shadow - params) (utils.py:140-146)."""
    return jax.tree.map(lambda s, p: s - (1.0 - decay) * (s - p), shadow, params)


def ema_swap(shadow, params):
    """Swap shadow <-> live (utils.py:160-164). Returns (new_shadow, new_params)."""
    return params, shadow
