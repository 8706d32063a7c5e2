"""Optimizers with the reference's exact update semantics, as optax-style
gradient transformations.

The reference ships forks of Adam/Adamax/RMSprop (``lib/optimizers.py``)
whose only intended change — decoupled weight decay applied after the step —
is a silent no-op (the non-inplace ``p.data.add(...)`` result is discarded:
``optimizers.py:104-105,186-187,286-287``), and whose drivers default
weight decay into the no-op path anyway (``train_img.py:79``). We therefore
implement the *effective* reference updates (plain torch-semantics
Adam/Adamax/RMSprop, no decay) and additionally expose a working
``weight_decay`` knob for users who want what the reference intended.

Torch Adam differs from optax.adam in where eps enters:
``step = lr * sqrt(bc2)/bc1 * m / (sqrt(v) + eps)`` — we reproduce it
exactly so optimizer trajectories match the reference step-for-step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _MomentState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def scale_by_torch_adam(b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam update rule (optimizers.py:86-105)."""

    def init_fn(params):
        return _MomentState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        scale = jnp.sqrt(bc2) / bc1
        new_updates = jax.tree.map(
            lambda m, v: -scale * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return new_updates, _MomentState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_torch_adamax(b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adamax update rule (optimizers.py:110-189):
    u = max(b2 * u, |g|); step = lr/bc1 * m / (u + eps)."""

    def init_fn(params):
        return _MomentState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda u, g: jnp.maximum(b2 * u, jnp.abs(g) + eps), state.nu, updates)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        new_updates = jax.tree.map(lambda m, u: -(m / bc1) / u, mu, nu)
        return new_updates, _MomentState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_torch_rmsprop(alpha=0.99, eps=1e-8, momentum=0.0, centered=False):
    """torch.optim.RMSprop update rule (optimizers.py:192-289)."""

    class State(NamedTuple):
        sq: optax.Updates
        mom: optax.Updates
        avg: optax.Updates

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return State(sq=z, mom=z, avg=z)

    def update_fn(updates, state, params=None):
        sq = jax.tree.map(lambda s, g: alpha * s + (1 - alpha) * g * g, state.sq, updates)
        if centered:
            avg = jax.tree.map(lambda a, g: alpha * a + (1 - alpha) * g, state.avg, updates)
            denom = jax.tree.map(lambda s, a: jnp.sqrt(s - a * a) + eps, sq, avg)
        else:
            avg = state.avg
            denom = jax.tree.map(lambda s: jnp.sqrt(s) + eps, sq)
        if momentum > 0:
            mom = jax.tree.map(lambda b, g, d: momentum * b + g / d, state.mom, updates, denom)
            new_updates = jax.tree.map(lambda b: -b, mom)
        else:
            mom = state.mom
            new_updates = jax.tree.map(lambda g, d: -g / d, updates, denom)
        return new_updates, State(sq=sq, mom=mom, avg=avg)

    return optax.GradientTransformation(init_fn, update_fn)


def _with_common(inner, lr_schedule, weight_decay, grad_clip):
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(inner)
    if weight_decay:
        # What the reference *intended* (decoupled decay after the step);
        # its implementation is a no-op, so default callers pass 0. Updates in
        # this chain are already descent-directed (negative), so the decay
        # term enters with a minus sign.
        chain.append(optax.add_decayed_weights(-weight_decay))
    chain.append(optax.scale_by_learning_rate(lr_schedule, flip_sign=False))
    return optax.chain(*chain)


def adam(lr_schedule, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, grad_clip=None):
    return _with_common(scale_by_torch_adam(betas[0], betas[1], eps),
                        lr_schedule, weight_decay, grad_clip)


def adamax(lr_schedule, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, grad_clip=None):
    return _with_common(scale_by_torch_adamax(betas[0], betas[1], eps),
                        lr_schedule, weight_decay, grad_clip)


def rmsprop(lr_schedule, alpha=0.99, eps=1e-8, momentum=0.0, centered=False,
            weight_decay=0.0, grad_clip=None):
    return _with_common(scale_by_torch_rmsprop(alpha, eps, momentum, centered),
                        lr_schedule, weight_decay, grad_clip)


def sgd(lr_schedule, momentum=0.9, weight_decay=0.0, grad_clip=None):
    """torch.optim.SGD with momentum (train_img.py optimizer='sgd' path)."""

    def init_fn(params):
        return jax.tree.map(jnp.zeros_like, params)

    def update_fn(updates, state, params=None):
        if momentum > 0:
            buf = jax.tree.map(lambda b, g: momentum * b + g, state, updates)
            return jax.tree.map(lambda b: -b, buf), buf
        return jax.tree.map(lambda g: -g, updates), state

    inner = optax.GradientTransformation(init_fn, update_fn)
    return _with_common(inner, lr_schedule, weight_decay, grad_clip)
