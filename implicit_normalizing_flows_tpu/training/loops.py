"""Shared density-training step builders (the loop skeleton of
``train_toy.py:285-351`` / ``train_tabular.py`` / ``train_img.py:591-694``):
loss -> grad -> clip -> optimizer -> post-step ``update_lipschitz`` -> EMA,
all fused into ONE jitted step (the reference runs each of these as separate
host-driven phases)."""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..layers.protocol import make_vars
from .ema import ema_apply


def standard_normal_logprob(z):
    """Per-example sum log N(z; 0, I) (train_toy.py:100-102)."""
    logZ = -0.5 * math.log(2 * math.pi)
    return jnp.sum(logZ - z ** 2 / 2, axis=tuple(range(1, z.ndim)))


def make_density_train_step(model, optimizer, *, n_lipschitz_iters=None,
                            ema_decay=0.999, mesh=None, in_shardings=None):
    """Build the jitted train step for a Flow-protocol density model
    (SequentialFlow chains: toy/tabular).

    Returned step: (params, state, opt_state, ema_shadow, x, rng, beta)
    -> (params, state, opt_state, ema_shadow, metrics dict).
    """

    def loss_fn(params, state, x, rng, beta):
        zeros = jnp.zeros((x.shape[0],), x.dtype)
        z, delta_logp, new_state = model.forward(
            make_vars(params, state), x, zeros, rng=rng, train=True
        )
        logpz = standard_normal_logprob(z)
        logpx = logpz - beta * delta_logp
        loss = -jnp.mean(logpx)
        return loss, (new_state, jnp.mean(logpz), jnp.mean(-delta_logp))

    def step(params, state, opt_state, ema_shadow, x, rng, beta):
        (loss, (new_state, logpz, neg_delta)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, state, x, rng, beta)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # Post-step power iteration, same schedule as the reference
        # (update_lipschitz after every optimizer step, train_img.py:657).
        v = model.update_lipschitz(make_vars(params, new_state), n_lipschitz_iters)
        params, new_state = v["params"], v["state"]
        ema_shadow = ema_apply(ema_shadow, params, ema_decay)
        metrics = {
            "loss": loss,
            "logpz": logpz,
            "delta_logp": neg_delta,
            "grad_norm": optax.global_norm(grads),
        }
        return params, new_state, opt_state, ema_shadow, metrics

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        rep = replicated(mesh)
        xs = in_shardings if in_shardings is not None else batch_sharding(mesh, 2)
        return jax.jit(
            step,
            in_shardings=(rep, rep, rep, rep, xs, rep, rep),
            out_shardings=(rep, rep, rep, rep, rep),
        )
    return jax.jit(step)


def make_density_eval_step(model, *, mesh=None, in_shardings=None):
    """Eval loss (basic estimator with the test exact-term budget kicks in via
    train=False inside the blocks)."""

    def step(params, state, x, rng):
        zeros = jnp.zeros((x.shape[0],), x.dtype)
        z, delta_logp, _ = model.forward(
            make_vars(params, state), x, zeros, rng=rng, train=False
        )
        logpz = standard_normal_logprob(z)
        loss = -jnp.mean(logpz - delta_logp)
        return loss, jnp.mean(logpz), jnp.mean(-delta_logp)

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        rep = replicated(mesh)
        xs = in_shardings if in_shardings is not None else batch_sharding(mesh, 2)
        return jax.jit(step, in_shardings=(rep, rep, xs, rep))
    return jax.jit(step)
