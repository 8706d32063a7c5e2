"""LR schedules: linear warmup (driver-level ``update_lr``,
``train_img.py:172-176``) and SGDR cosine annealing with warm restarts
(``lib/lr_scheduler.py:5-75``) as pure functions of the step/epoch."""
from __future__ import annotations

import math

import jax.numpy as jnp


def linear_warmup(base_lr: float, warmup_iters: int):
    """lr = base * min(1, itr / warmup) (train_img.py:172-176)."""

    def schedule(step):
        if warmup_iters <= 0:
            return jnp.asarray(base_lr)
        frac = jnp.minimum(1.0, (step + 1) / warmup_iters)
        return base_lr * frac

    return schedule


def cosine_annealing_warm_restarts(base_lr: float, T_0: int, T_mult: int = 1,
                                   eta_min: float = 0.0,
                                   warmup_iters: int = 0):
    """eta_min + (base - eta_min) * (1 + cos(pi * T_cur / T_i)) / 2 with the
    SGDR restart bookkeeping (lib/lr_scheduler.py:40-75). ``epoch`` may be a
    traced step count (jnp ops throughout, so the schedule lives inside the
    jitted optimizer like every other schedule here); the reference steps it
    per-iteration. Optional linear warmup multiplies on top (the reference's
    driver ``update_lr`` overwrote the scheduler during warmup,
    train_img.py:172-176)."""

    def schedule(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        if T_mult == 1:
            T_i = jnp.asarray(float(T_0))
            T_cur = jnp.mod(epoch, T_0)
        else:
            # restart index n = floor(log_Tmult(epoch/T_0*(Tmult-1)+1))
            n = jnp.floor(
                jnp.log(epoch / T_0 * (T_mult - 1) + 1) / math.log(T_mult))
            T_cur = epoch - T_0 * (T_mult ** n - 1) / (T_mult - 1)
            T_i = T_0 * T_mult ** n
        lr = eta_min + (base_lr - eta_min) * (1 + jnp.cos(math.pi * T_cur / T_i)) / 2
        if warmup_iters > 0:
            lr = lr * jnp.minimum(1.0, (epoch + 1) / warmup_iters)
        return lr

    return schedule


def warmup_then_constant(base_lr: float, warmup_iters: int):
    return linear_warmup(base_lr, warmup_iters)


def step_decay(base_lr: float, milestones, gamma: float = 0.1):
    """Classification driver schedule (train_classification.py:419-429)."""

    def schedule(epoch):
        lr = base_lr
        for m in milestones:
            if epoch >= m:
                lr *= gamma
        return lr

    return schedule
