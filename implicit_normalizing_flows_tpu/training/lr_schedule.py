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
                                   eta_min: float = 0.0):
    """eta_min + (base - eta_min) * (1 + cos(pi * T_cur / T_i)) / 2 with the
    SGDR restart bookkeeping (lr_scheduler.py:40-75). ``epoch`` may be
    fractional (the reference steps it per-iteration)."""

    def schedule(epoch):
        epoch = float(epoch)
        if epoch < T_0:
            T_i, T_cur = T_0, epoch
        elif T_mult == 1:
            T_i, T_cur = T_0, epoch % T_0
        else:
            n = int(math.log(epoch / T_0 * (T_mult - 1) + 1, T_mult))
            T_cur = epoch - T_0 * (T_mult ** n - 1) / (T_mult - 1)
            T_i = T_0 * T_mult ** n
        return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * T_cur / T_i)) / 2

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
