"""Toy density/sample visualisation (reference: ``lib/visualize_flow.py``):
a triptych of [data samples | model density | model samples], with the model
density evaluated by the forward transform + change of variables on a grid
(``visualize_flow.py:62-87``) and model samples drawn by the inverse solve
(``visualize_flow.py:112-132``).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _chunked(fn, x, chunk=4096):
    outs = []
    for i in range(0, x.shape[0], chunk):
        outs.append(np.asarray(fn(x[i:i + chunk])))
    return np.concatenate(outs)


def plt_samples(samples, ax, npts=100, low=-4, high=4):
    ax.hist2d(samples[:, 0], samples[:, 1], range=[[low, high], [low, high]], bins=npts)
    ax.invert_yaxis()
    ax.get_xaxis().set_ticks([])
    ax.get_yaxis().set_ticks([])


def plt_flow_density(logdensity_fn, ax, npts=100, low=-4, high=4):
    side = np.linspace(low, high, npts)
    xx, yy = np.meshgrid(side, side)
    grid = np.stack([xx.reshape(-1), yy.reshape(-1)], 1).astype(np.float32)
    logpx = _chunked(logdensity_fn, jnp.asarray(grid))
    px = np.exp(logpx).reshape(npts, npts)
    ax.imshow(px)
    ax.get_xaxis().set_ticks([])
    ax.get_yaxis().set_ticks([])


def visualize_transform(fig, p_samples, sample_fn, logdensity_fn, npts=100):
    """Three panels like visualize_flow.py:112-132."""
    ax = fig.add_subplot(1, 3, 1)
    plt_samples(np.asarray(p_samples), ax, npts=npts)
    ax.set_title("data")
    ax = fig.add_subplot(1, 3, 2)
    plt_flow_density(logdensity_fn, ax, npts=npts)
    ax.set_title("model density")
    ax = fig.add_subplot(1, 3, 3)
    model_samples = np.asarray(sample_fn())
    plt_samples(model_samples, ax, npts=npts)
    ax.set_title("model samples")
