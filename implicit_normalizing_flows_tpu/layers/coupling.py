"""RealNVP coupling blocks (reference: ``lib/layers/coupling.py`` +
``mask_utils.py``). The scale is ``sigmoid(s + 2)`` (coupling.py:65)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .protocol import Flow


def checkerboard_mask(shape, swap=False, dtype=jnp.float32):
    """(1, 1, h, w) checkerboard, broadcastable (mask_utils.py:4-18)."""
    _, _, h, w = shape
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    mask = ((rows + cols) % 2 == (1 if swap else 0)).astype(dtype)
    return mask[None, None]


def channel_mask(shape, swap=False, dtype=jnp.float32):
    """(1, c, 1, 1) first/second-half channel mask (mask_utils.py:21-31)."""
    c = shape[1]
    mask = jnp.zeros((c,), dtype)
    if not swap:
        mask = mask.at[: c // 2].set(1)
    else:
        mask = mask.at[c // 2:].set(1)
    return mask[None, :, None, None]


def get_mask(shape, mask_type=None, dtype=jnp.float32):
    if mask_type is None:
        return jnp.zeros(shape, dtype)
    if mask_type == "channel0":
        return channel_mask(shape, swap=False, dtype=dtype)
    if mask_type == "channel1":
        return channel_mask(shape, swap=True, dtype=dtype)
    if mask_type == "checkerboard0":
        return checkerboard_mask(shape, swap=False, dtype=dtype)
    if mask_type == "checkerboard1":
        return checkerboard_mask(shape, swap=True, dtype=dtype)
    raise ValueError(f"Unknown mask type {mask_type}")


class CouplingBlock(Flow):
    """Split-on-axis-1 affine coupling (coupling.py:8-87).

    ``nnet`` maps x_a -> (s, t) stacked on axis 1 and follows the Net
    protocol (init/apply).
    """

    def __init__(self, dim, nnet, swap=False):
        assert dim % 2 == 0
        self.d = dim // 2
        self.nnet = nnet
        self.swap = swap

    def init(self, rng, x):
        xa = x[:, : self.d] if x.ndim == 2 else x[:, : self.d]
        return self.nnet.init(rng, xa)

    def _s_t(self, variables, x_a, rng, train):
        f = self.nnet.apply(variables, x_a, rng=rng, train=train)
        return f[:, : self.d], f[:, self.d:]

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        x_a = x[:, : self.d] if not self.swap else x[:, self.d:]
        x_b = x[:, self.d:] if not self.swap else x[:, : self.d]
        s_a, t_a = self._s_t(variables, x_a, rng, train)
        scale = jax.nn.sigmoid(s_a + 2.0)
        y_b = x_b * scale + t_a
        y = jnp.concatenate([x_a, y_b] if not self.swap else [y_b, x_a], axis=1)
        if logpx is None:
            return y, None, variables["state"]
        logdet = jnp.sum(jnp.log(scale).reshape(x.shape[0], -1), axis=1)
        return y, logpx - logdet, variables["state"]

    def inverse(self, variables, y, logpy=None, *, rng=None):
        y_a = y[:, : self.d] if not self.swap else y[:, self.d:]
        y_b = y[:, self.d:] if not self.swap else y[:, : self.d]
        s_a, t_a = self._s_t(variables, y_a, rng, False)
        scale = jax.nn.sigmoid(s_a + 2.0)
        x_b = (y_b - t_a) / scale
        x = jnp.concatenate([y_a, x_b] if not self.swap else [x_b, y_a], axis=1)
        if logpy is None:
            return x, None
        logdet = jnp.sum(jnp.log(scale).reshape(y.shape[0], -1), axis=1)
        return x, logpy + logdet


class ChannelCouplingBlock(CouplingBlock):
    """Channel-wise coupling for images (coupling.py:89-104)."""

    def __init__(self, dim, nnet, mask_type="channel0"):
        if mask_type == "channel0":
            swap = False
        elif mask_type == "channel1":
            swap = True
        else:
            raise ValueError("Unknown mask type.")
        super().__init__(dim, nnet, swap)
        self.mask_type = mask_type


class MaskedCouplingBlock(Flow):
    """Checkerboard-masked coupling for images (coupling.py:107-155)."""

    def __init__(self, dim, nnet, mask_type="checkerboard0"):
        self.d = dim
        self.nnet = nnet
        self.mask_type = mask_type

    def init(self, rng, x):
        return self.nnet.init(rng, x)

    def _s_t(self, variables, x, rng, train):
        f = self.nnet.apply(variables, x, rng=rng, train=train)
        s = jax.nn.sigmoid(f[:, : self.d] + 2.0)
        t = f[:, self.d:]
        return s, t

    def _logdet(self, s, mask):
        return jnp.sum((jnp.log(s) * (1 - mask)).reshape(s.shape[0], -1), axis=1)

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        b = get_mask(x.shape, self.mask_type, x.dtype)
        x_a = b * x
        s, t = self._s_t(variables, x_a, rng, train)
        y = (x * s + t) * (1 - b) + x_a
        if logpx is None:
            return y, None, variables["state"]
        return y, logpx - self._logdet(s, b), variables["state"]

    def inverse(self, variables, y, logpy=None, *, rng=None):
        b = get_mask(y.shape, self.mask_type, y.dtype)
        y_a = b * y
        s, t = self._s_t(variables, y_a, rng, False)
        x = y_a + (1 - b) * (y - t) / s
        if logpy is None:
            return x, None
        return x, logpy + self._logdet(s, b)
