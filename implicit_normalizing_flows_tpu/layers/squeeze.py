"""Space-to-depth squeeze (reference: ``lib/layers/squeeze.py``)."""
from __future__ import annotations

from .protocol import Flow


def squeeze(x, factor=2):
    """[B, C, H*r, W*r] -> [B, C*r^2, H, W] (squeeze.py:32-45)."""
    b, c, h, w = x.shape
    oh, ow = h // factor, w // factor
    x = x.reshape(b, c, oh, factor, ow, factor)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, c * factor * factor, oh, ow)


def unsqueeze(x, factor=2):
    """Inverse of ``squeeze`` — torch.pixel_shuffle semantics (squeeze.py:28-29)."""
    b, c, h, w = x.shape
    oc = c // (factor * factor)
    x = x.reshape(b, oc, factor, factor, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, oc, h * factor, w * factor)


class SqueezeLayer(Flow):
    """Volume-preserving (logp passes through)."""

    def __init__(self, downscale_factor=2):
        self.downscale_factor = downscale_factor

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        return squeeze(x, self.downscale_factor), logpx, variables["state"]

    def inverse(self, variables, y, logpy=None, *, rng=None):
        return unsqueeze(y, self.downscale_factor), logpy
