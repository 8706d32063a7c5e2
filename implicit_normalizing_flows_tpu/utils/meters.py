"""Metric meters (reference: ``lib/utils.py:40-87``)."""
from __future__ import annotations


class AverageMeter:
    """Running sum/count average (utils.py:40-56)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class RunningAverageMeter:
    """Exponentially-decayed average (utils.py:59-75)."""

    def __init__(self, momentum=0.99):
        self.momentum = momentum
        self.reset()

    def reset(self):
        self.val = None
        self.avg = 0.0

    def update(self, val):
        if self.val is None:
            self.avg = val
        else:
            self.avg = self.avg * self.momentum + val * (1 - self.momentum)
        self.val = val


class PackedMetrics:
    """Dict-like view over a step's metrics with all SCALARS packed into one
    device vector.

    Through the axon TPU tunnel every ``float(m[k])`` is a separate blocking
    device->host RPC (~10-30 ms); a reference-style log line reads ~8 scalars,
    which made the real driver loop ~2.5x slower than the bench harness on
    identical compute (round-3 profiling: train_img 157-166 ms/step vs bench
    64.5 ms/step). Packing means ONE transfer per step, materialised lazily on
    first scalar access. Non-scalar metrics (eval per-example vectors) pass
    through untouched.
    """

    def __init__(self, names, packed, rest):
        self._names = list(names)
        self._packed = packed
        self._rest = rest
        self._vals = None

    def _mat(self):
        if self._vals is None:
            import numpy as np

            self._vals = np.asarray(self._packed)  # the one transfer
        return self._vals

    def __contains__(self, k):
        return k in self._names or k in self._rest

    def __getitem__(self, k):
        if k in self._rest:
            return self._rest[k]
        if k not in self._names:
            raise KeyError(k)  # dict duck-typing: not list.index's ValueError
        return self._mat()[self._names.index(k)]

    def get(self, k, default=None):
        return self[k] if k in self else default

    def keys(self):
        return list(self._names) + list(self._rest.keys())

    def items(self):
        return [(k, self[k]) for k in self.keys()]

    def block(self):
        """Wait for the step's metrics to be computed on device."""
        import jax

        jax.block_until_ready(self._packed)
        return self


def make_metric_packer():
    """(pack, unpack) pair shared by the step builders: ``pack`` folds every
    SCALAR metric into one device vector (one device->host transfer per step
    through the tunnel) and passes non-scalar metrics through untouched;
    ``unpack`` restores the PackedMetrics dict view. Both step families
    (density and image) use this so a future non-scalar metric never fails
    at trace time in one of them (advisor round-3 finding)."""
    import jax.numpy as jnp

    packed_names = []  # filled at trace time by pack (stable: sorted)

    def pack(metrics):
        names = sorted(k for k, v in metrics.items() if jnp.ndim(v) == 0)
        packed_names[:] = names
        packed = (jnp.stack([metrics[k].astype(jnp.float32) for k in names])
                  if names else jnp.zeros((0,), jnp.float32))
        rest = {k: v for k, v in metrics.items() if jnp.ndim(v) != 0}
        return {"_packed": packed, **rest}

    def unpack(out):
        rest = {k: v for k, v in out.items() if k != "_packed"}
        return PackedMetrics(tuple(packed_names), out["_packed"], rest)

    return pack, unpack


class LaggedMetrics:
    """Defer per-step metric materialisation by one step.

    JAX dispatch is asynchronous, but the reference-style loop skeleton
    (``train_img.py:663-688``: ``float(metric)`` right after the step) turns
    every iteration into dispatch -> hard sync -> host work -> dispatch, so
    the device idles during meter updates, logging, and next-batch prep.
    Pushing metrics here and consuming them one step late means step N+1 is
    already enqueued when the host blocks on step N's scalars — host work
    rides under device compute.

    ``push(metrics, **ctx)`` hands over the (still-device-resident) metrics
    of the step just dispatched and materialises the *previous* step's via
    ``consume(metrics, **ctx)``. Call ``flush()`` after the loop.
    """

    def __init__(self, consume):
        self._consume = consume
        self._pending = None

    def push(self, metrics, **ctx):
        prev, self._pending = self._pending, (metrics, ctx)
        if prev is not None:
            self._consume(prev[0], **prev[1])

    def flush(self):
        prev, self._pending = self._pending, None
        if prev is not None:
            self._consume(prev[0], **prev[1])
