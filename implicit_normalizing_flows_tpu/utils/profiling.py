"""Step-window profiler capture (SURVEY.md §5: the reference has only
wall-clock meters — ``train_img.py:581,663-664`` — the TPU build owes real
traces). Wraps ``jax.profiler`` so a driver can capture a bounded window of
training steps into a TensorBoard-readable trace directory.

Usage from a driver loop::

    prof = StepWindowProfiler(out_dir, start_step=5, n_steps=3)
    for i, batch in ...:
        prof.maybe_start(i)
        ... run step ...
        prof.maybe_stop(i)

The window is [start_step, start_step + n_steps); ``maybe_stop`` blocks on
device completion (``block_until_ready`` is the caller's job if it wants the
trace to contain whole steps — the async dispatch queue means a step's work
may execute after the host loop iteration that issued it, so the window is
padded by one step on each side in practice).
"""
from __future__ import annotations

import logging

import jax


class StepWindowProfiler:
    def __init__(self, out_dir: str | None, start_step: int = 5,
                 n_steps: int = 3):
        self.out_dir = out_dir
        self.start_step = start_step
        self.stop_step = start_step + n_steps
        self._active = False
        self._done = False

    def maybe_start(self, step: int) -> None:
        # ">=" not "==": on a resumed run the first observed step is
        # begin_epoch * steps_per_epoch, which may already be past
        # start_step — the window shifts to the first available steps
        # instead of silently never firing.
        if (self.out_dir is None or self._active or self._done
                or step < self.start_step):
            return
        if step > self.start_step:
            n = self.stop_step - self.start_step
            self.start_step = step
            self.stop_step = step + n
        try:
            # Silence the python/host tracers: the exported Chrome trace is
            # capped at ~1M events, and host-python spam can evict every
            # DEVICE event from the export (seen on the axon tunnel —
            # parse_trace then reports 0 ms device time). Device op events
            # are the entire point of the capture.
            opts = None
            try:
                opts = jax.profiler.ProfileOptions()
                opts.python_tracer_level = 0
                opts.host_tracer_level = 1
            except Exception:
                pass  # older jax: no options support
            if opts is not None:
                jax.profiler.start_trace(self.out_dir, profiler_options=opts)
            else:  # older jax: the kwarg itself doesn't exist either
                jax.profiler.start_trace(self.out_dir)
            self._active = True
            logging.getLogger().info(
                f"profiler: tracing steps [{self.start_step}, "
                f"{self.stop_step}) -> {self.out_dir}")
        except Exception as e:  # axon/tunnel backends may not support traces
            logging.getLogger().info(f"profiler start failed: {e}")
            self._done = True

    def should_block(self, step: int) -> bool:
        """True when the caller should block_until_ready before maybe_stop so
        the trace window contains whole steps (public accessor; callers
        shouldn't read the private _active/stop_step)."""
        return self._active and step >= self.stop_step - 1

    def maybe_stop(self, step: int) -> None:
        if not self._active or step < self.stop_step - 1:
            return
        try:
            jax.profiler.stop_trace()
        except Exception as e:
            logging.getLogger().info(f"profiler stop failed: {e}")
        self._active = False
        self._done = True
