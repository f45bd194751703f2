"""Profiling / tracing hooks (SURVEY.md §5.1).

The reference's only observability is wall-clock stage timers in
``base_detector.run`` and the progress bar's data/batch times; it has no
profiler integration.  Here the per-stage timers live in
``inference/detector.py`` (same breakdown as the reference) and this module
adds the TPU-native layer on top: ``jax.profiler`` traces viewable in
TensorBoard/Perfetto/XProf.

Usage:
  with step_trace_window(logdir, start=100, stop=110) as tick:
      for step, batch in ...:
          tick(step)              # starts/stops the trace at the window edges
          state, _ = train_step(state, batch)

  with trace("/tmp/profile"):    # trace an arbitrary region
      run_inference()
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str, host_only: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region into ``logdir``."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_trace_window(logdir: Optional[str], start: int, stop: int):
    """Yield a ``tick(step)`` callable tracing steps in [start, stop).

    No-op when ``logdir`` is falsy.  The caller invokes ``tick(step)`` at the
    top of every step; the trace starts when ``step == start`` and stops at
    ``step == stop`` (or on context exit if the loop ends early).
    """
    import jax

    if not logdir:
        yield lambda step: None
        return

    os.makedirs(logdir, exist_ok=True)
    active = [False]

    def tick(step: int) -> None:
        if step == start and not active[0]:
            jax.profiler.start_trace(logdir)
            active[0] = True
        elif step >= stop and active[0]:
            jax.profiler.stop_trace()
            active[0] = False

    try:
        yield tick
    finally:
        if active[0]:
            jax.profiler.stop_trace()


class StageTimer:
    """Accumulating named-stage wall timer (detector's tot/pre/net/dec/post).

    ``block`` optionally forces device completion before reading the clock so
    a stage's time covers its device work (the reference used
    torch.cuda.synchronize() the same way).
    """

    def __init__(self):
        self.times = {}
        self._t = None

    def start(self) -> None:
        self._t = time.time()

    def lap(self, name: str, block_on=None) -> float:
        if block_on is not None:
            try:
                import jax

                jax.block_until_ready(block_on)
            except Exception:
                pass
        now = time.time()
        dt = now - self._t
        self.times[name] = self.times.get(name, 0.0) + dt
        self._t = now
        return dt
