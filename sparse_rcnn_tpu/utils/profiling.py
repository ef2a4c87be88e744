"""Profiling helpers (SURVEY.md §5: jax.profiler + Perfetto traces)."""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def maybe_trace(enabled: bool, logdir: str = "/tmp/sparse_rcnn_tpu_trace"):
    """``--profile`` flag implementation: Perfetto-compatible device trace."""
    if not enabled:
        yield None
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield logdir
    print(f"[profile] trace written to {logdir} (load in Perfetto / XProf)")


def cost_table(jitted_fn, *args, **kwargs):
    """Per-program cost estimate from the compiled executable (SURVEY.md §5
    'per-kernel cost table from compiled HLO'). Returns a dict of XLA cost
    analysis keys (flops, bytes accessed, ...)."""
    lowered = jitted_fn.lower(*args, **kwargs)
    compiled = lowered.compile()
    analyses = compiled.cost_analysis()
    return analyses


class StepTimer:
    """Rolling scenes/sec measurement."""

    def __init__(self, batch_size: int, window: int = 20):
        self.batch_size = batch_size
        self.window = window
        self._times = []

    def tick(self) -> float:
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times.pop(0)
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) * self.batch_size / max(dt, 1e-9)
