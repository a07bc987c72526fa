"""Profiling / tracing hooks.

The reference's only tracing is wall-clock seconds per epoch
(utils/logger_callback.py:100-101) and a TB graph dump
(utils/board_callback.py:42-43).  Here: real ``jax.profiler`` traces plus a
step timer, strictly more capability (SURVEY §5).

Usage::

    with trace_steps("/tmp/trace"):
        for _ in range(3):
            state, m = trainer.train_step(state, images, labels)
        float(m["total_loss"])   # sync

    t = StepTimer()
    ...
    t.step(images_in_batch)  # each step
    print(t.summary())
"""
from __future__ import annotations

import contextlib
import time
import numpy as np


@contextlib.contextmanager
def trace_steps(log_dir: str):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named trace span for host-side phases (data loading etc.)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Host-side step timing with throughput stats.

    NOTE (axon relay): ``jax.block_until_ready`` may not actually block;
    call ``float()`` on a step output before ``step()`` for true timing.
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times = []
        self._images = []
        self._last = time.perf_counter()

    def reset(self):
        self._last = time.perf_counter()

    def step(self, images: int = 0):
        now = time.perf_counter()
        self._times.append(now - self._last)
        self._images.append(images)
        self._last = now

    def summary(self) -> dict:
        times = np.asarray(self._times[self.warmup:])
        images = np.asarray(self._images[self.warmup:])
        if len(times) == 0:
            return {}
        return {
            "steps": int(len(times)),
            "mean_ms": float(times.mean() * 1e3),
            "p50_ms": float(np.percentile(times, 50) * 1e3),
            "p95_ms": float(np.percentile(times, 95) * 1e3),
            "images_per_sec": float(images.sum() / times.sum())
            if images.sum() else None,
        }
