"""Profiling / tracing hooks.

The reference has none (SURVEY.md §5: only tqdm rates and wall-clock
prints); this adds the TPU-native equivalents promised there:
`jax.profiler` trace capture around training steps and a lightweight
per-step timer that respects the axon relay's early-returning
block_until_ready (completion is forced with a host read).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace",
          create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def block_on(x) -> None:
    """Reliable completion barrier: host-read one element (the axon relay's
    block_until_ready can return before compute finishes)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = float(jnp.ravel(leaf)[0])


class StepTimer:
    """Rolling per-step wall-clock with compile-step exclusion."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.count = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.skip_first:
            self.total += dt

    @property
    def mean(self) -> float:
        steady = self.count - self.skip_first
        return self.total / steady if steady > 0 else float("nan")
