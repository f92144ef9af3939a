"""Persistent XLA compilation cache — one shared enabling helper.

The cache cuts serving cold-start ~3.2x on the big sliding-window programs
(BASELINE.md r3). Every entry point (Engine, bench.py, benchmarks/*,
tests/conftest.py) funnels through `enable()` so the policy lives in one
place: an explicitly configured cache dir (e.g. the test suite's isolated
`xla-test` dir) is never clobbered by a later default-path call.
"""
from __future__ import annotations

from pathlib import Path

import jax

DEFAULT_DIR = str(Path.home() / ".cache" / "diff_unet_tpu" / "xla")


def enable(path: str | None = None, *, min_compile_secs: int = 5) -> bool:
    """Point JAX's persistent compilation cache at `path`.

    `path=None` uses DEFAULT_DIR — but only when no cache dir is configured
    yet, so library construction (Engine.__init__) cannot override an
    explicit process-level choice. An explicit `path` always wins.
    Returns True when the cache is (already or newly) enabled.
    """
    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:       # older jax without the knob
        return False
    if path is None and current:
        return True
    try:
        jax.config.update("jax_compilation_cache_dir", path or DEFAULT_DIR)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    except Exception:
        return False
    return True
