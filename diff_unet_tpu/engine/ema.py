"""Exponential moving average of parameters.

Capability parity with the reference's vendored guided-diffusion TrainLoop
EMA (guided_diffusion/train_util.py:22-255: per-rate ema_params updated each
step via nn.update_ema, saved as separate checkpoints) and the unused
update_ema helper (guided_diffusion/nn.py) — as a pure pytree transform that
composes with the jitted train step.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax


def init_ema(params: Any) -> Any:
    """EMA state starts as a REAL copy of the parameters (aliasing the same
    buffers breaks jit argument donation: the same buffer may not be donated
    twice)."""
    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.copy, params)


def update_ema(ema_params: Any, params: Any, rate: float = 0.9999) -> Any:
    """ema <- ema*rate + params*(1-rate), elementwise over the pytree."""
    return jax.tree_util.tree_map(
        lambda e, p: e * rate + p.astype(e.dtype) * (1.0 - rate),
        ema_params, params,
    )


class EmaTracker:
    """Multiple EMA rates tracked side-by-side (train_util.py keeps a list
    of ema_rate -> params copies)."""

    def __init__(self, params: Any, rates: Sequence[float] = (0.9999,)):
        self.rates = tuple(rates)
        self.ema = [init_ema(params) for _ in self.rates]
        self._update = jax.jit(update_ema, static_argnames=("rate",))

    def update(self, params: Any) -> None:
        self.ema = [
            self._update(e, params, rate=r)
            for e, r in zip(self.ema, self.rates)
        ]

    def get(self, rate: float = None) -> Any:
        if rate is None:
            return self.ema[0]
        return self.ema[self.rates.index(rate)]
