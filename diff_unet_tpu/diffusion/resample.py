"""Timestep schedule samplers.

Capability parity with the reference's `guided_diffusion/resample.py`:
UniformSampler (resample.py:61-66, re-exported from gaussian.py) and
LossSecondMomentResampler (resample.py:69-153) — the importance sampler that
weights timesteps by the second moment of recent losses.

TPU redesign: the reference keeps per-timestep loss history in numpy and
synchronises per-batch losses across ranks with `dist.all_gather`
(resample.py:82-103). Here the sampler state is an explicit pytree
(history + counts) updated by a pure function, so it can live inside the
jitted train step; under pjit the batch is globally visible, making the
all_gather implicit (the update sees every shard's losses).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from diff_unet_tpu.diffusion.gaussian import uniform_timesteps  # noqa: F401


class LossAwareState(NamedTuple):
    """Ring buffer of the last `history` loss values per timestep."""
    losses: jnp.ndarray      # (T, history) float32
    counts: jnp.ndarray      # (T,) int32 — number of recorded losses


def init_loss_aware(num_timesteps: int, history: int = 10) -> LossAwareState:
    return LossAwareState(
        losses=jnp.zeros((num_timesteps, history), jnp.float32),
        counts=jnp.zeros((num_timesteps,), jnp.int32),
    )


def loss_aware_weights(state: LossAwareState,
                       uniform_prob: float = 0.001) -> jnp.ndarray:
    """Sampling distribution over timesteps (resample.py:135-142):
    p_t ∝ sqrt(E[loss_t^2]), mixed with a uniform floor; falls back to
    uniform until every timestep has a full history (warmed_up,
    resample.py:148-152)."""
    t_count = state.losses.shape[0]
    warmed = jnp.all(state.counts >= state.losses.shape[1])
    second_moment = jnp.sqrt(jnp.mean(jnp.square(state.losses), axis=-1))
    p = second_moment / jnp.maximum(jnp.sum(second_moment), 1e-12)
    p = p * (1.0 - uniform_prob) + uniform_prob / t_count
    uniform = jnp.full((t_count,), 1.0 / t_count)
    return jnp.where(warmed, p, uniform)


def sample_loss_aware(
    state: LossAwareState, rng: jax.Array, batch: int,
    uniform_prob: float = 0.001,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw (t, importance weights) from the loss-aware distribution
    (resample.py:42-58: weights = 1/(T*p[t]))."""
    p = loss_aware_weights(state, uniform_prob)
    t = jax.random.categorical(rng, jnp.log(p), shape=(batch,))
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def update_loss_aware(state: LossAwareState, t: jnp.ndarray,
                      losses: jnp.ndarray) -> LossAwareState:
    """Record per-example losses into each timestep's ring buffer
    (update_with_all_losses, resample.py:105-133). Vectorised scatter; when
    the same t appears multiple times in a batch the last write wins (the
    reference appends sequentially — statistically equivalent)."""
    history = state.losses.shape[1]
    slot = jnp.minimum(state.counts[t], history - 1)
    # shift-left full buffers, drop-oldest semantics
    full = state.counts[t] >= history
    row = state.losses[t]
    shifted = jnp.where(
        full[:, None],
        jnp.concatenate([row[:, 1:], row[:, :1]], axis=1),
        row,
    )
    new_rows = shifted.at[jnp.arange(t.shape[0]), slot].set(
        losses.astype(jnp.float32)
    )
    new_losses = state.losses.at[t].set(new_rows)
    new_counts = state.counts.at[t].set(
        jnp.minimum(state.counts[t] + 1, history)
    )
    return LossAwareState(new_losses, new_counts)
