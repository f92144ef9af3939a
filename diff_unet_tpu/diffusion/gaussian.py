"""Gaussian diffusion math as pure JAX functions.

Capability parity with the reference `guided_diffusion/gaussian_diffusion.py`
(GaussianDiffusion, q_sample :187, q_posterior_mean_variance :207,
p_mean_variance :231-326, prediction conversions :328-349, VLB terms :718,
training_losses :753) and `guided_diffusion/{nn,losses}.py` (mean_flat nn.py:86,
normal_kl / discretized_gaussian_log_likelihood losses.py:12-77) — redesigned
as stateless functions over a `Schedule` of precomputed tables, with explicit
RNG keys instead of global torch RNG, and enums as plain strings so they stay
trace-friendly.

`denoise_fn(x, t)` below always receives *raw* (unrespaced) timesteps — the
respace index mapping is applied by the caller via `Schedule.map_timesteps`,
replacing the reference's `_WrappedModel` object wrapper (respace.py:116-129).
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from diff_unet_tpu.diffusion.schedule import Schedule, extract

# Model mean parameterisations (reference ModelMeanType, gaussian_diffusion.py:65)
PREVIOUS_X = "previous_x"
START_X = "start_x"
EPSILON = "epsilon"

# Model variance parameterisations (reference ModelVarType, gaussian_diffusion.py:75)
LEARNED = "learned"
LEARNED_RANGE = "learned_range"
FIXED_SMALL = "fixed_small"
FIXED_LARGE = "fixed_large"

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dimensions (reference nn.py:86)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL divergence between two diagonal Gaussians (reference losses.py:12)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x ** 3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a discretized (255-bin) Gaussian (reference losses.py:50)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12, None))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12, None))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, 1e-12, None)),
        ),
    )
    return log_probs


def q_mean_variance(schedule: Schedule, x_start, t):
    """Distribution q(x_t | x_0) (gaussian_diffusion.py:170-185)."""
    nd = x_start.ndim
    mean = extract(schedule.sqrt_alphas_cumprod, t, nd) * x_start
    variance = extract(1.0 - schedule.alphas_cumprod, t, nd)
    log_variance = extract(schedule.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(schedule: Schedule, x_start, t, noise):
    """Sample x_t ~ q(x_t | x_0) (gaussian_diffusion.py:187-205)."""
    nd = x_start.ndim
    return (
        extract(schedule.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(schedule.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(schedule: Schedule, x_start, x_t, t):
    """Posterior q(x_{t-1} | x_t, x_0) (gaussian_diffusion.py:207-229)."""
    nd = x_t.ndim
    mean = (
        extract(schedule.posterior_mean_coef1, t, nd) * x_start
        + extract(schedule.posterior_mean_coef2, t, nd) * x_t
    )
    variance = extract(schedule.posterior_variance, t, nd)
    log_variance = extract(schedule.posterior_log_variance_clipped, t, nd)
    return mean, variance, log_variance


def predict_xstart_from_eps(schedule: Schedule, x_t, t, eps):
    nd = x_t.ndim
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(schedule.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_xstart_from_xprev(schedule: Schedule, x_t, t, xprev):
    nd = x_t.ndim
    return (
        extract(1.0 / schedule.posterior_mean_coef1, t, nd) * xprev
        - extract(
            schedule.posterior_mean_coef2 / schedule.posterior_mean_coef1, t, nd
        )
        * x_t
    )


def predict_eps_from_xstart(schedule: Schedule, x_t, t, pred_xstart):
    nd = x_t.ndim
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / extract(schedule.sqrt_recipm1_alphas_cumprod, t, nd)


class PMeanVariance(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray
    model_output: jnp.ndarray


def p_mean_variance(
    denoise_fn: DenoiseFn,
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: str = START_X,
    var_type: str = FIXED_LARGE,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
) -> PMeanVariance:
    """Model distribution p(x_{t-1} | x_t) and x_0 prediction.

    Parity with gaussian_diffusion.py:231-326 over all mean/variance
    parameterisations. `t` indexes the (possibly respaced) `schedule`; the
    model is invoked with raw timesteps via `schedule.map_timesteps`.
    """
    nd = x.ndim
    model_output = denoise_fn(x, schedule.map_timesteps(t))

    if var_type in (LEARNED, LEARNED_RANGE):
        c = x.shape[-1]
        assert model_output.shape[-1] == 2 * c
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        if var_type == LEARNED:
            log_variance = model_var_values
            variance = jnp.exp(log_variance)
        else:
            min_log = extract(schedule.posterior_log_variance_clipped, t, nd)
            max_log = extract(jnp.log(schedule.betas), t, nd)
            frac = (model_var_values + 1.0) / 2.0
            log_variance = frac * max_log + (1.0 - frac) * min_log
            variance = jnp.exp(log_variance)
    elif var_type == FIXED_LARGE:
        variance = extract(schedule.fixed_large_variance, t, nd)
        log_variance = extract(schedule.fixed_large_log_variance, t, nd)
    elif var_type == FIXED_SMALL:
        variance = extract(schedule.posterior_variance, t, nd)
        log_variance = extract(schedule.posterior_log_variance_clipped, t, nd)
    else:
        raise NotImplementedError(var_type)

    def process_xstart(v):
        if denoised_fn is not None:
            v = denoised_fn(v)
        if clip_denoised:
            v = jnp.clip(v, -1.0, 1.0)
        return v

    if mean_type == PREVIOUS_X:
        pred_xstart = process_xstart(
            predict_xstart_from_xprev(schedule, x, t, model_output)
        )
        mean = model_output
    elif mean_type in (START_X, EPSILON):
        if mean_type == START_X:
            pred_xstart = process_xstart(model_output)
        else:
            pred_xstart = process_xstart(
                predict_xstart_from_eps(schedule, x, t, model_output)
            )
        mean, _, _ = q_posterior_mean_variance(schedule, pred_xstart, x, t)
    else:
        raise NotImplementedError(mean_type)

    return PMeanVariance(mean, variance, log_variance, pred_xstart, model_output)


def vb_terms_bpd(
    denoise_fn: DenoiseFn,
    schedule: Schedule,
    x_start,
    x_t,
    t,
    *,
    mean_type: str = START_X,
    var_type: str = FIXED_LARGE,
    clip_denoised: bool = True,
):
    """Variational lower-bound terms in bits-per-dim (gaussian_diffusion.py:718-751)."""
    true_mean, _, true_log_var = q_posterior_mean_variance(
        schedule, x_start, x_t, t
    )
    out = p_mean_variance(
        denoise_fn, schedule, x_t, t,
        mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
    )
    kl = normal_kl(true_mean, true_log_var, out.mean, out.log_variance)
    kl = mean_flat(kl) / math.log(2.0)

    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out.mean, log_scales=0.5 * out.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / math.log(2.0)

    # At t == 0 return the decoder NLL, otherwise the KL term.
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out.pred_xstart}


def training_losses(
    denoise_fn: DenoiseFn,
    schedule: Schedule,
    x_start,
    t,
    rng: jax.Array,
    *,
    mean_type: str = START_X,
    var_type: str = FIXED_LARGE,
    loss_type: str = "mse",
    noise: Optional[jnp.ndarray] = None,
):
    """Per-example diffusion training losses (gaussian_diffusion.py:753-826).

    loss_type: "mse" | "rescaled_mse" | "kl" | "rescaled_kl".
    The live Diff-UNet path computes its segmentation loss externally
    (reference train.py:268-273); this exists for full guided-diffusion
    capability parity.
    """
    if noise is None:
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
    x_t = q_sample(schedule, x_start, t, noise)

    if loss_type in ("kl", "rescaled_kl"):
        vb = vb_terms_bpd(
            denoise_fn, schedule, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=False,
        )
        loss = vb["output"]
        if loss_type == "rescaled_kl":
            loss = loss * schedule.num_timesteps
        return {"loss": loss, "pred_xstart": vb["pred_xstart"]}

    if loss_type in ("mse", "rescaled_mse"):
        model_output = denoise_fn(x_t, schedule.map_timesteps(t))
        terms = {}
        if var_type in (LEARNED, LEARNED_RANGE):
            c = x_t.shape[-1]
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            # Learn the variance with the VLB but freeze the mean prediction.
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
            )
            vb = vb_terms_bpd(
                lambda *_: frozen, schedule, x_start, x_t, t,
                mean_type=mean_type, var_type=var_type, clip_denoised=False,
            )
            terms["vb"] = vb["output"]
            if loss_type == "rescaled_mse":
                terms["vb"] = terms["vb"] * (schedule.num_timesteps / 1000.0)

        target = {
            PREVIOUS_X: q_posterior_mean_variance(schedule, x_start, x_t, t)[0],
            START_X: x_start,
            EPSILON: noise,
        }[mean_type]
        terms["mse"] = mean_flat((target - model_output) ** 2)
        terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
        return terms

    raise NotImplementedError(loss_type)


def uniform_timesteps(rng: jax.Array, batch: int, num_timesteps: int):
    """Uniform schedule sampler (reference resample.py:61-66).

    Returns (t, weights); weights are 1 for the uniform sampler.
    """
    t = jax.random.randint(rng, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,), jnp.float32)


def prior_bpd(schedule: Schedule, x_start: jnp.ndarray) -> jnp.ndarray:
    """Prior KL(q(x_T|x_0) || N(0,1)) in bits/dim (gaussian_diffusion.py:828-845)."""
    t = jnp.full((x_start.shape[0],), schedule.num_timesteps - 1, jnp.int32)
    mean, _, log_var = q_mean_variance(schedule, x_start, t)
    kl = normal_kl(mean, log_var, 0.0, 0.0)
    return mean_flat(kl) / math.log(2.0)


def calc_bpd_loop(
    denoise_fn: DenoiseFn,
    schedule: Schedule,
    x_start: jnp.ndarray,
    rng: jax.Array,
    *,
    mean_type: str = START_X,
    var_type: str = FIXED_LARGE,
    clip_denoised: bool = True,
):
    """Total bits/dim over the whole chain (gaussian_diffusion.py:846-902),
    as a `lax.scan` over timesteps instead of a Python loop with per-step
    host transfers. Returns total_bpd, prior_bpd, per-step vb/mse arrays."""
    b = x_start.shape[0]

    def body(carry, t_scalar):
        t = jnp.full((b,), t_scalar, jnp.int32)
        step_rng = jax.random.fold_in(rng, t_scalar)
        noise = jax.random.normal(step_rng, x_start.shape, x_start.dtype)
        x_t = q_sample(schedule, x_start, t, noise)
        vb = vb_terms_bpd(
            denoise_fn, schedule, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type,
            clip_denoised=clip_denoised,
        )
        eps = predict_eps_from_xstart(schedule, x_t, t, vb["pred_xstart"])
        mse = mean_flat(jnp.square(eps - noise))
        xstart_mse = mean_flat(jnp.square(vb["pred_xstart"] - x_start))
        return carry, (vb["output"], xstart_mse, mse)

    ts = jnp.arange(schedule.num_timesteps - 1, -1, -1, dtype=jnp.int32)
    _, (vb, xstart_mse, mse) = jax.lax.scan(body, None, ts)
    prior = prior_bpd(schedule, x_start)
    total = jnp.sum(vb, axis=0) + prior
    return {
        "total_bpd": total,
        "prior_bpd": prior,
        "vb": vb.T,            # (B, T) newest-first like the scan order
        "xstart_mse": xstart_mse.T,
        "mse": mse.T,
    }
