"""Training engine: one pjit-compiled step = q_sample + denoise + loss +
grad + optimizer update.

Capability parity with the reference Trainer's per-batch path
(train.py:258-273: q_sample -> denoise -> composite loss; train.py:226-238:
AMP autocast + GradScaler + AdamW step) and LinearWarmupCosineAnnealingLR
(light_training/utils/lr_scheduler.py:19-95) — redesigned so the whole step
is a single XLA program: no autocast/GradScaler (bf16 compute with fp32
params/optimizer is the TPU idiom replacing AMP, SURVEY.md component #40),
no Python-side scheduler object (optax schedule closed over the step).

The NaN-loss abort (train.py:240-241) is preserved as an on-device flag
returned in the metrics; the host raises between steps without forcing a
sync every step.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from diff_unet_tpu.api import DiffusionSegmenter
from diff_unet_tpu.diffusion import gaussian, resample
from diff_unet_tpu.engine.ema import update_ema
from diff_unet_tpu.losses import CompositeLoss


class TrainState(train_state.TrainState):
    """flax TrainState extended with optional EMA parameters (the vendored
    TrainLoop's ema_params, guided_diffusion/train_util.py:90-95) and the
    loss-aware timestep-sampler state (resample.py:69-153). Both live inside
    the state pytree so they update inside the jitted step and checkpoint
    with everything else."""
    ema_params: Any = None
    sampler_state: Any = None


def linear_warmup_cosine(
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    steps_per_epoch: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
) -> optax.Schedule:
    """Per-step schedule matching LinearWarmupCosineAnnealingLR's per-epoch
    closed form (lr_scheduler.py:78-95): linear warmup_start_lr -> base_lr
    over `warmup_epochs`, then cosine to `eta_min` at `max_epochs`."""

    def schedule(step):
        epoch = step / steps_per_epoch
        warm = warmup_start_lr + (base_lr - warmup_start_lr) * jnp.minimum(
            epoch / jnp.maximum(warmup_epochs, 1e-8), 1.0
        )
        progress = (epoch - warmup_epochs) / jnp.maximum(
            max_epochs - warmup_epochs, 1e-8
        )
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(math.pi * progress)
        )
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 1e-3,
    scheduler: Optional[str] = None,
    warmup_epochs: int = 100,
    max_epochs: int = 5000,
    steps_per_epoch: int = 1,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW (train.py:121) with optional warmup-cosine schedule.

    `accum_steps > 1` enables gradient accumulation (microbatching): the
    TPU-native equivalent of the vendored TrainLoop's microbatch +
    DDP `no_sync` accumulation (guided_diffusion/train_util.py:22-255) —
    under pjit, skipped-update steps simply don't apply grads; there is no
    comm to suppress because the all-reduce is compiler-scheduled.
    """
    if scheduler in ("cosine_annealing", "warmup_cosine", "cosine"):
        lr = linear_warmup_cosine(lr, warmup_epochs, max_epochs,
                                  steps_per_epoch)
    tx = optax.adamw(learning_rate=lr, weight_decay=weight_decay)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def create_train_state(
    seg: DiffusionSegmenter,
    rng: jax.Array,
    image_shape,
    tx: Optional[optax.GradientTransformation] = None,
    *,
    ema_rate: Optional[float] = None,
    t_sampler: str = "uniform",
) -> TrainState:
    params = seg.init(rng, image_shape)
    tx = tx or make_optimizer()
    ema_params = (
        # real copies: aliased buffers would be donated twice by the step
        jax.tree_util.tree_map(jnp.copy, params) if ema_rate else None
    )
    sampler_state = (
        resample.init_loss_aware(seg.timesteps)
        if t_sampler == "loss_aware" else None
    )
    return TrainState.create(
        apply_fn=seg.module.apply, params=params, tx=tx,
        ema_params=ema_params, sampler_state=sampler_state,
    )


def make_train_step(
    seg: DiffusionSegmenter,
    criterion: CompositeLoss,
    *,
    model_type: str = "diffusion",
    donate: bool = True,
    remat: bool = True,
    ema_rate: Optional[float] = None,
    t_sampler: str = "uniform",
) -> Callable:
    """Build the jitted train step.

    step(state, batch, rng) -> (state, metrics) where batch is a dict with
    "image" (N,D,H,W,1) float and "label" (N,D,H,W,C) one-hot float (plus
    optional "dist_maps" for the boundary loss). The diffusion path follows
    train.py:261-268: x_start = labels*2-1; x_t,t ~ q_sample; preds =
    denoise(x_t, t | image); loss = criterion(preds, labels).

    `ema_rate` maintains state.ema_params <- ema*rate + params*(1-rate)
    inside the step (train_util.py:205-207). `t_sampler="loss_aware"` draws
    t from the LossSecondMomentResampler distribution and importance-weights
    per-example losses (resample.py:42-58,69-153); state.sampler_state
    carries the loss history on device (no all_gather — under pjit the
    update already sees every shard's losses).
    """

    # NOTE on memory: activation rematerialisation is block-level, inside
    # the model modules (`remat=True` on DiffUNet etc.) — the TPU idiom
    # replacing the reference's torch gradient-checkpointing flag
    # (transformer.py:473-481). Whole-function jax.checkpoint here would
    # not reduce the backward peak.
    if model_type == "diffusion":
        def forward(params, image, x_t, t):
            return seg.module.apply(params, image, x_t, t, method="denoise")
    else:
        def forward(params, image, x_t, t):
            return seg.module.apply(params, image)

    loss_aware = t_sampler == "loss_aware"

    def per_example_losses(preds, labels, dist_maps):
        """criterion over each example alone — needed to importance-weight
        and to update the per-timestep loss history."""
        if dist_maps is None:
            return jax.vmap(
                lambda p, l: criterion(p[None], l[None], None)
            )(preds, labels)
        return jax.vmap(
            lambda p, l, d: criterion(p[None], l[None], d[None])
        )(preds, labels, dist_maps)

    def loss_fn(params, batch, rng, sampler_state):
        image = batch["image"]
        labels = batch["label"]
        dist_maps = batch.get("dist_maps")
        t = None
        if model_type == "diffusion":
            x_start = labels * 2.0 - 1.0
            t_rng, n_rng = jax.random.split(rng)
            if loss_aware:
                t, t_weights = resample.sample_loss_aware(
                    sampler_state, t_rng, x_start.shape[0]
                )
            else:
                t, t_weights = gaussian.uniform_timesteps(
                    t_rng, x_start.shape[0], seg.timesteps
                )
            noise = jax.random.normal(n_rng, x_start.shape, x_start.dtype)
            x_t = gaussian.q_sample(seg.train_schedule, x_start, t, noise)
            preds = forward(params, image, x_t, t)
        else:
            preds = forward(params, image, None, None)
        preds32 = preds.astype(jnp.float32)
        if loss_aware:
            per_ex = per_example_losses(preds32, labels, dist_maps)
            loss = jnp.mean(per_ex * t_weights)
        else:
            per_ex = None
            loss = criterion(preds32, labels, dist_maps)
        return loss, (t, per_ex)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (t, per_ex)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, rng, state.sampler_state)
        new_state = state.apply_gradients(grads=grads)
        if ema_rate:
            new_state = new_state.replace(ema_params=update_ema(
                state.ema_params, new_state.params, ema_rate))
        if loss_aware:
            new_state = new_state.replace(
                sampler_state=resample.update_loss_aware(
                    state.sampler_state, t, per_ex))
        gnorm = optax.global_norm(grads)
        metrics = {
            "loss": loss,
            "grad_norm": gnorm,
            "nonfinite": jnp.logical_not(jnp.isfinite(loss)),
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_denoise_fn(seg: DiffusionSegmenter) -> Callable:
    """Jitted whole-batch DDIM inference: image -> summed x0 logits."""
    def f(params, image, rng):
        return seg.ddim_sample(params, image, rng)
    return jax.jit(f)
