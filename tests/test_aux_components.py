"""EMA, loss-aware sampler, bpd loop, hausdorff_dt, MIM utils, grad accum."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_unet_tpu.diffusion import gaussian
from diff_unet_tpu.diffusion.resample import (
    init_loss_aware,
    loss_aware_weights,
    sample_loss_aware,
    update_loss_aware,
)
from diff_unet_tpu.diffusion.schedule import Schedule
from diff_unet_tpu.engine.ema import EmaTracker, update_ema


def test_ema_update_math():
    p0 = {"w": jnp.zeros(3)}
    p1 = {"w": jnp.ones(3)}
    ema = update_ema(p0, p1, rate=0.9)
    np.testing.assert_allclose(np.asarray(ema["w"]), 0.1, rtol=1e-6)
    tracker = EmaTracker(p0, rates=(0.5, 0.9))
    tracker.update(p1)
    np.testing.assert_allclose(np.asarray(tracker.get(0.5)["w"]), 0.5,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tracker.get(0.9)["w"]), 0.1,
                               rtol=1e-6)


def test_loss_aware_sampler_warmup_and_bias():
    T, H = 10, 3
    state = init_loss_aware(T, H)
    # before warmup: uniform
    w = loss_aware_weights(state)
    np.testing.assert_allclose(np.asarray(w), 1.0 / T, rtol=1e-6)

    # fill history: timestep 0 gets large losses, everything else small
    rng = jax.random.key(0)
    for i in range(H):
        t = jnp.arange(T)
        losses = jnp.where(t == 0, 100.0, 1.0)
        state = update_loss_aware(state, t, losses)
    w = loss_aware_weights(state)
    assert float(w[0]) > float(w[1]) * 10  # high-loss timestep oversampled
    t, weights = sample_loss_aware(state, rng, 512)
    frac_t0 = float(jnp.mean((t == 0).astype(jnp.float32)))
    assert frac_t0 > 0.5
    # importance weights correct: 1/(T*p)
    np.testing.assert_allclose(
        np.asarray(weights), np.asarray(1.0 / (T * w[t])), rtol=1e-5
    )


def test_calc_bpd_loop_runs():
    sched = Schedule.create("linear", 20)
    toy = lambda x, t: 0.5 * x
    x0 = jax.random.normal(jax.random.key(0), (2, 4, 4, 4, 1))
    out = jax.jit(
        lambda x, r: gaussian.calc_bpd_loop(toy, sched, x, r)
    )(x0, jax.random.key(1))
    assert out["total_bpd"].shape == (2,)
    assert out["vb"].shape == (2, 20)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    # total = sum(vb) + prior
    np.testing.assert_allclose(
        np.asarray(out["total_bpd"]),
        np.asarray(out["vb"].sum(-1) + out["prior_bpd"]), rtol=1e-5,
    )


def test_hausdorff_dt_loss():
    from diff_unet_tpu.losses.losses import (
        approx_distance_field,
        hausdorff_dt_loss,
    )
    m = jnp.zeros((1, 8, 8, 8, 1)).at[0, 4, 4, 4, 0].set(1.0)
    d = approx_distance_field(m, 6)
    assert float(d[0, 4, 4, 4, 0]) == 0.0
    assert float(d[0, 4, 4, 5, 0]) == 1.0
    assert float(d[0, 4, 4, 7, 0]) == 3.0
    perfect = float(hausdorff_dt_loss((m * 2 - 1) * 20, m))
    wrong = float(hausdorff_dt_loss(-(m * 2 - 1) * 20, m))
    assert wrong > perfect


def test_mim_patchify_roundtrip():
    from diff_unet_tpu.ops.mim import (
        block_mask,
        patchify,
        random_masking,
        region_mask_labels,
        unpatchify,
    )
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 8, 3))
    tokens = patchify(x, 2)
    assert tokens.shape == (2, 64, 24)
    back = unpatchify(tokens, (4, 4, 4), 2, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)

    kept, mask, restore = random_masking(tokens, jax.random.key(1), 0.75)
    assert kept.shape == (2, 16, 24)
    np.testing.assert_allclose(np.asarray(mask.sum(1)), 48)

    bm = block_mask((8, 8, 8), jax.random.key(2), 2, 0.5)
    assert bm.shape == (8, 8, 8)
    assert set(np.unique(np.asarray(bm))) <= {0.0, 1.0}

    labels = region_mask_labels(mask, regions=2)
    assert labels.shape == (2, 8)
    assert (np.asarray(labels) >= 0).all() and (np.asarray(labels) <= 1).all()


def test_gradient_accumulation():
    import optax
    from diff_unet_tpu.engine import make_optimizer
    tx = make_optimizer(lr=1.0, weight_decay=0.0, accum_steps=2)
    params = {"w": jnp.ones(2)}
    state = tx.init(params)
    g = {"w": jnp.ones(2)}
    up1, state = tx.update(g, state, params)
    # first microbatch: no update applied yet
    np.testing.assert_allclose(np.asarray(up1["w"]), 0.0)
    up2, state = tx.update(g, state, params)
    assert float(jnp.abs(up2["w"]).sum()) > 0
