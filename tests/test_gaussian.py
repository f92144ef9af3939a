"""Gaussian diffusion math: golden values vs the PyTorch reference."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_unet_tpu.diffusion import gaussian, sampling
from diff_unet_tpu.diffusion.schedule import Schedule


def _ref():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import torch
        from guided_diffusion import gaussian_diffusion as gd
        from guided_diffusion import respace
        return torch, gd, respace
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")


def _ref_diffusion(gd, T=1000, respaced=None, respace_mod=None):
    betas = gd.get_named_beta_schedule("linear", T)
    kwargs = dict(
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_LARGE,
        loss_type=gd.LossType.RESCALED_KL,
    )
    if respaced is None:
        return gd.GaussianDiffusion(**kwargs)
    return respace_mod.SpacedDiffusion(
        use_timesteps=respace_mod.space_timesteps(T, respaced), **kwargs
    )


def test_q_sample_matches_reference():
    torch, gd, _ = _ref()
    ref = _ref_diffusion(gd)
    ours = Schedule.create("linear", 1000)

    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 4, 4, 4, 3).astype(np.float32)
    noise = rng.randn(*x0.shape).astype(np.float32)
    t = np.array([17, 940])

    got = gaussian.q_sample(ours, jnp.array(x0), jnp.array(t), jnp.array(noise))
    want = ref.q_sample(torch.tensor(x0), torch.tensor(t), torch.tensor(noise))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-6, atol=2e-6)


def test_q_posterior_matches_reference():
    torch, gd, _ = _ref()
    ref = _ref_diffusion(gd)
    ours = Schedule.create("linear", 1000)
    rng = np.random.RandomState(1)
    x0 = rng.randn(2, 4, 4, 4, 3).astype(np.float32)
    xt = rng.randn(*x0.shape).astype(np.float32)
    t = np.array([3, 500])

    m, v, lv = gaussian.q_posterior_mean_variance(
        ours, jnp.array(x0), jnp.array(xt), jnp.array(t)
    )
    rm, rv, rlv = ref.q_posterior_mean_variance(
        torch.tensor(x0), torch.tensor(xt), torch.tensor(t)
    )
    np.testing.assert_allclose(np.asarray(m), rm.numpy(), rtol=2e-6, atol=2e-6)
    # we keep variance in broadcastable (B,1,1,1,1) form; reference expands
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(v), x0.shape), rv.numpy(), rtol=2e-6, atol=2e-6
    )
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(lv), x0.shape), rlv.numpy(), rtol=2e-6,
        atol=2e-6,
    )


class _LinearToyModel:
    """A deterministic stand-in denoiser: f(x, t) = 0.5*x + 0.01*t."""

    def jax_fn(self, x, t):
        tt = t.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
        return 0.5 * x + 0.01 * tt

    def torch_fn(self, torch):
        def f(x, ts, **kwargs):
            tt = ts.float().view(-1, *([1] * (x.ndim - 1)))
            return 0.5 * x + 0.01 * tt
        return f


def test_p_mean_variance_matches_reference_respaced():
    torch, gd, respace = _ref()
    ref = _ref_diffusion(gd, respaced=[10], respace_mod=respace)
    ours = Schedule.create("linear", 1000, respace=[10])
    toy = _LinearToyModel()

    rng = np.random.RandomState(2)
    # channel-last for us, channel-first for torch — toy model is layout-blind
    x = rng.randn(2, 3, 4, 4, 4).astype(np.float32)
    t = np.array([0, 9])

    out = gaussian.p_mean_variance(
        toy.jax_fn, ours, jnp.array(x), jnp.array(t),
        mean_type=gaussian.START_X, var_type=gaussian.FIXED_LARGE,
    )
    ref_out = ref.p_mean_variance(toy.torch_fn(torch), torch.tensor(x),
                                  torch.tensor(t))
    np.testing.assert_allclose(np.asarray(out.mean), ref_out["mean"].numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(out.variance), x.shape),
        ref_out["variance"].numpy(), rtol=2e-6, atol=2e-6,
    )
    np.testing.assert_allclose(np.asarray(out.pred_xstart),
                               ref_out["pred_xstart"].numpy(), rtol=2e-6,
                               atol=2e-6)


def test_ddim_loop_matches_reference_sum_of_pred_xstart():
    """End-to-end DDIM-10: our fused scan == reference python loop.

    Covers the Diff-UNet inference contract: the returned logit map is the sum
    of pred_xstart over all steps (models/diffusion/diffusion.py:94-98).
    eta=0 makes the loop deterministic given the initial noise.
    """
    torch, gd, respace = _ref()
    ref = _ref_diffusion(gd, respaced=[10], respace_mod=respace)
    ours = Schedule.create("linear", 1000, respace=[10])
    toy = _LinearToyModel()

    rng = np.random.RandomState(3)
    shape = (2, 3, 8, 8, 8)
    noise = rng.randn(*shape).astype(np.float32)

    got = sampling.ddim_sample_loop(
        toy.jax_fn, ours, shape, jax.random.key(0),
        noise=jnp.array(noise), eta=0.0,
    )

    ref_out = ref.ddim_sample_loop(
        toy.torch_fn(torch), shape, noise=torch.tensor(noise),
        clip_denoised=True, device="cpu", eta=0.0,
    )
    want_sum = sum(s.numpy() for s in ref_out["all_samples"])
    np.testing.assert_allclose(np.asarray(got.pred_xstart_sum), want_sum,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.sample),
                               ref_out["sample"].numpy(), rtol=1e-4, atol=1e-4)


def test_ddim_reverse_loop_matches_reference():
    """ddim_reverse_sample_loop == the reference's ddim_reverse_sample
    (gaussian_diffusion.py:588-624) iterated t=0..T-1 in python."""
    torch, gd, respace = _ref()
    ref = _ref_diffusion(gd, respaced=[10], respace_mod=respace)
    ours = Schedule.create("linear", 1000, respace=[10])
    toy = _LinearToyModel()

    rng = np.random.RandomState(4)
    shape = (2, 3, 8, 8, 8)
    x0 = rng.randn(*shape).astype(np.float32)

    got = sampling.ddim_reverse_sample_loop(
        toy.jax_fn, ours, jnp.array(x0))

    # the reference exposes only the single reverse step; the upstream use
    # is loop-wise (VERDICT round-1 missing #5)
    x = torch.tensor(x0)
    f = toy.torch_fn(torch)
    # SpacedDiffusion wraps the model once per call; reuse its machinery by
    # calling ddim_reverse_sample per t
    for t_scalar in range(ref.num_timesteps):
        t = torch.full((shape[0],), t_scalar, dtype=torch.long)
        x = ref.ddim_reverse_sample(f, x, t, clip_denoised=True)["sample"]
    np.testing.assert_allclose(np.asarray(got), x.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_ddpm_loop_runs_and_is_finite():
    ours = Schedule.create("linear", 1000, respace=[10])
    toy = _LinearToyModel()
    out = sampling.p_sample_loop(
        toy.jax_fn, ours, (1, 3, 4, 4, 4), jax.random.key(1)
    )
    assert np.isfinite(np.asarray(out.sample)).all()
    assert np.isfinite(np.asarray(out.pred_xstart_sum)).all()


def test_vb_terms_and_training_losses_finite():
    ours = Schedule.create("linear", 100)
    toy = _LinearToyModel()
    rng = jax.random.key(2)
    x0 = jax.random.normal(rng, (2, 4, 4, 4, 3))
    t = jnp.array([0, 50])
    vb = gaussian.vb_terms_bpd(
        toy.jax_fn, ours, x0, x0, t,
    )
    assert vb["output"].shape == (2,)
    losses = gaussian.training_losses(toy.jax_fn, ours, x0, t, rng)
    assert losses["loss"].shape == (2,)
    assert np.isfinite(np.asarray(losses["loss"])).all()
    kl = gaussian.training_losses(
        toy.jax_fn, ours, x0, t, rng, loss_type="rescaled_kl"
    )
    assert np.isfinite(np.asarray(kl["loss"])).all()


def test_uniform_sampler_bounds():
    t, w = gaussian.uniform_timesteps(jax.random.key(0), 512, 1000)
    assert t.shape == (512,)
    assert int(t.min()) >= 0 and int(t.max()) < 1000
    assert np.all(np.asarray(w) == 1.0)
