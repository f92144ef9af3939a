"""Schedule/table golden-value tests (closed-form + reference parity)."""
import sys

import numpy as np
import pytest

from diff_unet_tpu.diffusion.schedule import (
    Schedule,
    get_named_beta_schedule,
    space_timesteps,
)


def _ref_gaussian_diffusion():
    """Import the PyTorch reference implementation (read-only, not vendored)."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from guided_diffusion import gaussian_diffusion as gd  # noqa
        from guided_diffusion import respace  # noqa
        return gd, respace
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")


def test_linear_betas_closed_form():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    assert np.all(np.diff(betas) > 0)
    # scale-invariance: T=500 scales endpoints by 2
    b500 = get_named_beta_schedule("linear", 500)
    assert b500[0] == pytest.approx(2e-4)
    assert b500[-1] == pytest.approx(0.04)


def test_cosine_betas_bounded():
    betas = get_named_beta_schedule("cosine", 1000)
    assert betas.shape == (1000,)
    assert (betas > 0).all() and (betas <= 0.999).all()


def test_space_timesteps_ddim10():
    steps = space_timesteps(1000, [10])
    assert len(steps) == 10
    assert steps[0] == 0 and steps[-1] == 999
    # fractional stride 999/9 = 111
    assert steps == [0, 111, 222, 333, 444, 555, 666, 777, 888, 999]


def test_space_timesteps_string_and_sections():
    assert space_timesteps(300, "10,15,20") == sorted(
        space_timesteps(300, [10, 15, 20])
    )
    assert len(space_timesteps(1000, "ddim25")) == 25


def test_schedule_tables_closed_form():
    s = Schedule.create("linear", 100)
    alphas = 1.0 - s.betas
    np.testing.assert_allclose(s.alphas_cumprod, np.cumprod(alphas), rtol=1e-12)
    np.testing.assert_allclose(
        s.sqrt_alphas_cumprod ** 2 + s.sqrt_one_minus_alphas_cumprod ** 2,
        1.0, rtol=1e-12,
    )
    # posterior variance: beta_t * (1 - abar_{t-1}) / (1 - abar_t)
    np.testing.assert_allclose(
        s.posterior_variance[1],
        s.betas[1] * (1 - s.alphas_cumprod[0]) / (1 - s.alphas_cumprod[1]),
        rtol=1e-12,
    )


def test_tables_match_reference():
    gd, _ = _ref_gaussian_diffusion()
    betas = gd.get_named_beta_schedule("linear", 1000)
    ref = gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_LARGE,
        loss_type=gd.LossType.RESCALED_KL,
    )
    ours = Schedule.create("linear", 1000)
    for name in [
        "betas", "alphas_cumprod", "alphas_cumprod_prev", "alphas_cumprod_next",
        "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
        "posterior_variance", "posterior_log_variance_clipped",
        "posterior_mean_coef1", "posterior_mean_coef2",
    ]:
        np.testing.assert_allclose(
            getattr(ours, name), getattr(ref, name), rtol=1e-12, err_msg=name
        )


def test_respaced_schedule_matches_reference():
    gd, respace = _ref_gaussian_diffusion()
    betas = gd.get_named_beta_schedule("linear", 1000)
    ref = respace.SpacedDiffusion(
        use_timesteps=respace.space_timesteps(1000, [10]),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_LARGE,
        loss_type=gd.LossType.RESCALED_KL,
    )
    ours = Schedule.create("linear", 1000, respace=[10])
    assert ours.num_timesteps == 10
    np.testing.assert_allclose(ours.betas, ref.betas, rtol=1e-12)
    np.testing.assert_array_equal(ours.timestep_map, np.array(ref.timestep_map))
    np.testing.assert_allclose(ours.alphas_cumprod, ref.alphas_cumprod, rtol=1e-12)
