"""Sliding-window inference: geometry, stitch parity, end-to-end diffusion."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_unet_tpu.api import DiffusionSegmenter
from diff_unet_tpu.engine.sliding_window import (
    SlidingWindowInferer,
    gaussian_importance,
    make_diffusion_inferer,
    window_starts,
)
from diff_unet_tpu.models import DiffUNet


def test_window_starts_geometry():
    # roi 96, overlap 0.25 -> interval 72
    assert window_starts(96, 96, 0.25) == [0]
    assert window_starts(192, 96, 0.25) == [0, 72, 96]
    assert window_starts(100, 96, 0.25) == [0, 4]
    # volume smaller than roi
    assert window_starts(64, 96, 0.25) == [0]


def test_gaussian_importance_peak_center():
    g = gaussian_importance((9, 9, 9))
    assert g.max() == 1.0
    assert np.unravel_index(g.argmax(), g.shape) == (4, 4, 4)
    assert g.min() > 0


def test_stitch_identity_predictor():
    """A predictor that returns its input must reconstruct the volume
    exactly, regardless of overlap-weighted stitching."""
    rng = np.random.RandomState(0)
    vol = rng.rand(40, 40, 40, 1).astype(np.float32)
    inferer = SlidingWindowInferer(roi=(16, 16, 16), sw_batch_size=3,
                                   overlap=0.25)
    out = jax.jit(
        lambda v: inferer(lambda w, r: w, v, out_channels=1)
    )(jnp.array(vol))
    np.testing.assert_allclose(np.asarray(out), vol, rtol=1e-5, atol=1e-6)


def test_stitch_identity_gaussian_mode():
    rng = np.random.RandomState(1)
    vol = rng.rand(24, 24, 24, 2).astype(np.float32)
    inferer = SlidingWindowInferer(roi=(16, 16, 16), sw_batch_size=4,
                                   overlap=0.5, mode="gaussian")
    out = jax.jit(
        lambda v: inferer(lambda w, r: w, v, out_channels=2)
    )(jnp.array(vol))
    np.testing.assert_allclose(np.asarray(out), vol, rtol=1e-4, atol=1e-5)


def test_volume_smaller_than_roi_pads_and_crops():
    vol = np.ones((10, 12, 14, 1), np.float32)
    inferer = SlidingWindowInferer(roi=(16, 16, 16), sw_batch_size=1)
    out = jax.jit(
        lambda v: inferer(lambda w, r: w * 2.0, v, out_channels=1)
    )(jnp.array(vol))
    assert out.shape == (10, 12, 14, 1)
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_sliding_window_matches_full_volume_prediction():
    """Stitched windowed prediction of a *linear shift-invariant-ish*
    predictor equals the full-volume prediction inside each window."""
    def predictor(w, rng):
        return w * 3.0 + 1.0

    rng = np.random.RandomState(2)
    vol = rng.rand(32, 32, 32, 1).astype(np.float32)
    inferer = SlidingWindowInferer(roi=(16, 16, 16), sw_batch_size=2,
                                   overlap=0.25)
    out = jax.jit(
        lambda v: inferer(predictor, v, out_channels=1)
    )(jnp.array(vol))
    np.testing.assert_allclose(np.asarray(out), vol * 3.0 + 1.0, rtol=1e-5,
                               atol=1e-5)


def test_diffusion_sliding_window_end_to_end():
    C = 2
    seg = DiffusionSegmenter(
        module=DiffUNet(out_channels=C, features=(4, 4, 8, 16, 32, 4)),
        num_classes=C, sample_steps=2,
    )
    params = seg.init(jax.random.key(0), (1, 16, 16, 16, 1))
    infer = make_diffusion_inferer(seg, roi=(16, 16, 16), sw_batch_size=2,
                                   overlap=0.25)
    vol = jax.random.normal(jax.random.key(1), (24, 24, 24, 1))
    logits, binary = infer(params, vol, jax.random.key(2))
    assert logits.shape == (24, 24, 24, C)
    assert binary.shape == (24, 24, 24, C)
    assert np.isfinite(np.asarray(logits)).all()
    assert set(np.unique(np.asarray(binary))) <= {0.0, 1.0}
