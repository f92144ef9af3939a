"""Shape/behaviour tests for SmoothDiffUNet, AttentionDiffUNet, Swin family."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_unet_tpu.api import DiffusionSegmenter
from diff_unet_tpu.models.model_hub import (
    ModelType,
    create_model,
    get_model_type,
)

C = 3
S = 32
IMG = (1, S, S, S, 1)


def _roundtrip(model, methods=True):
    seg = DiffusionSegmenter(module=model, num_classes=C)
    params = seg.init(jax.random.key(0), IMG)
    image = jax.random.normal(jax.random.key(1), IMG)
    x = jax.random.normal(jax.random.key(2), (1, S, S, S, C))
    t = jnp.array([500])
    out = seg.denoise(params, image, x, t)
    assert out.shape == (1, S, S, S, C)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    if methods:
        emb = model.apply(params, image, method="embed")
        split = model.apply(params, x, t, emb, image,
                            method="denoise_with_embeddings")
        np.testing.assert_allclose(np.asarray(out), np.asarray(split),
                                   rtol=2e-5, atol=2e-5)
    return seg, params


def test_smooth_diff_unet():
    model = create_model("smooth_diff_unet", out_channels=C, image_size=S,
                         spatial_size=S)
    # shrink for CPU test speed
    from diff_unet_tpu.models.smooth_diff_unet import SmoothDiffUNet
    model = SmoothDiffUNet(out_channels=C, image_size=S, spatial_size=S,
                           features=(4, 4, 8, 16, 32, 4))
    seg, params = _roundtrip(model)
    # smoothing weights exist per level
    p = params["params"]["embed_model"]
    assert "smooth_0" in p and "smooth_3" in p
    assert p["smooth_0"]["weights"].shape == (S, S, S, 4)


def test_smooth_layer_laplacian_golden():
    from diff_unet_tpu.models.smooth_diff_unet import SmoothLayer
    layer = SmoothLayer((3, 3, 3))
    x = jnp.zeros((1, 3, 3, 3, 1)).at[0, 1, 1, 1, 0].set(1.0)
    params = layer.init(jax.random.key(0), x)
    w = jnp.ones((3, 3, 3, 1))
    out = layer.apply({"params": {"weights": w}}, x)
    # center: x + w * (-6*1 + 6 neighbours(0)) = 1 - 6 = -5
    assert float(out[0, 1, 1, 1, 0]) == pytest.approx(-5.0)
    # face neighbour: 0 + w * (+1) = 1
    assert float(out[0, 0, 1, 1, 0]) == pytest.approx(1.0)
    # corner: untouched
    assert float(out[0, 0, 0, 0, 0]) == pytest.approx(0.0)


def test_ffparser_identity_with_zero_weights():
    from diff_unet_tpu.models.smooth_diff_unet import FFParser
    x = jax.random.normal(jax.random.key(0), (1, 4, 8, 8, 2))
    mod = FFParser((4, 8, 8))
    params = mod.init(jax.random.key(1), x)
    # weight == 1 + 0j reproduces the input (ortho fft roundtrip)
    ones = jax.tree_util.tree_map(jnp.ones_like, params)
    ones["params"]["weight_imag"] = jnp.zeros_like(
        ones["params"]["weight_imag"])
    out = mod.apply(ones, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-4,
                               atol=1e-5)


def test_attention_diff_unet():
    from diff_unet_tpu.models.attention_diff_unet import AttentionDiffUNet
    model = AttentionDiffUNet(out_channels=C, features=(4, 8, 16, 32, 64))
    _roundtrip(model)


def test_swin_window_ops_roundtrip():
    from diff_unet_tpu.ops.swin import window_partition, window_reverse
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 8, 5))
    ws = (4, 4, 4)
    w = window_partition(x, ws)
    assert w.shape == (2 * 8, 64, 5)
    back = window_reverse(w, ws, (2, 8, 8, 8))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_swin_attn_mask_static():
    from diff_unet_tpu.ops.swin import compute_attn_mask
    m = compute_attn_mask((8, 8, 8), (4, 4, 4), (2, 2, 2))
    assert m.shape == (8, 64, 64)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # unshifted interior window has no masked pairs
    assert (m[0] == 0).all()


def test_relative_position_index_bounds():
    from diff_unet_tpu.ops.swin import relative_position_index
    rpi = relative_position_index((7, 7, 7))
    n = 343
    assert rpi.shape == (n, n)
    assert rpi.min() >= 0 and rpi.max() < 13 * 13 * 13


def test_diff_swin_unetr_tiny():
    from diff_unet_tpu.models.swin_unetr import DiffSwinUNETR
    model = DiffSwinUNETR(out_channels=C, image_size=(S, S, S),
                          feature_size=12)
    _roundtrip(model)


def test_swin_unetr_plain():
    from diff_unet_tpu.models.swin_unetr import SwinUNETR
    model = SwinUNETR(out_channels=C, image_size=(S, S, S), feature_size=12)
    x = jax.random.normal(jax.random.key(0), IMG)
    params = model.init(jax.random.key(1), x)
    out = model.apply(params, x)
    assert out.shape == (1, S, S, S, C)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_model_hub_and_types():
    assert get_model_type("diff_unet") == ModelType.DIFFUSION
    assert get_model_type("diff_swin_unetr") == ModelType.DIFFUSION
    assert get_model_type("swin_unetr") == ModelType.SWIN_UNETR
    assert get_model_type("attention_unet") == ModelType.ATTENTION_UNET
    with pytest.raises(ValueError):
        create_model("nope", out_channels=C)
    for name in ("diff_unet", "smooth_diff_unet", "attention_diff_unet",
                 "diff_swin_unetr", "swin_unetr"):
        m = create_model(name, out_channels=C, image_size=S, spatial_size=S)
        assert m is not None
