"""Channel-packed (pack-2) execution == unpacked execution, same params.

The packed path (ops/packed.py, BasicUNetDenoiserPacked) is a pure layout
transformation: identical parameter trees, outputs equal up to float
reduction order. These tests pin that equivalence op-by-op and end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from diff_unet_tpu.ops import packed as pk

F = 2


def _conv_ref(x, w, b):
    y = lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + b


def test_pack_unpack_roundtrip():
    x = jnp.arange(2 * 4 * 4 * 8 * 3, dtype=jnp.float32).reshape(2, 4, 4, 8, 3)
    np.testing.assert_array_equal(
        np.asarray(pk.unpack_w(pk.pack_w(x, F), F)), np.asarray(x))
    # packed channel = w_offset-major: col 0 holds [w0 ch, w1 ch]
    p = pk.pack_w(x, F)
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, 0, :3]),
                                  np.asarray(x[0, 0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, 0, 3:]),
                                  np.asarray(x[0, 0, 0, 1]))


@pytest.mark.parametrize("cin,cout,ksize", [(5, 7, 3), (6, 4, 1)])
def test_packed_conv_matches_unpacked(cin, cout, ksize):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 6, 8, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(ksize, ksize, ksize, cin, cout)
                    .astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(cout).astype(np.float32))
    want = _conv_ref(x, w, b)
    got = pk.unpack_w(pk.packed_conv(pk.pack_w(x, F), w, b, F), F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_concat_groups():
    """conv(concat([a, b])) == packed_conv(concat([pack(a), pack(b)]))."""
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(1, 4, 4, 8, 3).astype(np.float32))
    bt = jnp.asarray(rng.randn(1, 4, 4, 8, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 8, 6).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.randn(6).astype(np.float32))
    want = _conv_ref(jnp.concatenate([a, bt], -1), w, bias)
    cat_p = jnp.concatenate([pk.pack_w(a, F), pk.pack_w(bt, F)], -1)
    groups = pk.concat_groups([3, 5], F)
    got = pk.unpack_w(pk.packed_conv(cat_p, w, bias, F, groups), F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_instance_norm_matches():
    from diff_unet_tpu.ops.blocks import InstanceNorm
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 4, 8, 6).astype(np.float32))
    scale = jnp.asarray(rng.randn(6).astype(np.float32))
    bias = jnp.asarray(rng.randn(6).astype(np.float32))
    mod = InstanceNorm()
    params = mod.init(jax.random.key(0), x)
    params = {"params": {"scale": scale, "bias": bias}}
    want = mod.apply(params, x)
    got = pk.unpack_w(
        pk.packed_instance_norm(pk.pack_w(x, F), scale, bias, F), F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_maxpool_matches():
    from flax import linen as nn
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 5).astype(np.float32))
    want = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
    got_packed = pk.packed_maxpool2(pk.pack_w(x, F), F, repack=True)
    np.testing.assert_allclose(
        np.asarray(pk.unpack_w(got_packed, F)), np.asarray(want),
        rtol=1e-6, atol=1e-6)
    got_plain = pk.packed_maxpool2(pk.pack_w(x, F), F, repack=False)
    np.testing.assert_allclose(np.asarray(got_plain), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", ["enter", "packed"])
def test_packed_deconv_matches_flax(mode):
    from flax import linen as nn
    rng = np.random.RandomState(4)
    cin, cout = 6, 4
    x = jnp.asarray(rng.randn(2, 4, 4, 6, cin).astype(np.float32))
    ref = nn.ConvTranspose(cout, kernel_size=(2, 2, 2), strides=(2, 2, 2))
    params = ref.init(jax.random.key(0), x)
    w = params["params"]["kernel"]
    b = params["params"]["bias"]
    want = ref.apply(params, x)
    if mode == "enter":
        got = pk.unpack_w(pk.packed_deconv2_enter(x, w, b, F), F)
    else:
        got = pk.unpack_w(
            pk.packed_deconv2_packed(pk.pack_w(x, F), w, b, F), F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _small_models():
    from diff_unet_tpu.models import DiffUNet
    kw = dict(out_channels=3, features=(8, 8, 16, 32, 64, 8))
    return DiffUNet(**kw), DiffUNet(pack=2, **kw)


def test_packed_encoder_matches_unpacked():
    """BasicUNetEncoderPacked == BasicUNetEncoder with the same params."""
    from diff_unet_tpu.models.basic_unet import (
        BasicUNetEncoder, BasicUNetEncoderPacked)
    feats = (8, 8, 16, 32, 64, 8)
    plain = BasicUNetEncoder(features=feats)
    packd = BasicUNetEncoderPacked(features=feats)
    image = jax.random.normal(jax.random.key(1), (2, 16, 16, 16, 1))
    params = plain.init(jax.random.key(0), image)
    params_p = packd.init(jax.random.key(0), image)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_p))
    want = plain.apply(params, image)
    got = packd.apply(params, image)
    for lvl, (w, g) in enumerate(zip(want, got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"level {lvl}")
    # packed-layout outputs == pack_w of the plain outputs
    from diff_unet_tpu.models.basic_unet import pack_embeddings
    got_p = packd.apply(params, pk.pack_w(image, F),
                        method="embed_packed")
    want_p = pack_embeddings(want, F)
    for lvl, (w, g) in enumerate(zip(want_p, got_p)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"packed level {lvl}")


def test_packed_denoiser_matches_unpacked_model():
    """Same params -> same denoise logits, packed vs unpacked execution."""
    plain, packd = _small_models()
    shape = (2, 32, 32, 32, 1)
    image = jax.random.normal(jax.random.key(1), shape)
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 32, 3))
    t = jnp.asarray([7, 91])
    params = plain.init(jax.random.key(0), image, x, t)
    # identical trees: the packed module must init to the same structure
    params_p = packd.init(jax.random.key(0), image, x, t)
    tp = jax.tree_util.tree_structure(params)
    tpp = jax.tree_util.tree_structure(params_p)
    assert tp == tpp, f"param tree mismatch:\n{tp}\nvs\n{tpp}"
    for a, bb in zip(jax.tree_util.tree_leaves(params),
                     jax.tree_util.tree_leaves(params_p)):
        assert a.shape == bb.shape

    want = plain.apply(params, image, x, t)
    got = packd.apply(params, image, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_packed_ddim_sample_matches_unpacked():
    """Full DDIM-2 loop: packed == unpacked with identical noise."""
    from diff_unet_tpu.api import DiffusionSegmenter
    plain, packd = _small_models()
    seg_plain = DiffusionSegmenter(module=plain, num_classes=3,
                                   sample_steps=2)
    seg_packd = DiffusionSegmenter(module=packd, num_classes=3,
                                   sample_steps=2)
    shape = (2, 16, 16, 16, 1)
    params = seg_plain.init(jax.random.key(0), shape)
    image = jax.random.normal(jax.random.key(1), shape)
    noise = jax.random.normal(jax.random.key(2), (2, 16, 16, 16, 3))
    want = seg_plain.ddim_sample(params, image, jax.random.key(3),
                                 noise=noise)
    got = seg_packd.ddim_sample(params, image, jax.random.key(3),
                                noise=noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_packed_conv_int8_close_to_float():
    """W8A8 packed conv tracks the float conv within quantization error
    (per-tensor act scale, per-channel weight scales)."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 3, 5).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(5).astype(np.float32) * 0.1)
    xp = pk.pack_w(x, F)
    want = np.asarray(pk.packed_conv(xp, w, b, F))
    got = np.asarray(pk.packed_conv_int8(xp, w, b, F,
                                         out_dtype=jnp.float32))
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    assert err < 0.02, err
    # strong correlation
    c = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert c > 0.999, c


def test_quantized_model_correlates_with_float():
    """DiffUNet(pack=2, quantize=True) denoise logits track the float
    packed model closely (inference-only int8 option)."""
    from diff_unet_tpu.models import DiffUNet

    feats = (8, 8, 16, 32, 64, 8)
    plain = DiffUNet(out_channels=3, features=feats, pack=2)
    quant = DiffUNet(out_channels=3, features=feats, pack=2, quantize=True)
    image = jax.random.normal(jax.random.key(1), (2, 16, 16, 16, 1))
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 16, 3))
    t = jnp.asarray([7, 91])
    params = plain.init(jax.random.key(0), image, x, t)
    want = np.asarray(plain.apply(params, image, x, t))
    got = np.asarray(quant.apply(params, image, x, t))
    c = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert c > 0.99, c
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.25, rel


def test_int8_full_depth_offline_and_calibrated():
    """Full-depth W8A8 (deep levels + deconvs quantized too): the offline
    'quant' collection reproduces in-graph quantization, and calibrated
    static activation scales stay close to the float model (VERDICT r3 #2)."""
    from diff_unet_tpu.api import DiffusionSegmenter
    from diff_unet_tpu.engine.quantize import quantize_inference_params
    from diff_unet_tpu.models import DiffUNet

    feats = (8, 8, 16, 32, 64, 8)
    quant = DiffUNet(out_channels=3, features=feats, pack=2, quantize=True)
    seg = DiffusionSegmenter(module=quant, num_classes=3, sample_steps=2)
    image = jax.random.normal(jax.random.key(1), (2, 16, 16, 16, 1))
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 16, 3))
    t = jnp.asarray([7, 91])
    params = quant.init(jax.random.key(0), image, x, t)
    # init never records quant state (restore templates stay clean)
    assert set(params.keys()) == {"params"}

    online = np.asarray(quant.apply(params, image, x, t))
    merged = quantize_inference_params(seg, params)
    assert "quant" in merged
    offline = np.asarray(quant.apply(merged, image, x, t))
    np.testing.assert_allclose(offline, online, rtol=1e-5, atol=1e-5)

    # weights-only collection has no act scales (they stay dynamic)
    leaves = jax.tree_util.tree_leaves_with_path(merged["quant"])
    names = {str(p[-1]) for p, _ in leaves}
    assert not any("sa" in n for n in names), names

    merged2 = quantize_inference_params(
        seg, params, calibration_images=[image])
    leaves2 = jax.tree_util.tree_leaves_with_path(merged2["quant"])
    names2 = {str(p[-1]) for p, _ in leaves2}
    assert any("sa" in n for n in names2), names2
    static = np.asarray(quant.apply(merged2, image, x, t))
    plain = DiffUNet(out_channels=3, features=feats, pack=2)
    want = np.asarray(plain.apply(params, image, x, t))
    c = np.corrcoef(static.ravel(), want.ravel())[0, 1]
    assert c > 0.98, c
