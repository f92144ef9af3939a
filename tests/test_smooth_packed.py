"""Pack-2 execution of the SmoothDiffUNet family == unpacked, same params.

Pins the round-5 extensions of the channel-packing machinery
(ops/packed.py, models/smooth_diff_unet.py): the packed layer norm's
(f, C) per-voxel regroup, the PackedSmoothLayer cross-block W stencil, and
the end-to-end SmoothDiffUNet(pack=2) forward + DDIM loop.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diff_unet_tpu.ops import packed as pk

F = 2
FEATURES = (8, 8, 16, 32, 64, 8)
S = 16  # image_size == spatial_size (divisible by 2^4)
C = 4


def test_packed_layer_norm_matches():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 8, 6).astype(np.float32))
    scale = jnp.asarray(rng.randn(6).astype(np.float32))
    bias = jnp.asarray(rng.randn(6).astype(np.float32))
    mod = nn.LayerNorm()
    params = {"params": {"scale": scale, "bias": bias}}
    want = mod.apply(params, x)
    got = pk.unpack_w(
        pk.packed_layer_norm(pk.pack_w(x, F), scale, bias, F), F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_smooth_layer_matches():
    from diff_unet_tpu.models.smooth_diff_unet import (
        PackedSmoothLayer,
        SmoothLayer,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, 6, 8, 5).astype(np.float32))
    ref = SmoothLayer((6, 6, 8))
    params = ref.init(jax.random.key(0), x)
    want = ref.apply(params, x)
    packed = PackedSmoothLayer((6, 6, 8), F)
    got = pk.unpack_w(packed.apply(params, pk.pack_w(x, F)), F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _models():
    from diff_unet_tpu.models.smooth_diff_unet import SmoothDiffUNet

    kw = dict(out_channels=C, image_size=S, spatial_size=S,
              features=FEATURES)
    return SmoothDiffUNet(**kw), SmoothDiffUNet(pack=F, **kw)


def test_smooth_packed_denoise_matches():
    ref, packed = _models()
    rng = np.random.RandomState(2)
    image = jnp.asarray(rng.randn(1, S, S, S, 1).astype(np.float32))
    x = jnp.asarray(rng.randn(1, S, S, S, C).astype(np.float32))
    t = jnp.asarray([3], jnp.int32)
    params = ref.init(jax.random.key(0), image, x, t)
    # identical parameter trees: the packed model consumes the unpacked
    # model's params directly
    want = ref.apply(params, image, x, t)
    got = packed.apply(params, image, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_smooth_packed_ddim_matches():
    from diff_unet_tpu.api import DiffusionSegmenter

    ref, packed = _models()
    seg_ref = DiffusionSegmenter(module=ref, num_classes=C, sample_steps=2)
    seg_p = DiffusionSegmenter(module=packed, num_classes=C, sample_steps=2)
    shape = (1, S, S, S, 1)
    params = seg_ref.init(jax.random.key(0), shape)
    image = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    want = seg_ref.ddim_sample(params, image, jax.random.key(2))
    got = seg_p.ddim_sample(params, image, jax.random.key(2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
