"""Smooth-Diff-UNet: learnable-Laplacian smoothing between encoder levels.

Capability parity with the reference's SmoothDiffUNet
(models/smooth_diff_unet.py:6-30), SmoothUNetEncoder
(models/smooth_unet/encoder.py:12-70: a BasicUNetEncoder with a SmoothLayer
applied before each Down), SmoothLayer (models/smooth_unet/layers.py:6-47:
6-neighbour discrete Laplacian with zero boundary, scaled by a learned
per-voxel weight tensor, residual add) and FFParser
(layers.py:49-70: learned complex spectral filter via 2D rFFT over the last
two spatial dims per depth slice — vendored thrice in the reference,
constructed-but-commented-out of the live encoder path; provided here as a
usable module for capability parity).

TPU notes: the Laplacian stencil is pure rolls+adds — XLA fuses it into one
VPU pass; the FFT path uses jnp.fft.rfft2 (XLA TPU FFT). Channel-last:
learned weights are stored (D, H, W, C).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from diff_unet_tpu.models.basic_unet import (
    DEFAULT_FEATURES,
    BasicUNetDenoiser,
)
from diff_unet_tpu.ops.blocks import Down, TwoConv


class SmoothLayer(nn.Module):
    """x + weight * laplacian6(x), zero-padded boundaries (layers.py:37-47)."""
    spatial_shape: Sequence[int]   # (D, H, W) at this level
    p: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, h, w = self.spatial_shape
        c = x.shape[-1]
        weight = self.param(
            "weights",
            lambda key, shape: 0.5 * nn.initializers.normal(1.0)(key, shape),
            (d, h, w, c),
        )
        p = self.p
        xp = jnp.pad(
            x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)), mode="constant"
        )
        # 6-neighbour stencil as SLICES of the one padded tensor, not
        # jnp.roll: roll lowers to concat, which XLA materialises — at the
        # sw=8 96^3 geometry the 6 rolled copies alone were ~6 GB of HBM
        # temps and pushed the DDIM program to 15.4 GB total (OOM; r5
        # memory_analysis). Slices fuse into the add chain, so the whole
        # Laplacian is one VPU pass over xp. Numerics identical
        # (zero-padded boundaries either way).
        lap = -6.0 * x
        for axis in (1, 2, 3):
            for off in (-p, p):
                sls = [slice(None), slice(p, xp.shape[1] - p),
                       slice(p, xp.shape[2] - p),
                       slice(p, xp.shape[3] - p), slice(None)]
                sls[axis] = slice(p + off, xp.shape[axis] - p + off)
                lap = lap + xp[tuple(sls)]
        lap = lap * weight.astype(x.dtype)
        return x + lap


class FFParser(nn.Module):
    """Learned complex-valued spectral filter over (H, W) per depth slice."""
    spatial_shape: Sequence[int]   # (D, H, W)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d, h, w = self.spatial_shape
        c = x.shape[-1]
        wr = self.param("weight_real",
                        nn.initializers.normal(0.02), (d, h, w // 2 + 1, c))
        wi = self.param("weight_imag",
                        nn.initializers.normal(0.02), (d, h, w // 2 + 1, c))
        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(2, 3), norm="ortho")
        xf = xf * (wr + 1j * wi)
        out = jnp.fft.irfft2(xf, s=(h, w), axes=(2, 3), norm="ortho")
        return out.astype(x.dtype)


class SmoothUNetEncoder(nn.Module):
    """BasicUNetEncoder with SmoothLayers interleaved before each Down
    (encoder.py:62-69)."""
    features: Sequence[int] = DEFAULT_FEATURES
    image_size: int = 96
    spatial_size: int = 96
    smoothing: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        fea = tuple(self.features)
        d, hw = self.spatial_size, self.image_size
        outs = [TwoConv(fea[0], use_temb=False, dtype=self.dtype,
                        name="conv_0")(x)]
        for i in range(4):
            s = outs[i]
            if self.smoothing:
                shape = (d // (2 ** i), hw // (2 ** i), hw // (2 ** i))
                s = SmoothLayer(shape, name=f"smooth_{i}")(s)
            outs.append(
                Down(fea[i + 1], use_temb=False, dtype=self.dtype,
                     name=f"down_{i + 1}")(s)
            )
        return outs


class SmoothDiffUNet(nn.Module):
    """Diffusion model with the smoothing encoder; denoiser identical in
    structure to BasicUNetDenoiser (smooth_unet/denoiser.py forward is the
    same graph; its `smoothing` flag is stored but unused)."""
    out_channels: int
    in_channels: int = 1
    image_size: int = 96
    spatial_size: int = 96
    features: Sequence[int] = DEFAULT_FEATURES
    denoiser_norm: str = "layer"   # SmoothUNetDenoiser default norm "layer"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.embed_model = SmoothUNetEncoder(
            features=self.features, image_size=self.image_size,
            spatial_size=self.spatial_size, dtype=self.dtype,
        )
        self.model = BasicUNetDenoiser(
            out_channels=self.out_channels, features=self.features,
            norm=self.denoiser_norm, dtype=self.dtype,
        )

    def __call__(self, image, x, t):
        return self.denoise(image, x, t)

    def embed(self, image):
        return self.embed_model(image)

    def denoise(self, image, x, t):
        return self.model(x, t, self.embed_model(image), image)

    def denoise_with_embeddings(self, x, t, embeddings, image):
        return self.model(x, t, embeddings, image)
