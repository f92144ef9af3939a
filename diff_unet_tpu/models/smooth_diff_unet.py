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
    BasicUNetDenoiserPacked,
    PackedTwoConv,
    _PackedDownConvs,
    _PlainDownConvs,
    pack_embeddings,
)
from diff_unet_tpu.ops import packed as pk
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


class PackedSmoothLayer(nn.Module):
    """SmoothLayer on a pack-2 tensor (B, D, H, W/2, 2C) — parameter tree
    identical to SmoothLayer (the (D, H, W, C) `weights` param packs by the
    same row-major reshape as pack_w, so checkpoints are interchangeable).

    D/H neighbours live in the same packed column and are plain slice-adds;
    W neighbours cross the w-offset blocks: for the even block (w = 2w')
    the left/right neighbours are the odd block at w'-1 / w', and for the
    odd block (w = 2w'+1) they are the even block at w' / w'+1 — with zero
    boundary columns at w'=0 / w'=Wp-1 (exactly the zero-padded stencil of
    the unpacked layer)."""
    spatial_shape: Sequence[int]   # ORIGINAL (D, H, W) at this level
    f: int = 2
    p: int = 1

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        assert self.f == 2 and self.p == 1, (self.f, self.p)
        d, h, w = self.spatial_shape
        c = xp.shape[-1] // self.f
        weight = self.param(
            "weights",
            lambda key, shape: 0.5 * nn.initializers.normal(1.0)(key, shape),
            (d, h, w, c),
        )
        w_p = weight.reshape(d, h, w // self.f, self.f * c)  # == pack_w
        # D/H stencil: one zero-pad of the packed tensor, fused slice-adds
        padded = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        lap = -6.0 * xp
        lap = lap + padded[:, :-2, 1:-1] + padded[:, 2:, 1:-1]
        lap = lap + padded[:, 1:-1, :-2] + padded[:, 1:-1, 2:]
        # W stencil across the w-offset blocks
        even, odd = xp[..., :c], xp[..., c:]
        zero_col = jnp.zeros_like(odd[:, :, :, :1, :])
        left_even = jnp.concatenate([zero_col, odd[:, :, :, :-1]], axis=3)
        right_odd = jnp.concatenate([even[:, :, :, 1:], zero_col], axis=3)
        lap = lap + jnp.concatenate(
            [left_even + odd, even + right_odd], axis=-1)
        return xp + lap * w_p.astype(xp.dtype)


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


class SmoothUNetEncoderPacked(nn.Module):
    """SmoothUNetEncoder executed with the two C=64 levels in pack-2 layout
    (the BasicUNetEncoderPacked treatment + PackedSmoothLayer at levels
    0-1). Parameter tree identical to SmoothUNetEncoder; checkpoints are
    interchangeable."""
    features: Sequence[int] = DEFAULT_FEATURES
    in_channels: int = 1
    image_size: int = 96
    spatial_size: int = 96
    smoothing: bool = True
    pack: int = 2
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        f = self.pack
        fea = tuple(self.features)
        d, hw = self.spatial_size, self.image_size
        self.conv_0 = PackedTwoConv(
            fea[0], self.in_channels, f, use_temb=False, dtype=self.dtype)
        self.smooth_0 = PackedSmoothLayer((d, hw, hw), f)
        self.down_1 = _PackedDownConvs(fea[1], fea[0], f, dtype=self.dtype)
        self.smooth_1 = PackedSmoothLayer((d // 2, hw // 2, hw // 2), f)
        self.down_2 = _PlainDownConvs(fea[2], dtype=self.dtype)
        self.smooth_2 = SmoothLayer((d // 4, hw // 4, hw // 4))
        self.down_3 = Down(fea[3], use_temb=False, dtype=self.dtype)
        self.smooth_3 = SmoothLayer((d // 8, hw // 8, hw // 8))
        self.down_4 = Down(fea[4], use_temb=False, dtype=self.dtype)

    def embed_packed(self, image_p: jnp.ndarray) -> list[jnp.ndarray]:
        f = self.pack
        x0 = self.conv_0(image_p, None,
                         pk.default_groups(self.in_channels, f))
        s0 = self.smooth_0(x0) if self.smoothing else x0
        x1 = self.down_1(pk.packed_maxpool2(s0, f), None)
        s1 = self.smooth_1(x1) if self.smoothing else x1
        x2 = self.down_2(pk.packed_maxpool2(s1, f, repack=False), None)
        s2 = self.smooth_2(x2) if self.smoothing else x2
        x3 = self.down_3(s2, None)
        s3 = self.smooth_3(x3) if self.smoothing else x3
        x4 = self.down_4(s3, None)
        return [x0, x1, x2, x3, x4]

    def __call__(self, image: jnp.ndarray) -> list[jnp.ndarray]:
        f = self.pack
        outs = self.embed_packed(pk.pack_w(image, f))
        return [pk.unpack_w(e, f) if i < 2 else e
                for i, e in enumerate(outs)]


class SmoothDiffUNet(nn.Module):
    """Diffusion model with the smoothing encoder; denoiser identical in
    structure to BasicUNetDenoiser (smooth_unet/denoiser.py forward is the
    same graph; its `smoothing` flag is stored but unused).

    `pack=2` runs the DiffUNet channel-packing treatment (ops/packed.py):
    the two C=64 pyramid levels of BOTH the smoothing encoder and the
    denoiser execute 128-lane-dense, with the denoiser's layer norm packed
    via the exact (f, C) per-voxel regroup (pk.packed_layer_norm).
    Parameter trees are identical across pack settings."""
    out_channels: int
    in_channels: int = 1
    image_size: int = 96
    spatial_size: int = 96
    features: Sequence[int] = DEFAULT_FEATURES
    denoiser_norm: str = "layer"   # SmoothUNetDenoiser default norm "layer"
    pack: int = 1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        if self.pack > 1:
            self.embed_model = SmoothUNetEncoderPacked(
                features=self.features, in_channels=self.in_channels,
                image_size=self.image_size, spatial_size=self.spatial_size,
                pack=self.pack, dtype=self.dtype,
            )
            self.model = BasicUNetDenoiserPacked(
                out_channels=self.out_channels, features=self.features,
                norm=self.denoiser_norm, pack=self.pack, dtype=self.dtype,
            )
        else:
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

    def embed_packed(self, image_p):
        assert self.pack > 1
        return self.embed_model.embed_packed(image_p)

    def denoise(self, image, x, t):
        if self.pack > 1:
            f = self.pack
            image_p = pk.pack_w(image, f)
            emb_p = self.embed_model.embed_packed(image_p)
            out = self.model(pk.pack_w(x, f), t, emb_p, image_p)
            return pk.unpack_w(out, f)
        return self.model(x, t, self.embed_model(image), image)

    def denoise_with_embeddings(self, x, t, embeddings, image):
        if self.pack > 1:
            f = self.pack
            out = self.model(
                pk.pack_w(x, f), t, pack_embeddings(embeddings, f),
                pk.pack_w(image, f),
            )
            return pk.unpack_w(out, f)
        return self.model(x, t, embeddings, image)

    def denoise_packed(self, x_p, t, embeddings_packed, image_p):
        assert self.pack > 1
        return self.model(x_p, t, embeddings_packed, image_p)
