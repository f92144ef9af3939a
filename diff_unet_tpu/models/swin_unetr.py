"""Swin-UNETR family: diffusion denoiser, image encoder, plain baseline.

Capability parity with:
- time-conditioned UNETR conv blocks — UnetrUpBlock / UnetrBasicBlock /
  UnetResBlock with t_proj FiLM between convs, UnetOutBlock
  (models/swin_unetr/blocks.py:26-338),
- SwinUNETREncoder — standard (un-timed) Swin ViT over the image + four
  UnetrBasicBlocks, returning [hidden_states, enc0..enc3]
  (models/swin_unetr/encoder.py:19-218),
- SwinUNETRDenoiser — time-injected Swin ViT over [image, x_t], conditioning
  embeddings added per stage, reverse-attention residuals r = x*(1-sigmoid(x))
  injected into the decoder, UnetOutBlock logits
  (models/swin_unetr/denoiser.py:36-408),
- DiffSwinUNETR — encoder+denoiser with feature_size=48, noise_ratio plumbed
  (models/diff_swin_unetr.py:7-48, model_hub.py:29-35),
- SwinUNETR — the non-diffusion baseline (models/swin_unetr/swin_unetr.py:29-297).

All channel-last; LeakyReLU slope 0.01 in UNETR res-blocks (MONAI
dynunet default, blocks.py:246).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diff_unet_tpu.ops.blocks import InstanceNorm, TimestepEmbedder, swish
from diff_unet_tpu.ops.swin import SwinTransformer


class UnetResBlock(nn.Module):
    """conv -> norm -> lrelu [-> +t_proj] -> conv -> norm (+skip) -> lrelu
    (blocks.py:237-316; t FiLM at blocks.py:304).

    quantize=True runs the convs W8A8 on the int8 MXU path (ops/int8.py,
    dynamic per-tensor act scales) — inference-only, param tree unchanged."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    time_conditioned: bool = True
    negative_slope: float = 0.01
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    def _conv(self, name, x, k, s):
        if self.quantize:
            from diff_unet_tpu.ops import int8 as q
            from diff_unet_tpu.ops.blocks import (
                ConvParams, quant_act_scale, quant_weights,
            )
            kr, b = ConvParams(self.out_channels, x.shape[-1],
                               kernel=k, name=name)()
            wq = quant_weights(self, f"{name}_wq",
                               lambda: q.quantize_kernel(kr))
            sa = quant_act_scale(self, f"{name}_sa", x)
            acc = q.conv_int8(q.quantize_act(x, sa), wq[0], strides=s)
            return q.rescale(acc, sa, wq[1], b, self.dtype or x.dtype)
        return nn.Conv(self.out_channels, k, strides=s, padding="SAME",
                       dtype=self.dtype, name=name)(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        residual = x
        k = (self.kernel_size,) * 3
        s = (self.stride,) * 3
        h = self._conv("conv1", x, k, s)
        h = InstanceNorm(dtype=self.dtype, name="norm1")(h)
        h = nn.leaky_relu(h, self.negative_slope)
        if self.time_conditioned and temb is not None:
            proj = nn.Dense(self.out_channels, dtype=self.dtype,
                            name="t_proj")(swish(temb))
            h = h + proj[:, None, None, None, :].astype(h.dtype)
        h = self._conv("conv2", h, k, (1, 1, 1))
        h = InstanceNorm(dtype=self.dtype, name="norm2")(h)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            residual = self._conv("conv3", residual, (1, 1, 1), s)
            residual = InstanceNorm(dtype=self.dtype, name="norm3")(residual)
        return nn.leaky_relu(h + residual, self.negative_slope)


class UnetrBasicBlock(nn.Module):
    """Residual conv block wrapper (blocks.py:95-160)."""
    out_channels: int
    time_conditioned: bool = True
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, temb=None):
        return UnetResBlock(
            self.out_channels, time_conditioned=self.time_conditioned,
            quantize=self.quantize, dtype=self.dtype, name="layer",
        )(x, temb)


class UnetrUpBlock(nn.Module):
    """Transp-conv 2x -> concat skip -> UnetResBlock (blocks.py:26-93)."""
    out_channels: int
    time_conditioned: bool = True
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, skip, temb=None):
        h = nn.ConvTranspose(self.out_channels, (2, 2, 2), strides=(2, 2, 2),
                             dtype=self.dtype, name="transp_conv")(x)
        h = jnp.concatenate([h, skip], axis=-1)
        return UnetResBlock(
            self.out_channels, time_conditioned=self.time_conditioned,
            quantize=self.quantize, dtype=self.dtype, name="conv_block",
        )(h, temb)


def reverse_attention(x: jnp.ndarray) -> jnp.ndarray:
    """r = x * (1 - sigmoid(x)) (denoiser.py:405-408)."""
    return x * (1.0 - jax.nn.sigmoid(x))


class SwinUNETREncoder(nn.Module):
    """Image embedder: un-timed Swin ViT + 4 conv encoders
    (encoder.py:212-218 returns [hidden_states, enc0..enc3])."""
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    normalize: bool = True
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        hidden = SwinTransformer(
            embed_dim=self.feature_size, depths=self.depths,
            num_heads=self.num_heads, time_conditioned=False,
            normalize=self.normalize, dtype=self.dtype, name="swinViT",
        )(x)
        fs = self.feature_size
        qz = self.quantize
        enc0 = UnetrBasicBlock(fs, time_conditioned=False, quantize=qz,
                               dtype=self.dtype, name="encoder1")(x)
        enc1 = UnetrBasicBlock(fs, time_conditioned=False, quantize=qz,
                               dtype=self.dtype, name="encoder2")(hidden[0])
        enc2 = UnetrBasicBlock(2 * fs, time_conditioned=False, quantize=qz,
                               dtype=self.dtype, name="encoder3")(hidden[1])
        enc3 = UnetrBasicBlock(4 * fs, time_conditioned=False, quantize=qz,
                               dtype=self.dtype, name="encoder4")(hidden[2])
        return (tuple(hidden), enc0, enc1, enc2, enc3)


class SwinUNETRDenoiser(nn.Module):
    """Time-conditioned Swin-UNETR denoiser with reverse-attention decoder
    residuals (denoiser.py:353-408)."""
    out_channels: int
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    noise_ratio: float = 0.5  # stored-only in the reference (denoiser.py:131)
    normalize: bool = True
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t, embeddings=None, image=None):
        temb = TimestepEmbedder(dtype=self.dtype, name="t_embedder")(t)
        if image is not None:
            x = jnp.concatenate([image, x], axis=-1)

        hidden = SwinTransformer(
            embed_dim=self.feature_size, depths=self.depths,
            num_heads=self.num_heads, time_conditioned=True,
            normalize=self.normalize, dtype=self.dtype, name="swinViT",
        )(x, temb)

        if embeddings is not None:
            cond_hidden, cond0, cond1, cond2, cond3 = embeddings
            hidden = [h + c for h, c in zip(hidden, cond_hidden)]

        fs = self.feature_size
        qz = self.quantize
        enc0 = UnetrBasicBlock(fs, quantize=qz, dtype=self.dtype,
                               name="encoder1")(x, temb)
        if embeddings is not None:
            enc0 = enc0 + cond0
        r0 = reverse_attention(enc0)
        enc1 = UnetrBasicBlock(fs, quantize=qz, dtype=self.dtype,
                               name="encoder2")(hidden[0], temb)
        if embeddings is not None:
            enc1 = enc1 + cond1
        r1 = reverse_attention(enc1)
        enc2 = UnetrBasicBlock(2 * fs, quantize=qz, dtype=self.dtype,
                               name="encoder3")(hidden[1], temb)
        if embeddings is not None:
            enc2 = enc2 + cond2
        r2 = reverse_attention(enc2)
        enc3 = UnetrBasicBlock(4 * fs, quantize=qz, dtype=self.dtype,
                               name="encoder4")(hidden[2], temb)
        if embeddings is not None:
            enc3 = enc3 + cond3
        r3 = reverse_attention(enc3)

        dec4 = UnetrBasicBlock(16 * fs, quantize=qz, dtype=self.dtype,
                               name="encoder10")(hidden[4], temb)
        dec3 = UnetrUpBlock(8 * fs, quantize=qz, dtype=self.dtype,
                            name="decoder5")(dec4, hidden[3], temb)
        dec2 = UnetrUpBlock(4 * fs, quantize=qz, dtype=self.dtype,
                            name="decoder4")(dec3, enc3, temb) + r3
        dec1 = UnetrUpBlock(2 * fs, quantize=qz, dtype=self.dtype,
                            name="decoder3")(dec2, enc2, temb) + r2
        dec0 = UnetrUpBlock(fs, quantize=qz, dtype=self.dtype,
                            name="decoder2")(dec1, enc1, temb) + r1
        out = UnetrUpBlock(fs, quantize=qz, dtype=self.dtype,
                           name="decoder1")(dec0, enc0, temb) + r0
        return nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                       name="out")(out)


class DiffSwinUNETR(nn.Module):
    """Diffusion Swin-UNETR (models/diff_swin_unetr.py:7-48)."""
    out_channels: int
    in_channels: int = 1
    image_size: Tuple[int, int, int] = (96, 96, 96)
    feature_size: int = 48
    noise_ratio: float = 0.5
    quantize: bool = False   # W8A8 int8 UNETR conv blocks (inference-only)
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        for m in self.image_size:
            assert m % 32 == 0, (
                "image size must be divisible by 2^5 for the Swin pyramid"
            )
        self.embed_model = SwinUNETREncoder(
            feature_size=self.feature_size, quantize=self.quantize,
            dtype=self.dtype
        )
        self.model = SwinUNETRDenoiser(
            out_channels=self.out_channels, feature_size=self.feature_size,
            noise_ratio=self.noise_ratio, quantize=self.quantize,
            dtype=self.dtype,
        )

    def __call__(self, image, x, t):
        return self.denoise(image, x, t)

    def embed(self, image):
        return self.embed_model(image)

    def denoise(self, image, x, t):
        return self.model(x, t, self.embed_model(image), image)

    def denoise_with_embeddings(self, x, t, embeddings, image):
        return self.model(x, t, embeddings, image)


class SwinUNETR(nn.Module):
    """Plain (non-diffusion) Swin-UNETR segmentation baseline
    (models/swin_unetr/swin_unetr.py:29-297): same topology as the denoiser
    minus timestep conditioning, conditioning embeddings, and reverse
    attention."""
    out_channels: int
    in_channels: int = 1
    image_size: Tuple[int, int, int] = (96, 96, 96)
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    normalize: bool = True
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        hidden = SwinTransformer(
            embed_dim=self.feature_size, depths=self.depths,
            num_heads=self.num_heads, time_conditioned=False,
            normalize=self.normalize, dtype=self.dtype, name="swinViT",
        )(x)
        fs = self.feature_size
        enc0 = UnetrBasicBlock(fs, time_conditioned=False, dtype=self.dtype,
                               name="encoder1")(x)
        enc1 = UnetrBasicBlock(fs, time_conditioned=False, dtype=self.dtype,
                               name="encoder2")(hidden[0])
        enc2 = UnetrBasicBlock(2 * fs, time_conditioned=False,
                               dtype=self.dtype, name="encoder3")(hidden[1])
        enc3 = UnetrBasicBlock(4 * fs, time_conditioned=False,
                               dtype=self.dtype, name="encoder4")(hidden[2])
        dec4 = UnetrBasicBlock(16 * fs, time_conditioned=False,
                               dtype=self.dtype, name="encoder10")(hidden[4])
        dec3 = UnetrUpBlock(8 * fs, time_conditioned=False, dtype=self.dtype,
                            name="decoder5")(dec4, hidden[3])
        dec2 = UnetrUpBlock(4 * fs, time_conditioned=False, dtype=self.dtype,
                            name="decoder4")(dec3, enc3)
        dec1 = UnetrUpBlock(2 * fs, time_conditioned=False, dtype=self.dtype,
                            name="decoder3")(dec2, enc2)
        dec0 = UnetrUpBlock(fs, time_conditioned=False, dtype=self.dtype,
                            name="decoder2")(dec1, enc1)
        out = UnetrUpBlock(fs, time_conditioned=False, dtype=self.dtype,
                           name="decoder1")(dec0, enc0)
        return nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                       name="out")(out)
