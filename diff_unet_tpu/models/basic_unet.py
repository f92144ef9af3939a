"""BasicUNet encoder and time-conditioned denoiser (channel-last, TPU-first).

Capability parity with the reference's
- `BasicUNetEncoder` (models/basic_unet/pretrained/basic_unet.py:419-512):
  5-level conv encoder returning all five feature maps, and
- `BasicUNetRDenoiser` (models/basic_unet/denoiser.py:196-312): UNet whose
  forward concatenates [image, x_t] on channels, adds the image-encoder
  feature map `embeddings[i]` at each encoder level, runs four UpCat decoder
  stages with timestep FiLM, and a 1x1 final conv to class logits.

Redesigned NDHWC with explicit temb threading; default features
(64, 64, 128, 256, 512, 64) as instantiated by DiffUNet
(models/diff_unet.py:33-35).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from diff_unet_tpu.ops.blocks import Down, TimestepEmbedder, TwoConv, UpCat

DEFAULT_FEATURES = (64, 64, 128, 256, 512, 64)


class BasicUNetEncoder(nn.Module):
    """Five-level conv encoder; returns the list of all level feature maps."""
    features: Sequence[int] = DEFAULT_FEATURES
    negative_slope: float = 0.1
    remat: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        fea = tuple(self.features)
        # block-level rematerialisation: only stage outputs are saved for
        # the backward pass (96^3 batches do not fit 16G HBM otherwise)
        TC = nn.remat(TwoConv) if self.remat else TwoConv
        Dn = nn.remat(Down) if self.remat else Down
        outs = [TC(fea[0], use_temb=False, dtype=self.dtype,
                   name="conv_0")(x)]
        for i in range(4):
            outs.append(
                Dn(fea[i + 1], use_temb=False, dtype=self.dtype,
                   name=f"down_{i + 1}")(outs[-1])
            )
        return outs


class BasicUNetDenoiser(nn.Module):
    """Time-conditioned UNet denoiser with encoder-feature skip additions."""
    out_channels: int
    features: Sequence[int] = DEFAULT_FEATURES
    negative_slope: float = 0.1
    norm: str = "instance"
    remat: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        embeddings: Optional[Sequence[jnp.ndarray]] = None,
        image: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        fea = tuple(self.features)
        TwoConvB = nn.remat(TwoConv) if self.remat else TwoConv
        DownB = nn.remat(Down) if self.remat else Down
        UpCatB = nn.remat(UpCat) if self.remat else UpCat
        temb = TimestepEmbedder(dtype=self.dtype, name="temb")(t)

        if image is not None:
            x = jnp.concatenate([image, x], axis=-1)

        x0 = TwoConvB(fea[0], norm=self.norm, dtype=self.dtype,
                     name="conv_0")(x, temb)
        if embeddings is not None:
            x0 = x0 + embeddings[0]
        x1 = DownB(fea[1], norm=self.norm, dtype=self.dtype, name="down_1")(x0, temb)
        if embeddings is not None:
            x1 = x1 + embeddings[1]
        x2 = DownB(fea[2], norm=self.norm, dtype=self.dtype, name="down_2")(x1, temb)
        if embeddings is not None:
            x2 = x2 + embeddings[2]
        x3 = DownB(fea[3], norm=self.norm, dtype=self.dtype, name="down_3")(x2, temb)
        if embeddings is not None:
            x3 = x3 + embeddings[3]
        x4 = DownB(fea[4], norm=self.norm, dtype=self.dtype, name="down_4")(x3, temb)
        if embeddings is not None:
            x4 = x4 + embeddings[4]

        u4 = UpCatB(fea[3], fea[4] // 2, norm=self.norm, dtype=self.dtype,
                   name="upcat_4")(x4, x3, temb)
        u3 = UpCatB(fea[2], fea[3] // 2, norm=self.norm, dtype=self.dtype,
                   name="upcat_3")(u4, x2, temb)
        u2 = UpCatB(fea[1], fea[2] // 2, norm=self.norm, dtype=self.dtype,
                   name="upcat_2")(u3, x1, temb)
        # last stage: halves=False (denoiser.py:280)
        u1 = UpCatB(fea[5], fea[1], norm=self.norm, dtype=self.dtype,
                   name="upcat_1")(u2, x0, temb)

        logits = nn.Conv(self.out_channels, kernel_size=(1, 1, 1),
                         dtype=self.dtype, name="final_conv")(u1)
        return logits
