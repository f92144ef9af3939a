"""Attention-Diff-UNet: attention-gated UNet as the diffusion denoiser.

Capability parity with the reference's AttentionDiffUNet
(models/attention_diff_unet.py:6-31) and
models/attention_unet/attention_unet.py:
- ConvBNReLU pairs (Conv:44-61: conv3 -> BatchNorm -> Dropout -> ReLU, x2),
- UpConv (63-77: nearest 2x upsample -> conv3 -> BN -> ReLU),
- AttentionLayer gating psi = sigma(conv(relu(Wg*g + Wx*x)))  (79-118),
- AttentionCatLayer (224-252: gate + concat + time-conditioned TwoConv),
- AttentionUNetEncoder (254-276) / AttentionUNetDecoder (278-358) with
  per-level embedding additions and features [32, 64, 128, 256, 512]
  (attention_diff_unet.py:15).

BatchNorm is realised as per-batch statistics without running averages
(ops/blocks.BatchStatsNorm; documented deviation keeping the framework
stateless/functional).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from diff_unet_tpu.ops.blocks import (
    BatchStatsNorm,
    TimestepEmbedder,
    TwoConv,
    swish,
)

ATT_FEATURES = (32, 64, 128, 256, 512)


class ConvBNReLU2(nn.Module):
    """(conv3 -> BN -> ReLU) x 2 (reference Conv, attention_unet.py:44-61)."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = BatchStatsNorm(dtype=self.dtype, name=f"norm_{i}")(x)
            x = nn.relu(x)
        return x


class UpConv(nn.Module):
    """Nearest 2x upsample -> conv3 -> BN -> ReLU (attention_unet.py:63-77)."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        n, d, h, w, c = x.shape
        x = jax.image.resize(x, (n, 2 * d, 2 * h, 2 * w, c), "nearest")
        x = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        x = BatchStatsNorm(dtype=self.dtype, name="norm")(x)
        return nn.relu(x)


class AttentionCatLayer(nn.Module):
    """Attention gate + concat + conv, then time-conditioned TwoConv
    (attention_unet.py:79-118 + 224-252)."""
    in_features: int        # channels of the deeper input x
    cat_features: int       # channels of the skip x_e
    out_features: int
    halves: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_e, temb):
        f_int = self.out_features // 2
        g = UpConv(self.out_features, dtype=self.dtype, name="up")(x)

        wg = BatchStatsNorm(dtype=self.dtype, name="w_g_norm")(
            nn.Conv(f_int, (1, 1, 1), dtype=self.dtype, name="w_g")(g)
        )
        wx = BatchStatsNorm(dtype=self.dtype, name="w_x_norm")(
            nn.Conv(f_int, (1, 1, 1), dtype=self.dtype, name="w_x")(x_e)
        )
        psi = BatchStatsNorm(dtype=self.dtype, name="psi_norm")(
            nn.Conv(1, (1, 1, 1), dtype=self.dtype,
                    name="psi")(nn.relu(wg + wx))
        )
        psi = jax.nn.sigmoid(psi)
        attended = x_e * psi

        y = ConvBNReLU2(self.out_features, dtype=self.dtype, name="out")(
            jnp.concatenate([attended, g], axis=-1)
        )
        # pad to the skip's shape if odd (attention_unet.py:244-249)
        pads = [(0, 0)] + [
            (0, x_e.shape[i] - y.shape[i]) for i in range(1, 4)
        ] + [(0, 0)]
        if any(p != (0, 0) for p in pads):
            y = jnp.pad(y, pads, mode="edge")
        return TwoConv(self.out_features, norm="instance",
                       dtype=self.dtype, name="convs")(
            jnp.concatenate([x_e, y], axis=-1), temb
        )


class AttentionUNetEncoder(nn.Module):
    """Conv head + 4x (maxpool + conv) feature pyramid
    (attention_unet.py:254-276)."""
    features: Sequence[int] = ATT_FEATURES
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fea = tuple(self.features)
        outs = [ConvBNReLU2(fea[0], dtype=self.dtype, name="head")(x)]
        for i in range(len(fea) - 1):
            h = nn.max_pool(outs[-1], (2, 2, 2), strides=(2, 2, 2))
            outs.append(
                ConvBNReLU2(fea[i + 1], dtype=self.dtype,
                            name=f"down_{i}")(h)
            )
        return outs


class AttentionUNetDecoder(nn.Module):
    """Denoiser: own encoder chain over [image, x_t] with embedding adds,
    then attention-gated upsampling (attention_unet.py:278-358)."""
    out_channels: int
    features: Sequence[int] = ATT_FEATURES
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t, embeddings=None, image=None):
        fea = tuple(self.features)
        temb = TimestepEmbedder(dtype=self.dtype, name="temb")(t)
        if image is not None:
            x = jnp.concatenate([image, x], axis=-1)

        feats = [ConvBNReLU2(fea[0], dtype=self.dtype, name="head")(x)]
        if embeddings is not None:
            feats[0] = feats[0] + embeddings[0]
        for i in range(len(fea) - 1):
            h = nn.max_pool(feats[-1], (2, 2, 2), strides=(2, 2, 2))
            h = ConvBNReLU2(fea[i + 1], dtype=self.dtype, name=f"down_{i}")(h)
            if embeddings is not None:
                h = h + embeddings[i + 1]
            feats.append(h)

        rev = tuple(reversed(fea))  # (512, 256, 128, 64, 32)
        feats = feats[::-1]
        y = None
        for i in range(len(rev) - 1):
            out_ch = rev[i + 1] if rev[i] != rev[i + 1] else rev[i] * 2
            layer = AttentionCatLayer(
                in_features=rev[i], cat_features=rev[i + 1],
                out_features=out_ch, dtype=self.dtype, name=f"up_{i}",
            )
            y = layer(feats[i] if y is None else y, feats[i + 1], temb)

        return nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                       name="out")(y)


class AttentionDiffUNet(nn.Module):
    out_channels: int
    in_channels: int = 1
    features: Sequence[int] = ATT_FEATURES
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.embed_model = AttentionUNetEncoder(
            features=self.features, dtype=self.dtype
        )
        self.model = AttentionUNetDecoder(
            out_channels=self.out_channels, features=self.features,
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
