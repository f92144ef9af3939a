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

from diff_unet_tpu.ops import packed as pk
from diff_unet_tpu.ops.blocks import (
    ConvParams,
    InstanceNorm,
    NormParams,
    TimestepEmbedder,
    quant_act_scale,
    quant_weights,
    swish,
)
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


# ---------------------------------------------------------------------------
# Channel-packed (pack-2) execution for the full-resolution (96^3) blocks.
#
# feature_size=48 pads to 128 lanes on v5e (2.67x tile waste) exactly like
# C=64 did for BasicUNet; pack-2 folds two W positions into channels
# (48 -> 96, 1.33x) and halves the HBM footprint of every 96^3 tensor.
# Only the ops that touch full resolution change layout — the Swin pyramid
# (<= 48^3) is untouched: the stride-2 patch embed consumes one packed
# column per output position (ops/packed.py:packed_patch_embed2) and emits
# the usual unpacked half-resolution embedding. Parameter trees are
# IDENTICAL to the unpacked modules (packed kernels are assembled from the
# original weights at apply time), so checkpoints are interchangeable.
# ---------------------------------------------------------------------------


class PackedUnetResBlock(nn.Module):
    """UnetResBlock executed in pack-f space (param tree identical).

    `in_groups` describes the packed-channel layout of the input
    (ops/packed.py:InGroup); quantize=True runs the convs W8A8 on the int8
    MXU path — inference-only, params stay float."""
    out_channels: int
    in_channels: int            # ORIGINAL (unpacked) input channels
    f: int = 2
    time_conditioned: bool = True
    negative_slope: float = 0.01
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    def _conv(self, name, x_p, cin, k, in_groups):
        kr, b = ConvParams(self.out_channels, cin, kernel=k, name=name)()
        if self.quantize:
            wq = quant_weights(
                self, f"{name}_wq",
                lambda: pk.quantize_packed_kernel(kr, self.f, in_groups))
            sa = quant_act_scale(self, f"{name}_sa", x_p)
            return pk.packed_conv_int8(x_p, None, b, self.f, in_groups,
                                       out_dtype=self.dtype or x_p.dtype,
                                       wq=wq, sa=sa)
        return pk.packed_conv(x_p, kr, b, self.f, in_groups, dtype=self.dtype)

    def _norm(self, name, x_p):
        scale, bias = NormParams(self.out_channels, name=name)()
        return pk.packed_instance_norm(x_p, scale, bias, self.f,
                                       dtype=self.dtype)

    @nn.compact
    def __call__(self, x_p: jnp.ndarray,
                 temb: Optional[jnp.ndarray] = None,
                 in_groups=None) -> jnp.ndarray:
        f = self.f
        cin = self.in_channels
        if cin == self.out_channels:
            # identity residual: input must be in the default packed layout
            assert in_groups is None, "identity skip needs default layout"
        h = self._conv("conv1", x_p, cin, (3, 3, 3), in_groups)
        h = self._norm("norm1", h)
        h = nn.leaky_relu(h, self.negative_slope)
        if self.time_conditioned and temb is not None:
            proj = nn.Dense(self.out_channels, dtype=self.dtype,
                            name="t_proj")(swish(temb))
            proj_p = jnp.tile(proj, (1, f))
            h = h + proj_p[:, None, None, None, :].astype(h.dtype)
        h = self._conv("conv2", h, self.out_channels, (3, 3, 3), None)
        h = self._norm("norm2", h)
        if cin != self.out_channels:
            residual = self._conv("conv3", x_p, cin, (1, 1, 1), in_groups)
            residual = self._norm("norm3", residual)
        else:
            residual = x_p
        return nn.leaky_relu(h + residual, self.negative_slope)


class PackedUnetrBasicBlock(nn.Module):
    """UnetrBasicBlock in pack-f space (scope name "layer" preserved)."""
    out_channels: int
    in_channels: int
    f: int = 2
    time_conditioned: bool = True
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_p, temb=None, in_groups=None):
        return PackedUnetResBlock(
            self.out_channels, self.in_channels, self.f,
            time_conditioned=self.time_conditioned, quantize=self.quantize,
            dtype=self.dtype, name="layer",
        )(x_p, temb, in_groups)


class PackedUnetrUpBlockEnter(nn.Module):
    """UnetrUpBlock whose transp-conv ENTERS pack-2 space: unpacked
    half-resolution input -> packed full-resolution output, concat with the
    packed skip, PackedUnetResBlock (scope names preserved)."""
    out_channels: int
    skip_channels: int
    f: int = 2
    time_conditioned: bool = True
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, skip_p, temb=None):
        k, b = ConvParams(self.out_channels, x.shape[-1],
                          kernel=(2, 2, 2), name="transp_conv")()
        if self.quantize:
            from diff_unet_tpu.ops import int8 as q
            wq = quant_weights(
                self, "up_wq",
                lambda: q.quantize_kernel(pk.deconv2_enter_kernel(
                    k.astype(jnp.float32))))
            sa = quant_act_scale(self, "up_sa", x)
            h_p = pk.packed_deconv2_enter_int8(
                x, None, b, self.f, out_dtype=self.dtype or x.dtype,
                wq=wq, sa=sa)
        else:
            h_p = pk.packed_deconv2_enter(x, k, b, self.f, dtype=self.dtype)
        cat = jnp.concatenate([h_p, skip_p], axis=-1)
        groups = pk.concat_groups([self.out_channels, self.skip_channels],
                                  self.f)
        return PackedUnetResBlock(
            self.out_channels, self.out_channels + self.skip_channels,
            self.f, time_conditioned=self.time_conditioned,
            quantize=self.quantize, dtype=self.dtype, name="conv_block",
        )(cat, temb, groups)


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
    in_channels: int = 1
    pack: int = 1
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, packed: bool = False):
        """`packed=True` consumes a pack-2 image and returns enc0 packed
        (everything else, the Swin pyramid included, is unpacked)."""
        f = self.pack
        groups = pk.default_groups(self.in_channels, f) if packed else None
        hidden = SwinTransformer(
            embed_dim=self.feature_size, depths=self.depths,
            num_heads=self.num_heads, time_conditioned=False,
            normalize=self.normalize, dtype=self.dtype, name="swinViT",
        )(x, packed_groups=groups)
        fs = self.feature_size
        qz = self.quantize
        if packed:
            enc0 = PackedUnetrBasicBlock(
                fs, self.in_channels, f, time_conditioned=False, quantize=qz,
                dtype=self.dtype, name="encoder1")(x, None, groups)
        else:
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
    in_channels: int = 1       # conditioning-image channels
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    noise_ratio: float = 0.5  # stored-only in the reference (denoiser.py:131)
    normalize: bool = True
    pack: int = 1
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t, embeddings=None, image=None,
                 packed: bool = False):
        """`packed=True`: x/image arrive pack-2, enc0 in `embeddings` is
        pack-2, and the returned logits are pack-2 (full-resolution tensors
        never leave the 128-lane-dense layout)."""
        f = self.pack
        temb = TimestepEmbedder(dtype=self.dtype, name="t_embedder")(t)
        groups = None
        if image is not None:
            c_img = image.shape[-1] // (f if packed else 1)
            c_x = x.shape[-1] // (f if packed else 1)
            cin = c_img + c_x
            x = jnp.concatenate([image, x], axis=-1)
            if packed:
                groups = pk.concat_groups([c_img, c_x], f)
        else:
            cin = x.shape[-1] // (f if packed else 1)
            if packed:
                groups = pk.default_groups(cin, f)

        hidden = SwinTransformer(
            embed_dim=self.feature_size, depths=self.depths,
            num_heads=self.num_heads, time_conditioned=True,
            normalize=self.normalize, dtype=self.dtype, name="swinViT",
        )(x, temb, packed_groups=groups)

        if embeddings is not None:
            cond_hidden, cond0, cond1, cond2, cond3 = embeddings
            hidden = [h + c for h, c in zip(hidden, cond_hidden)]

        fs = self.feature_size
        qz = self.quantize
        if packed:
            enc0 = PackedUnetrBasicBlock(
                fs, cin, f, quantize=qz, dtype=self.dtype,
                name="encoder1")(x, temb, groups)
        else:
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
        if packed:
            out = PackedUnetrUpBlockEnter(
                fs, fs, f, quantize=qz, dtype=self.dtype,
                name="decoder1")(dec0, enc0, temb) + r0
            ok, ob = ConvParams(self.out_channels, fs,
                                kernel=(1, 1, 1), name="out")()
            return pk.packed_conv(out, ok, ob, f, dtype=self.dtype)
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
    pack: int = 1            # 2 = pack the full-resolution blocks
    quantize: bool = False   # W8A8 int8 UNETR conv blocks (inference-only)
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        for m in self.image_size:
            assert m % 32 == 0, (
                "image size must be divisible by 2^5 for the Swin pyramid"
            )
        self.embed_model = SwinUNETREncoder(
            feature_size=self.feature_size, in_channels=self.in_channels,
            pack=self.pack, quantize=self.quantize, dtype=self.dtype,
        )
        self.model = SwinUNETRDenoiser(
            out_channels=self.out_channels, in_channels=self.in_channels,
            feature_size=self.feature_size, noise_ratio=self.noise_ratio,
            pack=self.pack, quantize=self.quantize, dtype=self.dtype,
        )

    def __call__(self, image, x, t):
        return self.denoise(image, x, t)

    def embed(self, image):
        return self.embed_model(image)

    def embed_packed(self, image_p):
        """Packed-layout embeddings for the packed DDIM loop: enc0 (the one
        full-resolution embedding) stays pack-2; the Swin pyramid and
        enc1-enc3 are unpacked as always."""
        assert self.pack > 1
        return self.embed_model(image_p, packed=True)

    def denoise(self, image, x, t):
        if self.pack > 1:
            f = self.pack
            image_p = pk.pack_w(image, f)
            emb_p = self.embed_model(image_p, packed=True)
            out = self.model(pk.pack_w(x, f), t, emb_p, image_p, packed=True)
            return pk.unpack_w(out, f)
        return self.model(x, t, self.embed_model(image), image)

    def denoise_with_embeddings(self, x, t, embeddings, image):
        if self.pack > 1:
            f = self.pack
            emb_p = tuple(embeddings[:1]) + (pk.pack_w(embeddings[1], f),) \
                + tuple(embeddings[2:])
            out = self.model(pk.pack_w(x, f), t, emb_p, pk.pack_w(image, f),
                             packed=True)
            return pk.unpack_w(out, f)
        return self.model(x, t, embeddings, image)

    def denoise_packed(self, x_p, t, embeddings_packed, image_p):
        """Fully-packed denoiser call for the packed DDIM loop (api.py):
        state, conditioning image, and enc0 stay pack-2 across all steps."""
        assert self.pack > 1
        return self.model(x_p, t, embeddings_packed, image_p, packed=True)


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
