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

from diff_unet_tpu.ops import packed as pk
from diff_unet_tpu.ops.blocks import (
    ConvParams,
    Down,
    TimestepEmbedder,
    TwoConv,
    UpCat,
    quant_act_scale,
    quant_weights,
    swish,
)

DEFAULT_FEATURES = (64, 64, 128, 256, 512, 64)


class BasicUNetEncoder(nn.Module):
    """Five-level conv encoder; returns the list of all level feature maps."""
    features: Sequence[int] = DEFAULT_FEATURES
    negative_slope: float = 0.1
    remat: bool = False
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        fea = tuple(self.features)
        # block-level rematerialisation: only stage outputs are saved for
        # the backward pass (96^3 batches do not fit 16G HBM otherwise)
        TC = nn.remat(TwoConv) if self.remat else TwoConv
        Dn = nn.remat(Down) if self.remat else Down
        outs = [TC(fea[0], use_temb=False, quantize=self.quantize,
                   dtype=self.dtype, name="conv_0")(x)]
        for i in range(4):
            outs.append(
                Dn(fea[i + 1], use_temb=False, quantize=self.quantize,
                   dtype=self.dtype, name=f"down_{i + 1}")(outs[-1])
            )
        return outs


class BasicUNetDenoiser(nn.Module):
    """Time-conditioned UNet denoiser with encoder-feature skip additions."""
    out_channels: int
    features: Sequence[int] = DEFAULT_FEATURES
    negative_slope: float = 0.1
    norm: str = "instance"
    remat: bool = False
    quantize: bool = False
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
        qz = self.quantize
        temb = TimestepEmbedder(dtype=self.dtype, name="temb")(t)

        if image is not None:
            x = jnp.concatenate([image, x], axis=-1)

        x0 = TwoConvB(fea[0], norm=self.norm, quantize=qz, dtype=self.dtype,
                     name="conv_0")(x, temb)
        if embeddings is not None:
            x0 = x0 + embeddings[0]
        x1 = DownB(fea[1], norm=self.norm, quantize=qz, dtype=self.dtype,
                   name="down_1")(x0, temb)
        if embeddings is not None:
            x1 = x1 + embeddings[1]
        x2 = DownB(fea[2], norm=self.norm, quantize=qz, dtype=self.dtype,
                   name="down_2")(x1, temb)
        if embeddings is not None:
            x2 = x2 + embeddings[2]
        x3 = DownB(fea[3], norm=self.norm, quantize=qz, dtype=self.dtype,
                   name="down_3")(x2, temb)
        if embeddings is not None:
            x3 = x3 + embeddings[3]
        x4 = DownB(fea[4], norm=self.norm, quantize=qz, dtype=self.dtype,
                   name="down_4")(x3, temb)
        if embeddings is not None:
            x4 = x4 + embeddings[4]

        u4 = UpCatB(fea[3], fea[4] // 2, norm=self.norm, quantize=qz,
                    dtype=self.dtype, name="upcat_4")(x4, x3, temb)
        u3 = UpCatB(fea[2], fea[3] // 2, norm=self.norm, quantize=qz,
                    dtype=self.dtype, name="upcat_3")(u4, x2, temb)
        u2 = UpCatB(fea[1], fea[2] // 2, norm=self.norm, quantize=qz,
                    dtype=self.dtype, name="upcat_2")(u3, x1, temb)
        # last stage: halves=False (denoiser.py:280)
        u1 = UpCatB(fea[5], fea[1], norm=self.norm, quantize=qz,
                    dtype=self.dtype, name="upcat_1")(u2, x0, temb)

        logits = nn.Conv(self.out_channels, kernel_size=(1, 1, 1),
                         dtype=self.dtype, name="final_conv")(u1)
        return logits


# ---------------------------------------------------------------------------
# Channel-packed (pack-2) execution — see ops/packed.py for the layout math.
# Parameter trees are IDENTICAL to the unpacked modules (same names, same
# shapes: packed kernels are assembled from the original weights at apply
# time), so checkpoints are interchangeable between packed and unpacked runs.
# ---------------------------------------------------------------------------


# conv param holder shared with the quantized blocks (ops/blocks.py)
_ConvParams = ConvParams


# InstanceNorm affine parameter shell (shared with the packed Swin blocks)
from diff_unet_tpu.ops.blocks import NormParams as _NormParams  # noqa: E402


class PackedConvNormAct(nn.Module):
    """ConvNormAct executed in pack-f space (param tree identical).

    quantize=True runs the conv on the W8A8 int8 MXU path
    (pk.packed_conv_int8, ~2x the bf16 rate on v5e) — an inference-only
    option; params stay float and checkpoints are unchanged."""
    features: int
    in_features: int
    f: int = 2
    negative_slope: float = 0.1
    kernel_size: int = 3
    norm: str = "instance"
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_p, in_groups=None):
        k, b = _ConvParams(self.features, self.in_features,
                           kernel=(self.kernel_size,) * 3, name="conv")()
        if self.quantize:
            wq = quant_weights(
                self, "wq",
                lambda: pk.quantize_packed_kernel(k, self.f, in_groups))
            sa = quant_act_scale(self, "sa", x_p)
            x = pk.packed_conv_int8(x_p, None, b, self.f, in_groups,
                                    out_dtype=self.dtype or x_p.dtype,
                                    wq=wq, sa=sa)
        else:
            x = pk.packed_conv(x_p, k, b, self.f, in_groups,
                               dtype=self.dtype)
        scale, bias = _NormParams(self.features, name="norm")()
        if self.norm == "layer":
            x = pk.packed_layer_norm(x, scale, bias, self.f,
                                     dtype=self.dtype)
        else:
            assert self.norm == "instance", self.norm
            x = pk.packed_instance_norm(x, scale, bias, self.f,
                                        dtype=self.dtype)
        return nn.leaky_relu(x, negative_slope=self.negative_slope)


class PackedTwoConv(nn.Module):
    """TwoConv in pack-f space with the temb FiLM add tiled over blocks."""
    features: int
    in_features: int
    f: int = 2
    use_temb: bool = True
    negative_slope: float = 0.1
    norm: str = "instance"
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_p, temb=None, in_groups=None):
        x = PackedConvNormAct(self.features, self.in_features, self.f,
                              self.negative_slope, norm=self.norm,
                              quantize=self.quantize,
                              dtype=self.dtype,
                              name="conv_0")(x_p, in_groups)
        if self.use_temb and temb is not None:
            proj = nn.Dense(self.features, dtype=self.dtype,
                            name="temb_proj")(swish(temb))
            proj_p = jnp.tile(proj, (1, self.f))
            x = x + proj_p[:, None, None, None, :].astype(x.dtype)
        x = PackedConvNormAct(self.features, self.features, self.f,
                              self.negative_slope, norm=self.norm,
                              quantize=self.quantize,
                              dtype=self.dtype,
                              name="conv_1")(x)
        return x


class _ConvNormParams(nn.Module):
    """Parameter shell matching PackedConvNormAct's tree ({conv}, {norm})
    without executing it — the fused Pallas path consumes raw params."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k, b = _ConvParams(self.features, self.in_features, name="conv")()
        scale, bias = _NormParams(self.features, name="norm")()
        return k, b, scale, bias


class PallasFusedTwoConv(nn.Module):
    """TwoConv executed as two fused Pallas implicit-GEMM convs
    (ops/pallas_packed_conv.conv3x3_packed_aug_pipelined): 1.33x MACs vs the
    2x structural zeros of the XLA packed conv, with the InstanceNorm reduce
    as a conv epilogue and normalize+LeakyReLU+temb-FiLM as the next conv's
    input prologue — zero standalone elementwise HBM passes between the
    convs. Inference-only (no custom VJP); parameter tree identical to
    PackedTwoConv, so checkpoints are interchangeable.

    STATUS: parity-correct, NOT wired into DiffUNet — measured slower than
    the XLA path on v5e (36.1 vs 26.1 ms per fused L0 ConvNormAct pair;
    BASELINE.md "Round-3 Pallas 1.33x-conv exploration"). Mosaic sustains
    ~100 TF/s raw on this shape vs XLA's 157, which the MAC advantage
    cannot close. Kept as tested exploration for future toolchains.

    `parts` is the conv input as a LIST of packed tensors whose logical
    unpacked concat (in order) is the original input — the packed-space
    analogue of torch.cat before Conv3d (denoiser.py:298).
    """
    features: int
    in_features: int
    f: int = 2
    use_temb: bool = True
    negative_slope: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, parts, temb=None):
        from diff_unet_tpu.ops.pallas_packed_conv import (
            conv3x3_packed_aug_pipelined,
            prologue_pad_value,
        )
        if not isinstance(parts, (list, tuple)):
            parts = [parts]
        assert self.f == 2, "the fused Pallas path is pack-2 only"
        slope = self.negative_slope
        n, d, h, wp = parts[0].shape[:4]
        count = d * h * wp

        k0, b0, g0, be0 = _ConvNormParams(self.features, self.in_features,
                                          name="conv_0")()
        y0, st0 = conv3x3_packed_aug_pipelined(
            parts, k0, b0, dtype=self.dtype, with_stats=True)
        a0, c0 = pk.norm_affine_from_stats(st0, g0, be0, self.f, count)

        film = None
        if self.use_temb and temb is not None:
            proj = nn.Dense(self.features, dtype=self.dtype,
                            name="temb_proj")(swish(temb))
            film = jnp.tile(proj, (1, self.f)).astype(jnp.float32)

        k1, b1, g1, be1 = _ConvNormParams(self.features, self.features,
                                          name="conv_1")()
        pv = prologue_pad_value(a0, c0, const=film, negative_slope=slope)
        y1, st1 = conv3x3_packed_aug_pipelined(
            [y0], k1, b1, dtype=self.dtype,
            prologue_scale=a0, prologue_bias=c0, prologue_const=film,
            prologue_negative_slope=slope, pad_value=pv, with_stats=True)
        a1, c1 = pk.norm_affine_from_stats(st1, g1, be1, self.f, count)
        shape = (n, 1, 1, 1, a1.shape[-1])
        y = y1 * a1.reshape(shape).astype(y1.dtype) \
            + c1.reshape(shape).astype(y1.dtype)
        return nn.leaky_relu(y, negative_slope=slope)


class _PackedDownConvs(nn.Module):
    """`Down`-compatible scope holding only the convs (pooling happens in
    packed space in the parent forward)."""
    features: int
    in_features: int
    f: int = 2
    norm: str = "instance"
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_p, temb):
        return PackedTwoConv(self.features, self.in_features, self.f,
                             norm=self.norm, quantize=self.quantize,
                             dtype=self.dtype, name="convs")(x_p, temb)


class _PlainDownConvs(nn.Module):
    """`Down`-compatible scope for the unpacked deep levels."""
    features: int
    norm: str = "instance"
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, temb):
        return TwoConv(self.features, norm=self.norm,
                       quantize=self.quantize,
                       dtype=self.dtype, name="convs")(x, temb)


class _PackedUpCatEnter(nn.Module):
    """UpCat whose deconv enters pack-2 space (unpacked input level ->
    packed output level)."""
    features: int          # TwoConv output channels (original)
    up_features: int
    skip_features: int
    f: int = 2
    norm: str = "instance"
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_skip_p, temb):
        k, b = _ConvParams(self.up_features, x.shape[-1],
                           kernel=(2, 2, 2), name="upsample")()
        if self.quantize:
            from diff_unet_tpu.ops import int8 as q
            wq = quant_weights(
                self, "up_wq",
                lambda: q.quantize_kernel(pk.deconv2_enter_kernel(
                    k.astype(jnp.float32))))
            sa = quant_act_scale(self, "up_sa", x)
            x0_p = pk.packed_deconv2_enter_int8(
                x, None, b, self.f, out_dtype=self.dtype or x.dtype,
                wq=wq, sa=sa)
        else:
            x0_p = pk.packed_deconv2_enter(x, k, b, self.f, dtype=self.dtype)
        cat = jnp.concatenate([x_skip_p, x0_p], axis=-1)
        groups = pk.concat_groups([self.skip_features, self.up_features],
                                  self.f)
        return PackedTwoConv(
            self.features, self.skip_features + self.up_features, self.f,
            norm=self.norm, quantize=self.quantize,
            dtype=self.dtype, name="convs")(cat, temb, groups)


class _PackedUpCatPacked(nn.Module):
    """UpCat fully inside pack-2 space (packed input -> packed output)."""
    features: int
    up_features: int
    skip_features: int
    f: int = 2
    norm: str = "instance"
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_p, x_skip_p, temb):
        cin = x_p.shape[-1] // self.f
        k, b = _ConvParams(self.up_features, cin,
                           kernel=(2, 2, 2), name="upsample")()
        if self.quantize:
            from diff_unet_tpu.ops import int8 as q
            wq = quant_weights(
                self, "up_wq",
                lambda: q.quantize_kernel(pk.deconv2_packed_kernel(
                    k.astype(jnp.float32), self.f)))
            sa = quant_act_scale(self, "up_sa", x_p)
            x0_p = pk.packed_deconv2_packed_int8(
                x_p, None, b, self.f, out_dtype=self.dtype or x_p.dtype,
                wq=wq, sa=sa)
        else:
            x0_p = pk.packed_deconv2_packed(x_p, k, b, self.f,
                                            dtype=self.dtype)
        cat = jnp.concatenate([x_skip_p, x0_p], axis=-1)
        groups = pk.concat_groups([self.skip_features, self.up_features],
                                  self.f)
        return PackedTwoConv(
            self.features, self.skip_features + self.up_features, self.f,
            norm=self.norm, quantize=self.quantize,
            dtype=self.dtype, name="convs")(cat, temb, groups)


class BasicUNetDenoiserPacked(nn.Module):
    """BasicUNetDenoiser executed with the two C=64 pyramid levels (full and
    half resolution) in pack-2 layout: every level-0/1 activation is
    128-lane-dense instead of padding 64 -> 128, which roughly halves both
    HBM footprint and conv wall-clock on v5e (BASELINE.md roofline).

    Inputs/outputs are PACKED: x_p (N, D, H, W/2, 2*C), image_p
    (N, D, H, W/2, 2), embeddings with levels 0-1 packed (pack_embeddings).
    Parameter tree identical to BasicUNetDenoiser."""
    out_channels: int
    features: Sequence[int] = DEFAULT_FEATURES
    negative_slope: float = 0.1
    norm: str = "instance"
    pack: int = 2
    quantize: bool = False   # W8A8 int8 convs at the packed levels
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_p, t, embeddings=None, image_p=None):
        f = self.pack
        fea = tuple(self.features)
        temb = TimestepEmbedder(dtype=self.dtype, name="temb")(t)

        c_x = x_p.shape[-1] // f
        if image_p is not None:
            c_img = image_p.shape[-1] // f
            x_p = jnp.concatenate([image_p, x_p], axis=-1)
            stem_groups = pk.concat_groups([c_img, c_x], f)
            c_in = c_img + c_x
        else:
            stem_groups = pk.default_groups(c_x, f)
            c_in = c_x

        x0 = PackedTwoConv(fea[0], c_in, f, norm=self.norm,
                           quantize=self.quantize, dtype=self.dtype,
                           name="conv_0")(x_p, temb, stem_groups)
        if embeddings is not None:
            x0 = x0 + embeddings[0]
        x1 = _PackedDownConvs(fea[1], fea[0], f, norm=self.norm,
                              quantize=self.quantize, dtype=self.dtype,
                              name="down_1")(pk.packed_maxpool2(x0, f), temb)
        if embeddings is not None:
            x1 = x1 + embeddings[1]
        # L1 -> L2 boundary: the packed pool naturally unpacks.
        # quantize covers the FULL depth: the C=128-512 levels and deconvs
        # hold ~18% of the FLOPs (VERDICT r2 weak #4c)
        x2 = _PlainDownConvs(fea[2], norm=self.norm, quantize=self.quantize,
                             dtype=self.dtype, name="down_2")(
            pk.packed_maxpool2(x1, f, repack=False), temb)
        if embeddings is not None:
            x2 = x2 + embeddings[2]
        x3 = Down(fea[3], norm=self.norm, quantize=self.quantize,
                  dtype=self.dtype, name="down_3")(x2, temb)
        if embeddings is not None:
            x3 = x3 + embeddings[3]
        x4 = Down(fea[4], norm=self.norm, quantize=self.quantize,
                  dtype=self.dtype, name="down_4")(x3, temb)
        if embeddings is not None:
            x4 = x4 + embeddings[4]

        u4 = UpCat(fea[3], fea[4] // 2, norm=self.norm,
                   quantize=self.quantize,
                   dtype=self.dtype, name="upcat_4")(x4, x3, temb)
        u3 = UpCat(fea[2], fea[3] // 2, norm=self.norm,
                   quantize=self.quantize,
                   dtype=self.dtype, name="upcat_3")(u4, x2, temb)
        u2 = _PackedUpCatEnter(fea[1], fea[2] // 2, fea[1], f,
                               norm=self.norm, quantize=self.quantize,
                               dtype=self.dtype, name="upcat_2")(u3, x1, temb)
        u1 = _PackedUpCatPacked(fea[5], fea[1], fea[0], f,
                                norm=self.norm, quantize=self.quantize,
                                dtype=self.dtype, name="upcat_1")(u2, x0, temb)

        fk, fb = _ConvParams(self.out_channels, fea[5],
                             kernel=(1, 1, 1), name="final_conv")()
        return pk.packed_conv(u1, fk, fb, f, dtype=self.dtype)


class BasicUNetEncoderPacked(nn.Module):
    """BasicUNetEncoder executed with the two C=64 levels in pack-2 layout.

    `embed_packed` consumes a PACKED image and returns embeddings with
    levels 0-1 packed, deeper levels plain — exactly the layout
    `pack_embeddings()` produces, so the packed denoiser consumes them with
    no repacking. `__call__` keeps the unpacked API (packs in, unpacks out).
    Parameter tree identical to BasicUNetEncoder; checkpoints are
    interchangeable."""
    features: Sequence[int] = DEFAULT_FEATURES
    in_channels: int = 1
    negative_slope: float = 0.1
    pack: int = 2
    quantize: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        f = self.pack
        fea = tuple(self.features)
        self.conv_0 = PackedTwoConv(
            fea[0], self.in_channels, f, use_temb=False,
            negative_slope=self.negative_slope, quantize=self.quantize,
            dtype=self.dtype,
        )
        self.down_1 = _PackedDownConvs(fea[1], fea[0], f,
                                       quantize=self.quantize,
                                       dtype=self.dtype)
        self.down_2 = _PlainDownConvs(fea[2], quantize=self.quantize,
                                      dtype=self.dtype)
        self.down_3 = Down(fea[3], use_temb=False, quantize=self.quantize,
                           dtype=self.dtype)
        self.down_4 = Down(fea[4], use_temb=False, quantize=self.quantize,
                           dtype=self.dtype)

    def embed_packed(self, image_p: jnp.ndarray) -> list[jnp.ndarray]:
        f = self.pack
        x0 = self.conv_0(image_p, None,
                         pk.default_groups(self.in_channels, f))
        x1 = self.down_1(pk.packed_maxpool2(x0, f), None)
        x2 = self.down_2(pk.packed_maxpool2(x1, f, repack=False), None)
        x3 = self.down_3(x2, None)
        x4 = self.down_4(x3, None)
        return [x0, x1, x2, x3, x4]

    def __call__(self, image: jnp.ndarray) -> list[jnp.ndarray]:
        f = self.pack
        outs = self.embed_packed(pk.pack_w(image, f))
        return [pk.unpack_w(e, f) if i < 2 else e
                for i, e in enumerate(outs)]


def pack_embeddings(embeddings, f: int = 2):
    """Pack encoder feature maps for the packed denoiser: levels 0-1
    (full/half resolution) packed, deeper levels unchanged."""
    return [
        pk.pack_w(e, f) if i < 2 else e for i, e in enumerate(embeddings)
    ]
