"""Model factory + model-type enum.

Capability parity with the reference's ModelHub
(models/utils/model_hub.py:11-53) and ModelType/get_model_type
(models/utils/model_type.py:3-6, utils.py:30-37): string -> module
construction with per-model kwargs, and a type tag switching the train/infer
behaviour (diffusion vs direct segmentation).
"""
from __future__ import annotations

import enum
from typing import Any, Optional, Tuple

import jax.numpy as jnp

MODEL_NAMES = (
    "diff_unet",
    "smooth_diff_unet",
    "diff_swin_unetr",
    "attention_diff_unet",
    "swin_unetr",
    "attention_unet",
)


class ModelType(enum.Enum):
    DIFFUSION = "diffusion"
    SWIN_UNETR = "swin_unetr"
    ATTENTION_UNET = "attention_unet"


def get_model_type(model_name: str) -> ModelType:
    assert model_name in MODEL_NAMES, model_name
    if "diff" in model_name:
        return ModelType.DIFFUSION
    if model_name == "swin_unetr":
        return ModelType.SWIN_UNETR
    return ModelType.ATTENTION_UNET


def parse_image_size(image_size: int, spatial_size: int
                     ) -> Tuple[int, int, int]:
    return (spatial_size, image_size, image_size)


def create_model(
    model_name: str,
    *,
    in_channels: int = 1,
    out_channels: int,
    image_size: int = 96,
    spatial_size: int = 96,
    noise_ratio: float = 0.5,
    feature_size: int = 48,
    features: Optional[Tuple[int, ...]] = None,
    remat: bool = False,
    pack: int = 1,
    quantize: bool = False,
    dtype: Optional[jnp.dtype] = None,
    **extras: Any,
):
    """Build a model module by name (model_hub.py:15-50 parity)."""
    if extras:
        import warnings
        warnings.warn(
            f"create_model({model_name}) ignored unknown kwargs: "
            + ", ".join(sorted(extras)),
            stacklevel=2,
        )
    if quantize and model_name not in ("diff_unet", "diff_swin_unetr"):
        raise ValueError(
            f"quantize=True is only supported for diff_unet and "
            f"diff_swin_unetr (got {model_name}); W8A8 int8 inference "
            "covers their conv stacks (ops/int8.py)"
        )
    if pack > 1 and model_name not in (
        "diff_unet", "diff_swin_unetr", "smooth_diff_unet"
    ):
        raise ValueError(
            f"pack={pack} is only supported for diff_unet, diff_swin_unetr "
            f"and smooth_diff_unet (got {model_name}); see ops/packed.py"
        )
    if model_name == "diff_unet":
        from diff_unet_tpu.models.diff_unet import DiffUNet
        kw = {"features": tuple(features)} if features else {}
        return DiffUNet(out_channels=out_channels, in_channels=in_channels,
                        remat=remat, pack=pack, quantize=quantize,
                        dtype=dtype, **kw)
    if model_name == "smooth_diff_unet":
        from diff_unet_tpu.models.smooth_diff_unet import SmoothDiffUNet
        kw = {"features": tuple(features)} if features else {}
        # pack is AVAILABLE but not recommended for this family: measured
        # net-negative on the layer-norm denoiser (BASELINE.md round-5
        # smooth-family packing exploration)
        return SmoothDiffUNet(
            out_channels=out_channels, in_channels=in_channels,
            image_size=image_size, spatial_size=spatial_size, pack=pack,
            dtype=dtype, **kw,
        )
    if model_name == "attention_diff_unet":
        from diff_unet_tpu.models.attention_diff_unet import AttentionDiffUNet
        kw = {"features": tuple(features)} if features else {}
        return AttentionDiffUNet(
            out_channels=out_channels, in_channels=in_channels, dtype=dtype,
            **kw,
        )
    if model_name == "diff_swin_unetr":
        from diff_unet_tpu.models.swin_unetr import DiffSwinUNETR
        return DiffSwinUNETR(
            out_channels=out_channels, in_channels=in_channels,
            image_size=parse_image_size(image_size, spatial_size),
            feature_size=feature_size, noise_ratio=noise_ratio,
            pack=pack, quantize=quantize, dtype=dtype,
        )
    if model_name == "swin_unetr":
        from diff_unet_tpu.models.swin_unetr import SwinUNETR
        return SwinUNETR(
            out_channels=out_channels, in_channels=in_channels,
            image_size=parse_image_size(image_size, spatial_size),
            feature_size=feature_size, dtype=dtype,
        )
    raise ValueError(f"Invalid model type: {model_name}")
