"""W8A8 int8 inference primitives (v5e MXU runs int8 at ~2x the bf16 rate —
measured 299 vs 157 TOPS at the packed L0 conv shape, BASELINE.md r2).

Quantization scheme (symmetric, zero-point-free):
- weights: per-output-channel scales, quantized OFFLINE once (either at
  checkpoint-load time via the flax "quant" variable collection, or hoisted
  by XLA when computed in-graph) — VERDICT r2 weak #4b;
- activations: per-tensor scale, either dynamic (abs-max per call, no
  calibration state) or static (a calibrated constant, which lets XLA fuse
  the scale+round+cast into the preceding norm/act elementwise pass instead
  of paying an extra abs-max reduction over the full tensor);
- int32 accumulation, one fused f32 rescale + bias epilogue.

bf16 inputs quantize exactly: bf16 represents integers <= 256, so round/clip
to +-127 needs no f32 activation copy.

No reference analogue (the reference's only reduced precision is AMP fp16,
train.py:226-238); this is TPU-first serving work.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax


def quantize_kernel(k: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Float conv kernel (..., Cout) -> (int8 kernel, per-Cout f32 scale)."""
    k = k.astype(jnp.float32)
    sw = jnp.maximum(
        jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1))), 1e-12
    ) / 127.0
    kq = jnp.clip(jnp.round(k / sw), -127, 127).astype(jnp.int8)
    return kq, sw


def act_scale(x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic symmetric per-tensor activation scale (abs-max / 127)."""
    return jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0


def quantize_act(x: jnp.ndarray, sa: jnp.ndarray) -> jnp.ndarray:
    """Quantize activations with scale `sa` in the input dtype (exact for
    bf16: the post-division values round to integers <= 127)."""
    return jnp.clip(jnp.round(x / sa.astype(x.dtype)),
                    -127, 127).astype(jnp.int8)


def conv_int8(
    xq: jnp.ndarray,            # int8 NDHWC
    kq: jnp.ndarray,            # int8 DHWIO
    *,
    strides=(1, 1, 1),
    padding="SAME_KERNEL",      # SAME derived from the kernel dims
) -> jnp.ndarray:
    """Raw int8 x int8 -> int32 conv on the MXU."""
    if padding == "SAME_KERNEL":
        padding = tuple((d // 2, d // 2) for d in kq.shape[:3])
    return lax.conv_general_dilated(
        xq, kq, strides, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32,
    )


def deconv2_int8(xq: jnp.ndarray, kq: jnp.ndarray, strides) -> jnp.ndarray:
    """int8 k2-stride-2 transposed conv -> int32 (SAME, as lax.conv_transpose
    with flax ConvTranspose's no-mirror kernel convention)."""
    return lax.conv_transpose(
        xq, kq, strides, "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        transpose_kernel=False,
        preferred_element_type=jnp.int32,
    )


def rescale(
    acc: jnp.ndarray,           # int32
    sa: jnp.ndarray,            # scalar f32
    sw: jnp.ndarray,            # (Cout,) f32
    b: Optional[jnp.ndarray],
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused dequantize epilogue: acc * (sa*sw) + bias."""
    y = acc.astype(jnp.float32) * (sa * sw)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)
