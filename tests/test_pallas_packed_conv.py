"""Pallas packed-aug conv (1.33x-MAC implicit GEMM): interpret-mode parity.

Covers the pipelined kernel's fusion surface: bias, LeakyReLU epilogue,
per-channel affine(+LeakyReLU+const) prologue with pad-value compensation,
and the per-packed-channel sum/sumsq stats epilogue.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_unet_tpu.ops import packed as pk
from diff_unet_tpu.ops.pallas_packed_conv import (
    conv3x3_packed_aug,
    conv3x3_packed_aug_pipelined,
)


def _ref_conv(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        y = y + b
    return y


def _mk(n=1, d=8, h=8, w=24, cin=8, cout=8, seed=0):
    kx, kw, kb = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(kx, (n, d, h, w, cin), jnp.float32)
    wgt = jax.random.normal(kw, (3, 3, 3, cin, cout)) * 0.1
    b = jax.random.normal(kb, (cout,)) * 0.1
    return x, wgt, b


@pytest.mark.parametrize("variant", ["orig", "taps", "im2col", "im2col4"])
def test_aug_conv_matches_lax(variant):
    from jax.experimental.pallas import tpu as pltpu
    x, w, b = _mk()
    with pltpu.force_tpu_interpret_mode():
        if variant == "orig":
            got = conv3x3_packed_aug(pk.pack_w(x, 2), w, b,
                                     block_d=4, block_h=4)
        else:
            got = conv3x3_packed_aug_pipelined(
                pk.pack_w(x, 2), w, b, block_d=4, block_h=4,
                inner=("taps" if variant == "taps" else "im2col"),
                rows_per_dot=(4 if variant == "im2col4" else 2))
    want = pk.pack_w(_ref_conv(x, w, b), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_aug_conv_pipelined_multibatch_lrelu():
    from jax.experimental.pallas import tpu as pltpu
    x, w, b = _mk(n=2, seed=1)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_packed_aug_pipelined(
            pk.pack_w(x, 2), w, b, block_d=4, block_h=4,
            negative_slope=0.1)
    want = pk.pack_w(jax.nn.leaky_relu(_ref_conv(x, w, b), 0.1), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_aug_conv_pipelined_concat_parts():
    from jax.experimental.pallas import tpu as pltpu
    x, w, b = _mk(cin=12, seed=2)
    a_part, b_part = x[..., :5], x[..., 5:]
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_packed_aug_pipelined(
            [pk.pack_w(a_part, 2), pk.pack_w(b_part, 2)], w, b,
            block_d=4, block_h=4)
    want = pk.pack_w(_ref_conv(x, w, b), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_aug_conv_pipelined_stats():
    from jax.experimental.pallas import tpu as pltpu
    x, w, b = _mk(n=2, seed=3)
    with pltpu.force_tpu_interpret_mode():
        got, stats = conv3x3_packed_aug_pipelined(
            pk.pack_w(x, 2), w, b, block_d=4, block_h=4, with_stats=True)
    want = pk.pack_w(_ref_conv(x, w, b), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    y = np.asarray(want, np.float64)
    s = np.asarray(stats)
    np.testing.assert_allclose(s[:, 0], y.sum(axis=(1, 2, 3)),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s[:, 1], (y ** 2).sum(axis=(1, 2, 3)),
                               rtol=2e-4, atol=2e-4)


def test_aug_conv_pipelined_prologue():
    """Fused input affine with pad-value compensation == affine applied
    before a zero-padded SAME conv."""
    from jax.experimental.pallas import tpu as pltpu
    from diff_unet_tpu.ops.pallas_packed_conv import prologue_pad_value

    x, w, b = _mk(seed=4)
    cin = x.shape[-1]
    ks, kb2 = jax.random.split(jax.random.key(5))
    scale = jax.random.normal(ks, (cin,)) * 0.5 + 1.0
    bias = jax.random.normal(kb2, (cin,)) * 0.3
    ps = jnp.tile(scale, 2)     # a-layout: [u_odd | u_even] channel halves
    pb = jnp.tile(bias, 2)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_packed_aug_pipelined(
            pk.pack_w(x, 2), w, b, block_d=4, block_h=4,
            prologue_scale=ps, prologue_bias=pb,
            pad_value=prologue_pad_value(ps, pb))
    want = pk.pack_w(_ref_conv(x * scale + bias, w, b), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_aug_conv_pipelined_prologue_lrelu_const():
    """prologue = lrelu(a*x + b) + c — the conv_1 input chain of
    PackedTwoConv (norm apply + activation + temb FiLM) fused into the
    conv's slab read."""
    from jax.experimental.pallas import tpu as pltpu
    from diff_unet_tpu.ops.pallas_packed_conv import prologue_pad_value

    x, w, b = _mk(seed=6)
    cin = x.shape[-1]
    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    scale = jax.random.normal(k1, (cin,)) * 0.5 + 1.0
    bias = jax.random.normal(k2, (cin,)) * 0.3
    const = jax.random.normal(k3, (cin,)) * 0.2
    slope = 0.1
    ps, pb, pc = (jnp.tile(v, 2) for v in (scale, bias, const))
    pv = prologue_pad_value(ps, pb, const=pc, negative_slope=slope)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_packed_aug_pipelined(
            pk.pack_w(x, 2), w, b, block_d=4, block_h=4,
            prologue_scale=ps, prologue_bias=pb, prologue_const=pc,
            prologue_negative_slope=slope, pad_value=pv)
    xin = jax.nn.leaky_relu(x * scale + bias, slope) + const
    want = pk.pack_w(_ref_conv(xin, w, b), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
