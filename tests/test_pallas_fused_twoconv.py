"""PallasFusedTwoConv == PackedTwoConv (same params) in interpret mode.

The fused module executes the whole conv->IN->lrelu->(+temb)->conv->IN->lrelu
chain through the Pallas implicit-GEMM kernels with stats epilogue + fused
prologue; this pins numerical parity and checkpoint interchangeability.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diff_unet_tpu.models.basic_unet import (
    PackedTwoConv,
    PallasFusedTwoConv,
)
from diff_unet_tpu.ops import packed as pk


def _run_pair(use_temb):
    from jax.experimental.pallas import tpu as pltpu

    cin, cout, f = 6, 8, 2
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16, cin), jnp.float32)
    x_p = pk.pack_w(x, f)
    temb = (jax.random.normal(jax.random.key(1), (2, 512), jnp.float32) * 0.1
            if use_temb else None)

    ref_mod = PackedTwoConv(cout, cin, f, use_temb=use_temb)
    params = ref_mod.init(jax.random.key(2), x_p, temb)
    want = ref_mod.apply(params, x_p, temb)

    fused_mod = PallasFusedTwoConv(cout, cin, f, use_temb=use_temb)
    with pltpu.force_tpu_interpret_mode():
        got = fused_mod.apply(params, [x_p], temb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_fused_twoconv_matches_packed_with_temb():
    _run_pair(use_temb=True)


def test_fused_twoconv_matches_packed_no_temb():
    _run_pair(use_temb=False)


def test_fused_twoconv_concat_parts_matches_packed():
    """Two packed parts (the UpCat skip+up concat) drive one fused TwoConv."""
    from jax.experimental.pallas import tpu as pltpu

    ca, cb, cout, f = 4, 6, 8, 2
    xa = jax.random.normal(jax.random.key(3), (1, 8, 8, 16, ca), jnp.float32)
    xb = jax.random.normal(jax.random.key(4), (1, 8, 8, 16, cb), jnp.float32)
    pa, pb = pk.pack_w(xa, f), pk.pack_w(xb, f)
    cat = jnp.concatenate([pa, pb], axis=-1)
    groups = pk.concat_groups([ca, cb], f)

    ref_mod = PackedTwoConv(cout, ca + cb, f, use_temb=False)
    params = ref_mod.init(jax.random.key(5), cat, None, groups)
    want = ref_mod.apply(params, cat, None, groups)

    fused_mod = PallasFusedTwoConv(cout, ca + cb, f, use_temb=False)
    with pltpu.force_tpu_interpret_mode():
        got = fused_mod.apply(params, [pa, pb], None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_norm_affine_from_stats_matches_packed_instance_norm():
    f, c = 2, 8
    x_p = jax.random.normal(jax.random.key(6), (2, 4, 4, 8, f * c),
                            jnp.float32) * 2.0 + 0.5
    scale = jax.random.normal(jax.random.key(7), (c,)) * 0.5 + 1.0
    bias = jax.random.normal(jax.random.key(8), (c,)) * 0.2
    want = pk.packed_instance_norm(x_p, scale, bias, f)

    y2 = x_p.reshape(2, -1, f * c)
    stats = jnp.stack([jnp.sum(y2, axis=1),
                       jnp.sum(jnp.square(y2), axis=1)], axis=1)
    count = 4 * 4 * 8
    a, b = pk.norm_affine_from_stats(stats, scale, bias, f, count)
    got = x_p * a[:, None, None, None, :] + b[:, None, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
