"""Transposed (BW, C, Np) Swin block layout: parity vs the standard path.

The transposed layout (ops/swin.py:_forward_transposed) is the TPU
execution path for stages with C < 256 (lane-padding tax); these tests pin
that it is a pure layout change: same param tree, same outputs, same
gradients as the standard (B, D, H, W, C) path, including spatial padding
and shifted windows.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_unet_tpu.ops.swin import (
    SwinTransformer,
    SwinTransformerBlock,
    use_transposed_blocks,
    window_partition_t,
    window_reverse_t,
)


def _block(shift):
    return SwinTransformerBlock(
        dim=16, num_heads=2, window_size=(4, 4, 4),
        shift_size=(2, 2, 2) if shift else (0, 0, 0),
    )


def _x(shape=(2, 10, 10, 10, 16), seed=0):
    return jax.random.normal(jax.random.key(seed), shape, jnp.float32)


def test_partition_t_roundtrip():
    x = _x((2, 8, 8, 8, 16))
    wt = window_partition_t(x, (4, 4, 4), 128)
    assert wt.shape == (2 * 8, 16, 128)
    back = window_reverse_t(wt, (4, 4, 4), (2, 8, 8, 8))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("shift", [False, True])
def test_block_transposed_matches_standard(shift):
    """Forward parity with spatial padding (10 % 4 != 0) and shift."""
    block = _block(shift)
    x = _x()
    with use_transposed_blocks(False):
        params = block.init(jax.random.key(1), x)
        want = block.apply(params, x)
    with use_transposed_blocks(True):
        got = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_param_tree_identical():
    block = _block(True)
    x = _x()
    with use_transposed_blocks(False):
        p_std = block.init(jax.random.key(1), x)
    with use_transposed_blocks(True):
        p_t = block.init(jax.random.key(1), x)
    flat_std = jax.tree_util.tree_flatten_with_path(p_std)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(p_t)[0]
    assert [(k, v.shape) for k, v in flat_std] == \
        [(k, v.shape) for k, v in flat_t]
    # identical init streams -> identical values
    for (_, a), (_, b) in zip(flat_std, flat_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_block_transposed_gradients_match(shift=True):
    block = _block(shift)
    x = _x()
    with use_transposed_blocks(False):
        params = block.init(jax.random.key(1), x)

    def loss(p, enabled):
        with use_transposed_blocks(enabled):
            out = block.apply(p, x)
        return jnp.sum(out ** 2)

    g_std = jax.grad(loss)(params, False)
    g_t = jax.grad(loss)(params, True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        g_std, g_t)


def test_swin_transformer_transposed_matches_standard():
    """Full 4-stage stack (time-conditioned) parity at a tiny geometry."""
    swin = SwinTransformer(embed_dim=8, depths=(1, 1, 1, 1),
                           num_heads=(1, 2, 2, 4), window_size=(3, 3, 3),
                           time_conditioned=True)
    x = _x((1, 16, 16, 16, 2), seed=3)
    temb = jax.random.normal(jax.random.key(4), (1, 512), jnp.float32)
    with use_transposed_blocks(False):
        params = swin.init(jax.random.key(1), x, temb)
        want = swin.apply(params, x, temb)
    with use_transposed_blocks(True):
        got = swin.apply(params, x, temb)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


def test_shift_kernel_matches_reference_interpret():
    """MXU-permutation shift == reverse->roll->re-partition, fwd and bwd."""
    from jax.experimental.pallas import tpu as pltpu

    from diff_unet_tpu.ops.pallas_shift import (
        shift_windows_t,
        shift_windows_t_reference,
    )

    ws, ss, grid, b = (4, 4, 4), (2, 2, 2), (3, 2, 2), 2
    bw = b * int(np.prod(grid))
    wt = jax.random.normal(jax.random.key(0), (bw, 16, 128), jnp.float32)
    # reference zero-pads nothing (tokens 64 -> 128 pad must be zero for
    # parity: the kernel's one-hot columns emit 0 there)
    wt = wt.at[..., 64:].set(0.0)

    want = shift_windows_t_reference(wt, ws, ss, grid, b)
    with pltpu.force_tpu_interpret_mode():
        got = shift_windows_t(wt, ws, ss, grid, b, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    # backward: permutations are orthogonal — vjp == inverse shift
    g_ref = jax.grad(lambda w_: jnp.sum(
        shift_windows_t_reference(w_, ws, ss, grid, b) ** 2))(wt)
    with pltpu.force_tpu_interpret_mode():
        g_ker = jax.grad(lambda w_: jnp.sum(
            shift_windows_t(w_, ws, ss, grid, b, use_pallas=True) ** 2
        ))(wt)
    np.testing.assert_allclose(np.asarray(g_ker)[..., :64],
                               np.asarray(g_ref)[..., :64],
                               rtol=1e-6, atol=1e-6)


def test_basic_layer_window_resident_matches_standard():
    """Depth-2 stage (no-shift + shift blocks) through the window-resident
    path == per-block standard path, incl. spatial padding."""
    from diff_unet_tpu.ops.swin import BasicLayer

    layer = BasicLayer(dim=16, depth=2, num_heads=2, window_size=(4, 4, 4),
                       downsample=True)
    x = _x((2, 10, 10, 10, 16), seed=5)
    with use_transposed_blocks(False):
        params = layer.init(jax.random.key(1), x)
        want = layer.apply(params, x)
    with use_transposed_blocks(True):
        got = layer.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

    def loss(p, enabled):
        with use_transposed_blocks(enabled):
            return jnp.sum(layer.apply(p, x) ** 2)

    g_std = jax.grad(loss)(params, False)
    g_t = jax.grad(loss)(params, True)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4),
        g_std, g_t)


def test_fused_qkv_kernel_matches_reference_interpret():
    """The fused-qkv pallas entry (one (BW,3,H,Dh,N) operand, three index
    maps) matches the reference path, with shift region ids."""
    from jax.experimental.pallas import tpu as pltpu

    from diff_unet_tpu.ops.pallas_attention import (
        _dense_mask,
        fused_window_attention_qkv,
        reference_window_attention,
    )

    bw, h, dh, n, n_valid, nw = 4, 2, 16, 128, 100, 2
    ks = jax.random.split(jax.random.key(0), 3)
    qkvt = jax.random.normal(ks[0], (bw, 3, h, dh, n), jnp.float32)
    bias = jax.random.normal(ks[1], (h, n, n), jnp.float32) * 0.1
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 3, size=(nw, n_valid)).astype(np.int32)

    with pltpu.force_tpu_interpret_mode():
        got = fused_window_attention_qkv(qkvt, bias, n_valid, ids,
                                         n_windows=nw)
    want = reference_window_attention(
        qkvt[:, 0].transpose(0, 1, 3, 2), qkvt[:, 1].transpose(0, 1, 3, 2),
        qkvt[:, 2].transpose(0, 1, 3, 2), bias, n_valid, _dense_mask(ids),
        n_windows=nw).transpose(0, 1, 3, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
