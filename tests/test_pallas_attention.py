"""Pallas fused window attention: parity vs jnp reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_unet_tpu.ops.pallas_attention import (
    _dense_mask,
    fused_window_attention,
    reference_window_attention,
)


def _data(bw=4, h=2, n=128, dh=16, n_valid=100, seed=0, with_ids=False,
          n_windows=2):
    ks = jax.random.split(jax.random.key(seed), 5)
    q = jax.random.normal(ks[0], (bw, h, n, dh), jnp.float32)
    k = jax.random.normal(ks[1], (bw, h, n, dh), jnp.float32)
    v = jax.random.normal(ks[2], (bw, h, n, dh), jnp.float32)
    bias = jax.random.normal(ks[3], (h, n, n), jnp.float32) * 0.1
    v = v.at[:, :, n_valid:, :].set(0.0)
    ids = None
    if with_ids:
        rng = np.random.default_rng(seed)
        ids = rng.integers(0, 3, size=(n_windows, n_valid)).astype(np.int32)
    return q, k, v, bias, n_valid, ids


def test_fused_attention_matches_reference_interpret():
    from jax.experimental.pallas import tpu as pltpu
    q, k, v, bias, n_valid, _ = _data()
    with pltpu.force_tpu_interpret_mode():
        got = fused_window_attention(q, k, v, bias, n_valid)
    want = reference_window_attention(q, k, v, bias, n_valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_with_shift_region_ids():
    from jax.experimental.pallas import tpu as pltpu
    q, k, v, bias, n_valid, ids = _data(with_ids=True, n_windows=2)
    with pltpu.force_tpu_interpret_mode():
        got = fused_window_attention(q, k, v, bias, n_valid, ids,
                                     n_windows=2)
    want = reference_window_attention(q, k, v, bias, n_valid,
                                      _dense_mask(ids), n_windows=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_masks_padded_keys():
    from jax.experimental.pallas import tpu as pltpu
    q, k, v, bias, _, _ = _data(n_valid=128)
    n_valid = 96
    v = v.at[:, :, n_valid:, :].set(0.0)
    with pltpu.force_tpu_interpret_mode():
        got = fused_window_attention(q, k, v, bias, n_valid)
    want_small = reference_window_attention(
        q[:, :, :n_valid], k[:, :, :n_valid], v[:, :, :n_valid],
        bias[:, :n_valid, :n_valid], n_valid,
    )
    np.testing.assert_allclose(
        np.asarray(got[:, :, :n_valid]), np.asarray(want_small),
        rtol=2e-5, atol=2e-5,
    )


def test_fused_attention_gradients_match_einsum_path():
    """custom_vjp backward (recompute via jnp path) == einsum-path grads."""
    from jax.experimental.pallas import tpu as pltpu
    q, k, v, bias, n_valid, ids = _data(bw=2, n=128, n_valid=100,
                                        with_ids=True, n_windows=2)

    def loss_fused(q, k, v, bias):
        out = fused_window_attention(q, k, v, bias, n_valid, ids,
                                     n_windows=2)
        return jnp.sum(out[:, :, :n_valid].astype(jnp.float32) ** 2)

    def loss_ref(q, k, v, bias):
        out = reference_window_attention(q, k, v, bias, n_valid,
                                         _dense_mask(ids), n_windows=2)
        return jnp.sum(out[:, :, :n_valid].astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_window_attention_pallas_path_matches_xla():
    """Full WindowAttention module: pallas(interpret) == einsum path."""
    from jax.experimental.pallas import tpu as pltpu
    from diff_unet_tpu.ops import swin as swin_mod

    attn = swin_mod.WindowAttention(dim=32, num_heads=2,
                                    window_size=(4, 4, 4))
    x = jax.random.normal(jax.random.key(0), (6, 64, 32))
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 4, size=(3, 64)).astype(np.int32)
    params = attn.init(jax.random.key(2), x, region_ids=ids)
    want = attn.apply(params, x, region_ids=ids)
    with swin_mod.use_pallas_attention():
        with pltpu.force_tpu_interpret_mode():
            got = attn.apply(params, x, region_ids=ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
