"""Pallas fused window attention: parity vs jnp reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_unet_tpu.ops.pallas_attention import (
    fused_window_attention,
    reference_window_attention,
)


def _data(bw=4, h=2, n=128, dh=16, n_valid=100, seed=0, with_mask=False,
          n_windows=2):
    ks = jax.random.split(jax.random.key(seed), 5)
    q = jax.random.normal(ks[0], (bw, h, n, dh), jnp.float32)
    k = jax.random.normal(ks[1], (bw, h, n, dh), jnp.float32)
    v = jax.random.normal(ks[2], (bw, h, n, dh), jnp.float32)
    bias = jax.random.normal(ks[3], (h, n, n), jnp.float32) * 0.1
    v = v.at[:, :, n_valid:, :].set(0.0)
    mask = None
    if with_mask:
        mask = jnp.where(
            jax.random.uniform(ks[4], (n_windows, n, n)) > 0.8, -100.0, 0.0
        )
    return q, k, v, bias, n_valid, mask


def test_fused_attention_matches_reference_interpret():
    from jax.experimental.pallas import tpu as pltpu
    q, k, v, bias, n_valid, _ = _data()
    with pltpu.force_tpu_interpret_mode():
        got = fused_window_attention(q, k, v, bias, n_valid)
    want = reference_window_attention(q, k, v, bias, n_valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_with_shift_mask():
    from jax.experimental.pallas import tpu as pltpu
    q, k, v, bias, n_valid, mask = _data(with_mask=True, n_windows=2)
    with pltpu.force_tpu_interpret_mode():
        got = fused_window_attention(q, k, v, bias, n_valid, mask,
                                     n_windows=2)
    want = reference_window_attention(q, k, v, bias, n_valid, mask,
                                      n_windows=2)
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


def test_window_attention_pallas_path_matches_xla(monkeypatch):
    """Full WindowAttention module: pallas(interpret) == einsum path."""
    from jax.experimental.pallas import tpu as pltpu
    from diff_unet_tpu.ops import swin as swin_mod

    attn = swin_mod.WindowAttention(dim=32, num_heads=2,
                                    window_size=(4, 4, 4))
    x = jax.random.normal(jax.random.key(0), (6, 64, 32))
    mask = jnp.where(
        jax.random.uniform(jax.random.key(1), (3, 64, 64)) > 0.8, -100.0, 0.0
    )
    params = attn.init(jax.random.key(2), x, mask)
    want = attn.apply(params, x, mask)
    with swin_mod.use_pallas_attention():
        with pltpu.force_tpu_interpret_mode():
            got = attn.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
