"""Norm-layer parity vs torch (instance norm one-pass formulation check)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_unet_tpu.ops.blocks import BatchStatsNorm, InstanceNorm


def test_instance_norm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 8, 5).astype(np.float32) * 3 + 1.5

    mod = InstanceNorm()
    params = mod.init(jax.random.key(0), jnp.array(x))
    # non-trivial affine
    params = {"params": {
        "scale": jnp.array(rng.rand(5).astype(np.float32) + 0.5),
        "bias": jnp.array(rng.randn(5).astype(np.float32)),
    }}
    got = mod.apply(params, jnp.array(x))

    tnorm = torch.nn.InstanceNorm3d(5, affine=True)
    with torch.no_grad():
        tnorm.weight.copy_(torch.tensor(np.asarray(params["params"]["scale"])))
        tnorm.bias.copy_(torch.tensor(np.asarray(params["params"]["bias"])))
    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    want = tnorm(tx).permute(0, 2, 3, 4, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_instance_norm_bf16_stable():
    x = (jax.random.normal(jax.random.key(0), (1, 16, 16, 16, 4)) * 2 + 10
         ).astype(jnp.bfloat16)
    mod = InstanceNorm(dtype=jnp.bfloat16)
    params = mod.init(jax.random.key(1), x)
    y = mod.apply(params, x)
    yf = np.asarray(y, np.float32)
    assert np.isfinite(yf).all()
    assert abs(yf.mean()) < 0.1
    assert abs(yf.std() - 1.0) < 0.15


def test_batch_stats_norm_matches_torch_train_mode():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    x = rng.randn(3, 6, 6, 6, 4).astype(np.float32)
    mod = BatchStatsNorm()
    params = mod.init(jax.random.key(0), jnp.array(x))
    got = mod.apply(params, jnp.array(x))
    tnorm = torch.nn.BatchNorm3d(4, affine=True)
    tnorm.train()
    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    want = tnorm(tx).permute(0, 2, 3, 4, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
