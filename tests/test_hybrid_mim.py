"""HybridMIM pretraining model (models/hybrid_mim.py)."""
import numpy as np

import jax
import jax.numpy as jnp

from diff_unet_tpu.models.hybrid_mim import (
    HybridMIMBasicUNet,
    crop_box,
    mask_region_labels,
)

FEATS = (4, 4, 8, 16, 32, 4)


def test_mask_region_labels_analytic():
    # 4^3 patch grid, 2 regions/dim: mask exactly one region fully
    keep = np.ones((1, 4, 4, 4), np.float32)
    keep[0, :2, :2, :2] = 0.0
    counts, pos = mask_region_labels(jnp.asarray(keep), 2)
    assert counts.shape == (1, 8) and pos.shape == (1, 8, 8)
    np.testing.assert_array_equal(np.asarray(counts)[0],
                                  [8, 0, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(pos)[0, 0], np.ones(8))


def test_pretraining_forward_and_grads():
    m = HybridMIMBasicUNet(features=FEATS, mask_patch=8,
                           select_region=((1, 1, 1), (3, 3, 3)))
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 64, 1))
    params = m.init(jax.random.key(0), x, jax.random.key(2))
    out = m.apply(params, x, jax.random.key(3))
    assert out["logits"].shape == (2, 32, 32, 32, 1)
    assert out["images"].shape == out["logits"].shape
    assert out["pred_mask_region"].shape == (2, 64, 9)
    assert out["pred_mask_region_position"].shape == (2, 64, 8)
    assert int(jnp.max(out["mask_labels"])) <= 8

    def loss(p):
        o = m.apply(p, x, jax.random.key(3))
        recon = jnp.mean(jnp.square(o["logits"] - o["images"]))
        contrast = jnp.mean(jnp.square(
            o["contrast_pred_1"] - jax.lax.stop_gradient(o["contrast_pred_2"])
        ))
        return recon + contrast

    g = jax.grad(loss)(params)
    gn = sum(float(jnp.sum(jnp.abs(l)))
             for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_encoder_subtree_transfers_to_diffunet():
    """The trained conv_0/down_* subtree drops into BasicUNetEncoder — the
    capability behind encoder.pt seeding (train.py:166-176)."""
    from diff_unet_tpu.models.basic_unet import BasicUNetEncoder

    m = HybridMIMBasicUNet(features=FEATS, mask_patch=8)
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 32, 1))
    mim_params = m.init(jax.random.key(0), x, jax.random.key(2))["params"]

    enc = BasicUNetEncoder(features=FEATS)
    enc_params = enc.init(jax.random.key(3), x)["params"]
    for name in enc_params:
        assert name in mim_params, name
        a = jax.tree_util.tree_map(lambda v: v.shape, enc_params[name])
        b = jax.tree_util.tree_map(lambda v: v.shape, mim_params[name])
        assert a == b, (name, a, b)

    # transplanted subtree runs in the encoder
    grafted = {name: mim_params[name] for name in enc_params}
    outs = enc.apply({"params": grafted}, x)
    assert len(outs) == 5
