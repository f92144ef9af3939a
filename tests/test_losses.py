"""Loss parity (vs torch functional where available) and behaviour tests."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_unet_tpu.losses import (
    CompositeLoss,
    bce_loss,
    boundary_loss,
    ce_loss,
    dice_loss,
    focal_loss,
    generalized_dice_loss,
    hausdorff_er_loss,
    mse_loss,
    multi_neighbor_loss,
    one_hot_to_dist,
)

B, D, C = 2, 8, 4


def _data(seed=0):
    rng = np.random.RandomState(seed)
    preds = rng.randn(B, D, D, D, C).astype(np.float32)
    labels = (rng.rand(B, D, D, D, C) > 0.7).astype(np.float32)
    return preds, labels


def test_bce_ce_mse_match_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    preds, labels = _data()
    tp = torch.tensor(preds)
    tl = torch.tensor(labels)

    np.testing.assert_allclose(
        float(bce_loss(jnp.array(preds), jnp.array(labels))),
        float(F.binary_cross_entropy_with_logits(tp, tl)), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(mse_loss(jnp.array(preds), jnp.array(labels))),
        float(F.mse_loss(torch.sigmoid(tp), tl)), rtol=1e-5,
    )
    # torch CE wants (N, C, ...) with probability targets
    np.testing.assert_allclose(
        float(ce_loss(jnp.array(preds), jnp.array(labels))),
        float(F.cross_entropy(
            tp.permute(0, 4, 1, 2, 3), tl.permute(0, 4, 1, 2, 3)
        )), rtol=1e-5,
    )


def test_dice_loss_perfect_and_worst():
    labels = np.zeros((1, 4, 4, 4, 2), np.float32)
    labels[..., 0] = 1.0
    big = 20.0
    perfect_logits = np.where(labels > 0, big, -big).astype(np.float32)
    val = float(dice_loss(jnp.array(perfect_logits), jnp.array(labels)))
    # class 1 is empty: its smooth-term contribution bounds the loss ~0.0065
    assert val < 1e-2
    worst = float(dice_loss(jnp.array(-perfect_logits), jnp.array(labels)))
    assert worst > 0.99


def test_generalized_dice_weights_empty_classes():
    preds, labels = _data(1)
    labels[..., 2] = 0.0  # empty class
    v = float(generalized_dice_loss(jnp.array(preds), jnp.array(labels)))
    assert np.isfinite(v)


def test_focal_less_than_bce():
    preds, labels = _data(2)
    f = float(focal_loss(jnp.array(preds), jnp.array(labels)))
    b = float(bce_loss(jnp.array(preds), jnp.array(labels)))
    assert 0 < f < b  # (1-pt)^gamma < 1 downweights


def test_boundary_loss_sign():
    # prediction mass far outside the object must cost more than on it
    labels = np.zeros((1, 8, 8, 8, 1), np.float32)
    labels[0, 3:5, 3:5, 3:5, 0] = 1.0
    dist = one_hot_to_dist(labels[0].transpose(3, 0, 1, 2))  # (C,D,H,W)
    dist = dist.transpose(1, 2, 3, 0)[None]
    inside = np.zeros_like(labels); inside[0, 3:5, 3:5, 3:5, 0] = 1.0
    outside = np.zeros_like(labels); outside[0, 0, 0, 0, 0] = 8.0
    li = float(boundary_loss(jnp.array(inside), jnp.array(dist)))
    lo = float(boundary_loss(jnp.array(outside), jnp.array(dist)))
    assert lo > li


def test_edt_golden_value():
    m = np.zeros((1, 5, 5, 5), np.float32)
    m[0, 2, 2, 2] = 1.0
    dist = one_hot_to_dist(m)
    # neighbour of the object voxel is at distance 1
    assert dist[0, 2, 2, 3] == pytest.approx(1.0)
    assert dist[0, 2, 2, 2] == pytest.approx(-0.0)  # inside: -(edt-1)*mask = 0
    assert dist[0, 0, 0, 0] == pytest.approx(np.sqrt(12))


def test_hausdorff_er_zero_for_perfect():
    _, labels = _data(3)
    v = float(hausdorff_er_loss(jnp.array(labels), jnp.array(labels)))
    assert v == pytest.approx(0.0, abs=1e-6)
    preds, _ = _data(4)
    v2 = float(hausdorff_er_loss(jnp.array(preds), jnp.array(labels)))
    assert v2 > 0


def test_multi_neighbor_zero_for_identical():
    rng = np.random.RandomState(5)
    labels = jax.nn.one_hot(
        jnp.array(rng.randint(0, C, (B, D, D, D))), C
    ).astype(jnp.float32)
    big = (labels * 2 - 1) * 20.0
    v = float(multi_neighbor_loss(big, labels))
    assert v == pytest.approx(0.0, abs=1e-5)


def test_composite_combinations():
    preds, labels = _data(6)
    p, l = jnp.array(preds), jnp.array(labels)
    single = CompositeLoss("dice", C)(p, l)
    np.testing.assert_allclose(float(single), float(dice_loss(p, l)))

    s = CompositeLoss("mse,bce,dice", C, combine="sum")(p, l)
    m = CompositeLoss("mse,bce,dice", C, combine="mean")(p, l)
    g = CompositeLoss("mse,bce,dice", C, combine="log")(p, l)
    total = float(mse_loss(p, l)) + float(bce_loss(p, l)) + float(dice_loss(p, l))
    np.testing.assert_allclose(float(s), total, rtol=1e-5)
    np.testing.assert_allclose(float(m), total / 3, rtol=1e-5)
    np.testing.assert_allclose(float(g), np.log1p(total), rtol=1e-5)

    with pytest.raises(NotImplementedError):
        CompositeLoss("nope", C)

    # composite is jittable
    jitted = jax.jit(CompositeLoss("mse,bce,dice", C))
    np.testing.assert_allclose(float(jitted(p, l)), float(s), rtol=1e-6)


def test_composite_gradients_finite():
    preds, labels = _data(7)
    loss = CompositeLoss("mse,bce,dice,focal,generalized_dice", C)
    grad = jax.grad(lambda p: loss(p, jnp.array(labels)))(jnp.array(preds))
    assert np.isfinite(np.asarray(grad)).all()


@pytest.mark.parametrize("names", ["mse,bce,dice", "focal,generalized_dice",
                                   "dice"])
def test_folded_loss_matches_unfolded(names):
    """The lane-dense W-fold epilogue (fold=4) computes the same scalar as
    the standard layout — elementwise means see the same multiset, the dice
    family's per-class sums are regrouped exactly."""
    from diff_unet_tpu.losses.losses import CompositeLoss

    key = jax.random.key(0)
    preds = jax.random.normal(key, (2, 6, 6, 8, 5), jnp.float32)
    lab = jax.nn.one_hot(
        jax.random.randint(jax.random.key(1), (2, 6, 6, 8), 0, 5), 5
    ).astype(jnp.float32)
    want = CompositeLoss(names, 5, fold=1)(preds, lab)
    got = CompositeLoss(names, 5, fold=4)(preds, lab)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-6)

    # gradients agree too (the fold must be transparent to training)
    g_want = jax.grad(lambda p: CompositeLoss(names, 5, fold=1)(p, lab))(
        preds)
    g_got = jax.grad(lambda p: CompositeLoss(names, 5, fold=4)(p, lab))(
        preds)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-6)


def test_folded_loss_falls_back_for_unfoldable():
    """ce (softmax over the true class axis) must disable the fold."""
    from diff_unet_tpu.losses.losses import CompositeLoss

    preds = jax.random.normal(jax.random.key(0), (1, 4, 4, 8, 5),
                              jnp.float32)
    lab = jax.nn.one_hot(
        jax.random.randint(jax.random.key(1), (1, 4, 4, 8), 0, 5), 5
    ).astype(jnp.float32)
    want = CompositeLoss("ce,dice", 5, fold=1)(preds, lab)
    # an explicitly requested but un-honorable fold warns (ADVICE r4)
    with pytest.warns(UserWarning, match="cannot be applied"):
        got = CompositeLoss("ce,dice", 5, fold=8)(preds, lab)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    # auto mode (fold=None) falls back silently by design
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        auto = CompositeLoss("ce,dice", 5)(preds, lab)
    np.testing.assert_allclose(float(auto), float(want), rtol=1e-6)
