"""Metric tests: reference-semantics dice, confusion matrix, HD95 golden values."""
import jax.numpy as jnp
import numpy as np
import pytest

from diff_unet_tpu.metrics import (
    ConfusionMatrix,
    average_symmetric_surface_distance,
    dice_coeff,
    dice_per_class,
    hausdorff_distance,
    hausdorff_distance_95,
    validation_dice,
)


def test_dice_coeff_basic_and_zero_guard():
    a = jnp.array([1, 1, 0, 0], bool)
    b = jnp.array([1, 0, 1, 0], bool)
    assert float(dice_coeff(a, b)) == pytest.approx(0.5)
    assert float(dice_coeff(a, a)) == 1.0
    z = jnp.zeros(4, bool)
    assert float(dice_coeff(z, z)) == 0.0  # metric.py:47-48 guard


def test_validation_dice_empty_label_convention():
    # class 0: pred present, label empty -> 1.0 (train.py:298-301)
    outputs = jnp.zeros((4, 4, 4, 2))
    outputs = outputs.at[0, 0, 0, 0].set(1.0)
    labels = jnp.zeros((4, 4, 4, 2))
    labels = labels.at[1, 1, 1, 1].set(1.0)
    d = validation_dice(outputs, labels)
    assert float(d[0]) == 1.0
    assert float(d[1]) == 0.0


def test_dice_per_class_matches_scalar():
    rng = np.random.RandomState(0)
    o = (rng.rand(6, 6, 6, 3) > 0.5).astype(np.float32)
    l = (rng.rand(6, 6, 6, 3) > 0.5).astype(np.float32)
    per = dice_per_class(jnp.array(o), jnp.array(l))
    for c in range(3):
        want = float(dice_coeff(jnp.array(o[..., c]), jnp.array(l[..., c])))
        assert float(per[c]) == pytest.approx(want)


def test_confusion_matrix_counts():
    t = np.array([[1, 1], [0, 0]], bool)
    r = np.array([[1, 0], [1, 0]], bool)
    cm = ConfusionMatrix(t, r)
    cm.compute()
    assert (cm.tp, cm.fp, cm.fn, cm.tn) == (1, 1, 1, 1)
    assert cm.dice() == pytest.approx(0.5)
    assert cm.jaccard() == pytest.approx(1 / 3)
    assert cm.precision() == pytest.approx(0.5)
    assert cm.recall() == pytest.approx(0.5)
    assert cm.specificity() == pytest.approx(0.5)


def test_hausdorff_golden_cubes():
    a = np.zeros((20, 20, 20), bool)
    b = np.zeros((20, 20, 20), bool)
    a[2:5, 2:5, 2:5] = True
    b[2:5, 2:5, 12:15] = True  # shifted 10 voxels along last axis
    hd = hausdorff_distance(a, b)
    assert hd == pytest.approx(10.0)
    hd95 = hausdorff_distance_95(a, b)
    assert 9.0 <= hd95 <= 10.0
    assd = average_symmetric_surface_distance(a, b)
    assert 9.0 <= assd <= 10.5


def test_hausdorff_identical_is_zero():
    a = np.zeros((10, 10, 10), bool)
    a[3:6, 3:6, 3:6] = True
    assert hausdorff_distance(a, a) == 0.0
    assert hausdorff_distance_95(a, a) == 0.0


def test_hausdorff_empty_mask_nan():
    a = np.zeros((5, 5, 5), bool)
    b = np.zeros((5, 5, 5), bool)
    b[2, 2, 2] = True
    assert np.isnan(hausdorff_distance(a, b))


def _ref_metric_module():
    """Import the reference light_training/evaluation/metric.py with a
    no-op medpy stub (medpy only backs its distance metrics, which we do
    not golden-compare here)."""
    import importlib
    import sys
    import types
    if "medpy" not in sys.modules:
        medpy = types.ModuleType("medpy")
        medpy.metric = types.ModuleType("medpy.metric")
        sys.modules["medpy"] = medpy
        sys.modules["medpy.metric"] = medpy.metric
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        return importlib.import_module("light_training.evaluation.metric")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference metric module not importable: {e}")


def test_all_metrics_registry_parity_vs_reference():
    """Every confusion-matrix-based entry of ALL_METRICS matches the
    reference function (metric.py:389-409) on random masks + edge cases."""
    from diff_unet_tpu.metrics import ALL_METRICS

    ref = _ref_metric_module()
    assert set(ALL_METRICS) == set(ref.ALL_METRICS)

    rng = np.random.RandomState(3)
    cases = [
        ((rng.rand(6, 6, 6) > 0.5), (rng.rand(6, 6, 6) > 0.5)),
        ((rng.rand(6, 6, 6) > 0.2), (rng.rand(6, 6, 6) > 0.8)),
        (np.zeros((4, 4, 4), bool), np.zeros((4, 4, 4), bool)),  # both empty
        (np.zeros((4, 4, 4), bool), np.ones((4, 4, 4), bool)),   # empty/full
        (np.ones((4, 4, 4), bool), np.zeros((4, 4, 4), bool)),   # full/empty
        (np.ones((4, 4, 4), bool), np.ones((4, 4, 4), bool)),    # both full
    ]
    distance_names = {"Hausdorff Distance", "Hausdorff Distance 95",
                      "Avg. Surface Distance",
                      "Avg. Symmetric Surface Distance"}
    for name, fn in ALL_METRICS.items():
        for t, r in cases:
            if name in distance_names:
                # reference backs these with medpy (stubbed out); only the
                # empty/full guard is comparable
                if not (t.any() and r.any() and not t.all() and not r.all()):
                    assert np.isnan(fn(t, r)), name
                continue
            want = ref.ALL_METRICS[name](test=t.copy(), reference=r.copy())
            got = fn(t, r)
            if isinstance(want, float) and np.isnan(want):
                assert np.isnan(got), (name, t.sum(), r.sum())
            else:
                assert got == pytest.approx(want), (name, t.sum(), r.sum())


def test_fscore_matches_reference():
    from diff_unet_tpu.metrics import fscore
    ref = _ref_metric_module()
    rng = np.random.RandomState(7)
    t, r = rng.rand(6, 6, 6) > 0.4, rng.rand(6, 6, 6) > 0.6
    for beta in (0.5, 1.0, 2.0):
        assert fscore(t, r, beta=beta) == pytest.approx(
            ref.fscore(test=t.copy(), reference=r.copy(), beta=beta))


def test_voxelspacing_scales_distances():
    a = np.zeros((10, 10, 10), bool)
    b = np.zeros((10, 10, 10), bool)
    a[5, 5, 2] = True
    b[5, 5, 4] = True
    assert hausdorff_distance(a, b) == pytest.approx(2.0)
    assert hausdorff_distance(a, b, voxelspacing=(1.5, 1.5, 2.0)) == (
        pytest.approx(4.0)
    )
