"""Segmentation metrics.

Capability parity with the reference's `metric.py:3-50` (boolean-intersection
dice with zero-division guard) and the medpy-backed suite in
`light_training/evaluation/metric.py:25-409` (ConfusionMatrix, dice, jaccard,
precision/recall/specificity, Hausdorff/HD95/ASD/ASSD) — reimplemented on
numpy/scipy (medpy is not vendored) with a jit-friendly on-device dice for
the validation loop.

The validation-time semantics of train.py:295-303 are preserved by
`validation_dice`: a class predicted but absent from the label scores 1.0.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

try:
    from scipy import ndimage as _ndi
except Exception:  # pragma: no cover
    _ndi = None


# ---------- on-device (jnp) ----------

def dice_coeff(result: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """2|A∩B| / (|A|+|B|), 0 when both empty (reference metric.py:37-50)."""
    r = result.astype(bool)
    g = reference.astype(bool)
    intersection = jnp.sum(r & g)
    size = jnp.sum(r) + jnp.sum(g)
    return jnp.where(size > 0, 2.0 * intersection / jnp.maximum(size, 1), 0.0)


def dice_per_class(outputs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-class dice over channel-last one-hot masks (..., C) -> (C,)."""
    axes = tuple(range(outputs.ndim - 1))
    r = outputs.astype(bool)
    g = labels.astype(bool)
    inter = jnp.sum(r & g, axis=axes).astype(jnp.float32)
    size = (jnp.sum(r, axis=axes) + jnp.sum(g, axis=axes)).astype(jnp.float32)
    return jnp.where(size > 0, 2.0 * inter / jnp.maximum(size, 1.0), 0.0)


def validation_dice(outputs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-class dice with the train.py:298-301 convention: classes with
    predictions but an empty label score 1.0."""
    axes = tuple(range(outputs.ndim - 1))
    d = dice_per_class(outputs, labels)
    pred_any = jnp.sum(outputs.astype(bool), axis=axes) > 0
    label_any = jnp.sum(labels.astype(bool), axis=axes) > 0
    return jnp.where(pred_any & ~label_any, 1.0, d)


def iou(result: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    r = result.astype(bool)
    g = reference.astype(bool)
    inter = jnp.sum(r & g)
    union = jnp.sum(r | g)
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)


# ---------- host-side (numpy/scipy) suite ----------

class ConfusionMatrix:
    """tp/fp/tn/fn plus derived scores (light_training metric.py:25-110)."""

    def __init__(self, test: Optional[np.ndarray] = None,
                 reference: Optional[np.ndarray] = None):
        self.test = None if test is None else np.asarray(test).astype(bool)
        self.reference = (
            None if reference is None else np.asarray(reference).astype(bool)
        )
        self._computed = False

    def compute(self):
        assert self.test is not None and self.reference is not None
        t, r = self.test, self.reference
        self.tp = int(np.sum(t & r))
        self.fp = int(np.sum(t & ~r))
        self.tn = int(np.sum(~t & ~r))
        self.fn = int(np.sum(~t & r))
        self.n = t.size
        self.test_empty = not t.any()
        self.test_full = t.all()
        self.reference_empty = not r.any()
        self.reference_full = r.all()
        self._computed = True

    def _ensure(self):
        if not self._computed:
            self.compute()

    def dice(self) -> float:
        self._ensure()
        denom = 2 * self.tp + self.fp + self.fn
        return 2 * self.tp / denom if denom > 0 else 0.0

    def jaccard(self) -> float:
        self._ensure()
        denom = self.tp + self.fp + self.fn
        return self.tp / denom if denom > 0 else 0.0

    def precision(self) -> float:
        self._ensure()
        denom = self.tp + self.fp
        return self.tp / denom if denom > 0 else 0.0

    def recall(self) -> float:
        self._ensure()
        denom = self.tp + self.fn
        return self.tp / denom if denom > 0 else 0.0

    sensitivity = recall

    def specificity(self) -> float:
        self._ensure()
        denom = self.tn + self.fp
        return self.tn / denom if denom > 0 else 0.0

    def accuracy(self) -> float:
        self._ensure()
        return (self.tp + self.tn) / self.n if self.n > 0 else 0.0


def _surface_distances(
    result: np.ndarray, reference: np.ndarray,
    voxelspacing=None,
) -> np.ndarray:
    """Distances from each border voxel of `result` to the border of
    `reference` (medpy __surface_distances semantics)."""
    if _ndi is None:  # pragma: no cover
        raise RuntimeError("scipy required for surface distances")
    result = np.atleast_1d(np.asarray(result).astype(bool))
    reference = np.atleast_1d(np.asarray(reference).astype(bool))
    conn = _ndi.generate_binary_structure(result.ndim, 1)
    r_border = result ^ _ndi.binary_erosion(result, conn, border_value=0)
    ref_border = reference ^ _ndi.binary_erosion(reference, conn,
                                                 border_value=0)
    if reference.ndim == 3:
        from diff_unet_tpu import native
        dt = native.distance_transform_edt(~ref_border, voxelspacing)
        if dt is not None:
            return dt[r_border]
    dt = _ndi.distance_transform_edt(~ref_border, sampling=voxelspacing)
    return dt[r_border]


def hausdorff_distance(result, reference, voxelspacing=None) -> float:
    """Symmetric Hausdorff distance (max of directed surface distances)."""
    hd1 = _surface_distances(result, reference, voxelspacing)
    hd2 = _surface_distances(reference, result, voxelspacing)
    if hd1.size == 0 or hd2.size == 0:
        return float("nan")
    return float(max(hd1.max(), hd2.max()))


def hausdorff_distance_95(result, reference, voxelspacing=None) -> float:
    """95th-percentile symmetric Hausdorff distance (HD95)."""
    hd1 = _surface_distances(result, reference, voxelspacing)
    hd2 = _surface_distances(reference, result, voxelspacing)
    if hd1.size == 0 or hd2.size == 0:
        return float("nan")
    return float(np.percentile(np.hstack([hd1, hd2]), 95))


def average_surface_distance(result, reference, voxelspacing=None) -> float:
    sds = _surface_distances(result, reference, voxelspacing)
    return float(sds.mean()) if sds.size else float("nan")


def average_symmetric_surface_distance(result, reference,
                                       voxelspacing=None) -> float:
    s1 = _surface_distances(result, reference, voxelspacing)
    s2 = _surface_distances(reference, result, voxelspacing)
    if s1.size == 0 or s2.size == 0:
        return float("nan")
    return float(np.hstack([s1, s2]).mean())


ALL_METRICS = {
    "Dice": lambda t, r: ConfusionMatrix(t, r).dice(),
    "Jaccard": lambda t, r: ConfusionMatrix(t, r).jaccard(),
    "Precision": lambda t, r: ConfusionMatrix(t, r).precision(),
    "Recall": lambda t, r: ConfusionMatrix(t, r).recall(),
    "Specificity": lambda t, r: ConfusionMatrix(t, r).specificity(),
    "Accuracy": lambda t, r: ConfusionMatrix(t, r).accuracy(),
    "Hausdorff Distance": hausdorff_distance,
    "Hausdorff Distance 95": hausdorff_distance_95,
    "Avg. Surface Distance": average_surface_distance,
    "Avg. Symmetric Surface Distance": average_symmetric_surface_distance,
}
