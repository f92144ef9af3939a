"""Distance-based label smoothing.

Capability parity with the reference's LabelSmoothingCacheDataset
(dataset/cache_dataset.py:28-179): at cache time the integer label volume is
one-hot encoded, per-class centroids are computed, voxel->centroid distance
fields derived, and the label becomes
    labels = |onehot - decay(distance) * alpha|
with decay in {rational 1/(d^order+eps), exponential x*exp(-lambda x),
damped sine exp(-lambda x) sin(omega x)} (cache_dataset.py:151-159); and
with the learnable `DistanceLabelSmothing` module (models/label_smoothing.py:
4-34: labels = |labels - alpha/(beta*dist + eps)| with per-class learnable
alpha/beta) provided as `LearnableLabelSmoothing`.

Host-side parts are vectorised numpy (no per-class python loops over voxel
tensors beyond the class axis); the learnable module is a Flax module usable
inside the jitted train step.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from diff_unet_tpu.data import transforms as T
from diff_unet_tpu.data.dataset import CacheDataset
from diff_unet_tpu.data.nifti import read_nifti, to_ras


def class_centroids(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Per-class centroids of an integer (D,H,W) label volume; zeros for
    absent classes (cache_dataset.py:87-96)."""
    coords = np.indices(labels.shape).astype(np.float32)  # (3, D, H, W)
    centroids = np.zeros((num_classes, 3), np.float32)
    for c in range(num_classes):
        mask = labels == c
        n = mask.sum()
        if n > 0:
            centroids[c] = [coords[i][mask].mean() for i in range(3)]
    return centroids


def distance_fields(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """(C, D, H, W) euclidean distance of every voxel to each class centroid
    (cache_dataset.py:98-103)."""
    coords = np.stack(
        np.meshgrid(*[np.arange(s) for s in labels.shape], indexing="ij"),
        axis=-1,
    ).astype(np.float32)                                   # (D,H,W,3)
    cents = class_centroids(labels, num_classes)           # (C,3)
    diff = coords[None] - cents[:, None, None, None, :]
    return np.linalg.norm(diff, axis=-1)


def rational(x: np.ndarray, order: float = 1.0, eps: float = 1e-6):
    return 1.0 / (np.power(x, order) + eps)


def exponential_decay(x: np.ndarray, lam: float = 1.0):
    return x * np.exp(-lam * x)


def damped_sine(x: np.ndarray, lam: float = 0.05, omega: float = 0.1,
                phi: float = 0.0):
    return np.exp(-lam * x) * np.sin(omega * x + phi)


def smooth_labels(
    labels: np.ndarray,
    num_classes: int,
    alpha: float = 0.3,
    order: float = 1.0,
    lambda_decay: float = 1.0,
    kind: str = "rational",
    eps: float = 1e-6,
) -> np.ndarray:
    """Integer (D,H,W) -> smoothed float (D,H,W,C) labels
    (cache_dataset.py:105-149, channel-last)."""
    onehot = np.eye(num_classes, dtype=np.float32)[labels.astype(np.int64)]
    dist = distance_fields(labels, num_classes)            # (C,D,H,W)
    if kind == "rational":
        decay = rational(dist, order, eps)
    elif kind == "exponential":
        decay = exponential_decay(dist, lambda_decay)
    elif kind == "damped_sine":
        decay = damped_sine(dist)
    else:
        raise NotImplementedError(kind)
    return np.abs(onehot - np.moveaxis(decay, 0, -1) * alpha)


class LabelSmoothingCacheDataset(CacheDataset):
    """CacheDataset whose labels are distance-smoothed float volumes.

    Mirrors the reference ordering (cache_dataset.py:161-175): smoothing is
    applied to the raw label grid at load time, *before* the deterministic
    window/crop/respacing transforms; the resampled label keeps its C
    channels (nearest interpolation).
    """

    def __init__(
        self,
        data: Sequence[Dict],
        *,
        num_classes: int = 14,
        smoothing_alpha: float = 0.3,
        smoothing_order: float = 1.0,
        lambda_decay: float = 1.0,
        smoothing_type: str = "rational",
        target_spacing: Sequence[float] = (1.5, 1.5, 2.0),
        a_min: float = -175.0,
        a_max: float = 250.0,
        num_workers: int = 8,
    ) -> None:
        def loader(item):
            img = to_ras(read_nifti(item["image"]))
            lab = to_ras(read_nifti(item["label"]))
            smoothed = smooth_labels(
                np.asarray(lab.data), num_classes, smoothing_alpha,
                smoothing_order, lambda_decay, smoothing_type,
            )
            image = T.scale_intensity_range(
                np.asarray(img.data, np.float32), a_min, a_max
            )
            image, smoothed = T.crop_foreground(image, smoothed)
            image = T.spacing_resample(image, img.spacing, target_spacing,
                                       order=1)
            smoothed = T.spacing_resample(smoothed, list(img.spacing) + [1.0],
                                          list(target_spacing) + [1.0],
                                          order=0)
            return {
                "image": np.ascontiguousarray(image, np.float32),
                "label": np.ascontiguousarray(smoothed, np.float32),
                "filename": item.get("image"),
                "spacing": np.asarray(target_spacing, np.float32),
            }

        super().__init__(list(data), mode="train", num_workers=num_workers,
                         item_loader=loader)


class LearnableLabelSmoothing(nn.Module):
    """Per-class learnable (alpha, beta) smoothing applied to precomputed
    distance fields: labels = |labels - alpha/(beta*dist + eps)|
    (reference DistanceLabelSmothing, models/label_smoothing.py:4-34;
    instantiated at train.py:128-138, per-batch call disabled at
    train.py:271 — provided here as a usable jit-compatible module)."""
    num_classes: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, labels: jnp.ndarray,
                 distances: jnp.ndarray) -> jnp.ndarray:
        """labels (N,D,H,W,C) one-hot float; distances (N,D,H,W,C)."""
        alpha = self.param("alpha", nn.initializers.constant(0.3),
                           (self.num_classes,))
        beta = self.param("beta", nn.initializers.ones, (self.num_classes,))
        smooth = alpha / (beta * distances + self.eps)
        return jnp.abs(labels - smooth)
