"""Host-side Euclidean distance transforms for boundary-type losses.

Capability parity with the reference's `one_hot2dist`
(losses/utils.py:288-299) used by `dist_map_transform` (losses/utils.py:447)
for BoundaryLoss. Note the reference's torch `eucl_distance`
(losses/utils.py:274-286) is a defective EDT surrogate — it computes the
distance of each voxel *to the origin*, not to the mask — so this module
implements the *intended* semantics (the LIVIAETS boundary-loss formulation):
signed distance = edt(~mask)*~mask - (edt(mask)-1)*mask, with a real EDT.

These run on host (numpy/scipy) as part of the data pipeline — distance maps
are precomputed per cached label volume, not recomputed per training step on
device (EDT is inherently sequential and belongs off the TPU hot path).
"""
from __future__ import annotations

import numpy as np

try:  # scipy is available in the target environment; degrade gracefully.
    from scipy.ndimage import distance_transform_edt as _edt
except Exception:  # pragma: no cover
    _edt = None


def distance_transform_edt(mask: np.ndarray,
                           sampling=None) -> np.ndarray:
    """Exact Euclidean distance to the nearest zero voxel.

    Uses the native C++ kernel (diff_unet_tpu/native/edt.cpp) when available
    (~4x faster than scipy for 3D volumes), scipy otherwise.
    """
    mask = np.asarray(mask)
    if mask.ndim == 3:
        from diff_unet_tpu import native
        out = native.distance_transform_edt(mask, sampling)
        if out is not None:
            return out
    if _edt is None:  # pragma: no cover
        raise RuntimeError("scipy is required for EDT computation")
    return _edt(mask, sampling=sampling)


def signed_distance_maps(onehot: np.ndarray, sampling=None) -> np.ndarray:
    """Per-class signed distance maps from a one-hot (C, ...) label volume.

    Positive outside the object, negative inside (boundary-loss convention;
    losses/utils.py:288-299).
    """
    onehot = np.asarray(onehot)
    res = np.zeros(onehot.shape, dtype=np.float32)
    for k in range(onehot.shape[0]):
        posmask = onehot[k].astype(bool)
        if not posmask.any():
            continue
        negmask = ~posmask
        res[k] = (
            distance_transform_edt(negmask, sampling) * negmask
            - (distance_transform_edt(posmask, sampling) - 1) * posmask
        )
    return res


def one_hot_to_dist(onehot: np.ndarray, sampling=None) -> np.ndarray:
    """Alias matching the reference's `one_hot2dist` name."""
    return signed_distance_maps(onehot, sampling)
