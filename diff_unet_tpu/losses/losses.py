"""Segmentation losses in pure JAX (channel-last NDHWC logits/labels).

Capability parity with the reference's `losses/loss.py`:
- the composite `Loss` registry and sum/mean/log combination (loss.py:25-86),
- BoundaryLoss (loss.py:107-131), HausdorffERLoss (loss.py:173-231),
- MultiNeighborLoss (loss.py:234-301),
and the MONAI losses it registers (dice, focal, dice_ce, dice_focal,
generalized_dice, generalized_dice_focal, generalized_wasserstein_dice) —
reimplemented from their published formulations, vectorised for TPU (no
per-class/per-batch Python loops on traced values).

Conventions mirrored from the reference call-site (loss.py:64-75):
- `mse` is applied to sigmoid(preds) vs labels,
- `boundary` consumes precomputed signed distance maps (see losses/edt.py),
- `generalized_wasserstein_dice` consumes integer class labels
  (argmax of one-hot),
- everything else consumes raw logits and one-hot float labels.
"""
from __future__ import annotations

import warnings
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

_SMOOTH_NR = 1e-5
_SMOOTH_DR = 1e-5


def _spatial_axes(x: jnp.ndarray) -> tuple:
    """Reduce axes for per-(batch, class) stats of an NDHWC tensor."""
    return tuple(range(1, x.ndim - 1))


def mse_loss(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """MSE on sigmoid probabilities (reference loss.py:68-69)."""
    return jnp.mean(jnp.square(jax.nn.sigmoid(preds) - labels))


def bce_loss(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy with logits (torch BCEWithLogitsLoss parity)."""
    # log(1 + exp(-|x|)) + max(x, 0) - x*y  (numerically stable form)
    return jnp.mean(
        jnp.maximum(preds, 0) - preds * labels
        + jnp.log1p(jnp.exp(-jnp.abs(preds)))
    )


def ce_loss(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Softmax cross-entropy against one-hot/probability labels
    (torch CrossEntropyLoss with probability targets)."""
    logp = jax.nn.log_softmax(preds, axis=-1)
    return -jnp.mean(jnp.sum(labels * logp, axis=-1))


def _dice_from_sums(inter, denom, *, smooth_nr, smooth_dr):
    """Per-(batch, class) sums -> mean soft-Dice score. The ONE place the
    dice smooth/ratio conventions live: both the standard and the TPU
    lane-folded epilogues consume it, so they cannot diverge."""
    f = 1.0 - (2.0 * inter + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(f)


def _generalized_dice_from_sums(inter, psum, gsum, *, smooth_nr, smooth_dr):
    """Per-(batch, class) sums -> mean Generalized Dice score (Sudre et
    al. weights 1/|G_c|^2, empty classes replaced by the max finite
    weight). Shared by the standard and lane-folded epilogues."""
    w = 1.0 / jnp.square(jnp.maximum(gsum, 1e-6))
    w = jnp.where(gsum > 0, w, 0.0)
    w_max = jnp.max(w, axis=-1, keepdims=True)
    w = jnp.where(gsum > 0, w, w_max)
    numer = 2.0 * jnp.sum(w * inter, axis=-1) + smooth_nr
    denom = jnp.sum(w * (psum + gsum), axis=-1) + smooth_dr
    return jnp.mean(1.0 - numer / denom)


def dice_loss(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    sigmoid: bool = True,
    squared_pred: bool = False,
    smooth_nr: float = _SMOOTH_NR,
    smooth_dr: float = _SMOOTH_DR,
) -> jnp.ndarray:
    """Soft Dice loss, MONAI DiceLoss(sigmoid=True) parity."""
    p = jax.nn.sigmoid(preds) if sigmoid else preds
    axes = _spatial_axes(p)
    intersection = jnp.sum(p * labels, axis=axes)
    if squared_pred:
        denom = jnp.sum(p * p, axis=axes) + jnp.sum(labels * labels, axis=axes)
    else:
        denom = jnp.sum(p, axis=axes) + jnp.sum(labels, axis=axes)
    return _dice_from_sums(intersection, denom, smooth_nr=smooth_nr,
                           smooth_dr=smooth_dr)


def focal_loss(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    gamma: float = 2.0,
    alpha: Optional[float] = None,
) -> jnp.ndarray:
    """Sigmoid focal loss, MONAI FocalLoss defaults (gamma=2, no alpha)."""
    bce = (
        jnp.maximum(preds, 0) - preds * labels
        + jnp.log1p(jnp.exp(-jnp.abs(preds)))
    )
    p = jax.nn.sigmoid(preds)
    p_t = p * labels + (1.0 - p) * (1.0 - labels)
    loss = jnp.power(1.0 - p_t, gamma) * bce
    if alpha is not None:
        alpha_t = alpha * labels + (1.0 - alpha) * (1.0 - labels)
        loss = alpha_t * loss
    return jnp.mean(loss)


def dice_ce_loss(preds, labels) -> jnp.ndarray:
    """MONAI DiceCELoss(sigmoid=True) parity: dice + cross-entropy."""
    return dice_loss(preds, labels) + ce_loss(preds, labels)


def dice_focal_loss(preds, labels) -> jnp.ndarray:
    """MONAI DiceFocalLoss(sigmoid=True) parity: dice + focal."""
    return dice_loss(preds, labels) + focal_loss(preds, labels)


def generalized_dice_loss(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    sigmoid: bool = True,
    smooth_nr: float = _SMOOTH_NR,
    smooth_dr: float = _SMOOTH_DR,
) -> jnp.ndarray:
    """Generalized Dice (Sudre et al.): class weights 1/|G_c|^2."""
    p = jax.nn.sigmoid(preds) if sigmoid else preds
    axes = _spatial_axes(p)
    intersection = jnp.sum(p * labels, axis=axes)        # (B, C)
    ground = jnp.sum(labels, axis=axes)
    pred_sum = jnp.sum(p, axis=axes)
    return _generalized_dice_from_sums(
        intersection, pred_sum, ground, smooth_nr=smooth_nr,
        smooth_dr=smooth_dr)


def generalized_dice_focal_loss(preds, labels) -> jnp.ndarray:
    return generalized_dice_loss(preds, labels) + focal_loss(preds, labels)


def generalized_wasserstein_dice_loss(
    preds: jnp.ndarray,
    class_labels: jnp.ndarray,
    *,
    dist_matrix: Optional[jnp.ndarray] = None,
    smooth: float = 1e-5,
) -> jnp.ndarray:
    """Generalized Wasserstein Dice (Fidon et al. 2017).

    `class_labels` are integer class indices (the reference call-site passes
    argmax of the one-hot labels, loss.py:72-73); `dist_matrix` defaults to
    all-ones as constructed at loss.py:38.
    """
    c = preds.shape[-1]
    if dist_matrix is None:
        dist_matrix = jnp.ones((c, c), jnp.float32)
    probs = jax.nn.softmax(preds, axis=-1)
    flat_p = probs.reshape(probs.shape[0], -1, c)          # (B, N, C)
    flat_t = class_labels.reshape(class_labels.shape[0], -1)  # (B, N)
    m_rows = dist_matrix[flat_t]                            # (B, N, C)
    wass = jnp.sum(m_rows * flat_p, axis=-1)                # (B, N)
    # generalized true positives against the background-distance weighting
    alpha = dist_matrix[flat_t, 0]                          # (B, N)
    tp = jnp.sum(alpha * (1.0 - wass), axis=-1)
    denom = jnp.sum(alpha, axis=-1) + jnp.sum(alpha * wass, axis=-1)
    score = (2.0 * tp + smooth) / (denom + tp + smooth)
    return jnp.mean(1.0 - score)


def boundary_loss(preds: jnp.ndarray, dist_maps: jnp.ndarray) -> jnp.ndarray:
    """Boundary loss (LIVIAETS): mean of preds*signed-distance per class.

    Parity with reference BoundaryLoss.forward one_hot branch
    (loss.py:117-125): sum over classes of mean(pc*dc), divided by (C*B).
    `dist_maps` are precomputed signed distances (see losses/edt.py).
    """
    c = preds.shape[-1]
    b = preds.shape[0]
    per_class = jnp.mean(preds * dist_maps, axis=(0, *range(1, preds.ndim - 1)))
    return jnp.sum(per_class) / (c * b)


def _cross_kernel() -> jnp.ndarray:
    """3D 6-connected cross kernel, normalized by 7 (loss.py:187-192)."""
    k = jnp.zeros((3, 3, 3), jnp.float32)
    k = k.at[1, 1, 1].set(1.0)
    k = k.at[0, 1, 1].set(1.0)
    k = k.at[2, 1, 1].set(1.0)
    k = k.at[1, 0, 1].set(1.0)
    k = k.at[1, 2, 1].set(1.0)
    k = k.at[1, 1, 0].set(1.0)
    k = k.at[1, 1, 2].set(1.0)
    return k / 7.0


def hausdorff_er_loss(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    erosions: int = 5,
    alpha: float = 2.0,
    scaler: str = "log",
) -> jnp.ndarray:
    """Morphological-erosion Hausdorff loss (reference HausdorffERLoss,
    loss.py:173-231), vectorised as a `lax.scan` over erosion steps.

    Deviation from the reference, which is defective as written: its
    `F.conv3d(..., padding=4)` produces shape-mismatched accumulations that
    raise at runtime (loss.py:203-212). Here the erosion is a
    shape-preserving depthwise cross-kernel convolution applied per class.
    """
    bound = jnp.square(preds - labels).astype(jnp.float32)  # (B,D,H,W,C)
    c = bound.shape[-1]
    kernel = jnp.tile(_cross_kernel()[..., None, None], (1, 1, 1, 1, c))

    def erode_once(carry, k):
        eroded, total = carry
        dil = jax.lax.conv_general_dilated(
            eroded, kernel, window_strides=(1, 1, 1),
            padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
        )
        ero = jnp.maximum(dil - 0.5, 0.0)
        ptp = jnp.max(ero) - jnp.min(ero)
        ero = jnp.where(ptp > 0, (ero - jnp.min(ero)) / jnp.maximum(ptp, 1e-12),
                        ero)
        total = total + ero * jnp.power(k.astype(jnp.float32) + 1.0, alpha)
        return (ero, total), None

    (_, eroded_total), _ = jax.lax.scan(
        erode_once, (bound, jnp.zeros_like(bound)),
        jnp.arange(erosions),
    )
    eroded_total = jnp.nan_to_num(eroded_total)
    loss = jnp.mean(eroded_total)
    if scaler == "log":
        return jnp.log1p(loss)
    if scaler == "sqrt":
        return jnp.sqrt(loss)
    if scaler == "sqrt_log":
        return jnp.sqrt(jnp.log1p(loss))
    return loss


def _class_centroids(class_map: jnp.ndarray, num_classes: int):
    """Per-class centroids of an integer class map (D,H,W).

    Returns (centroids (C,3), valid (C,)) — the vectorised analogue of the
    reference's per-class nonzero loop (loss.py:271-275).
    """
    d, h, w = class_map.shape
    onehot = jax.nn.one_hot(class_map, num_classes, axis=0)  # (C,D,H,W)
    counts = jnp.sum(onehot, axis=(1, 2, 3))
    coords = [
        jax.lax.broadcasted_iota(jnp.float32, (d, h, w), i) for i in range(3)
    ]
    cents = jnp.stack(
        [jnp.sum(onehot * c, axis=(1, 2, 3)) for c in coords], axis=-1
    )  # (C, 3)
    cents = cents / jnp.maximum(counts, 1.0)[:, None]
    return cents, counts > 0


def _pairwise_angles(centroids: jnp.ndarray, eps: float = 1e-6):
    """Angle at vertex i between rays i->j and i->k (C,C,C), mirroring
    loss.py:283-295."""
    diff = centroids[:, None, :] - centroids[None, :, :]      # (C,C,3)
    norms = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    norms = jnp.where(norms > 0, norms, 1.0)
    unit = diff / (norms + eps)
    dots = jnp.einsum("ijd,ikd->ijk", unit, unit)
    dots = jnp.clip(dots, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(dots)


def multi_neighbor_loss(
    preds: jnp.ndarray, labels: jnp.ndarray, *, eps: float = 1e-6
) -> jnp.ndarray:
    """Inter-organ centroid-angle consistency (reference MultiNeighborLoss,
    loss.py:234-301), fully vectorised with validity masks instead of
    data-dependent class gathering."""
    num_classes = preds.shape[-1]

    def per_sample(p, l):
        l_map = jnp.argmax(l, axis=-1)
        p_map = jnp.argmax(jax.nn.sigmoid(p), axis=-1)
        l_cents, valid = _class_centroids(l_map, num_classes)
        p_cents, _ = _class_centroids(p_map, num_classes)
        l_ang = _pairwise_angles(l_cents, eps)
        p_ang = _pairwise_angles(p_cents, eps)
        # mask: all three classes valid in the label, and j < k (triu)
        v = valid.astype(jnp.float32)
        mask = v[:, None, None] * v[None, :, None] * v[None, None, :]
        triu = jnp.triu(jnp.ones((num_classes, num_classes)), k=1)
        mask = mask * triu[None, :, :]
        delta = jnp.square(p_ang - l_ang) * mask
        # fewer than two valid classes -> zero loss with unit count
        cnt = jnp.sum(mask)
        return jnp.where(cnt > 0, jnp.sum(delta), 0.0), jnp.maximum(cnt, 1.0)

    sums, counts = jax.vmap(per_sample)(preds, labels)
    return jnp.sum(sums) / jnp.sum(counts)


_SIMPLE: Dict[str, Callable] = {
    "mse": mse_loss,
    "ce": ce_loss,
    "bce": bce_loss,
    "dice": dice_loss,
    "focal": focal_loss,
    "dice_ce": dice_ce_loss,
    "dice_focal": dice_focal_loss,
    "generalized_dice": generalized_dice_loss,
    "generalized_dice_focal": generalized_dice_focal_loss,
    "multi_neighbor": multi_neighbor_loss,
    "hausdorff_er": hausdorff_er_loss,
}


# losses whose value is invariant under the lane-dense W-fold reshape
# (B,D,H,W,C) -> (B,D,H,W/f,f*C): pure elementwise means, plus the dice
# family whose per-(batch, class) spatial sums are recovered by an (f, C)
# regroup of the reduced axis. ce/softmax, argmax-based and spatially
# structured losses are NOT foldable.
_ELEMENTWISE_FOLDABLE = frozenset({"mse", "bce", "focal"})
_DICE_FOLDABLE = frozenset({"dice", "generalized_dice"})
FOLDABLE = _ELEMENTWISE_FOLDABLE | _DICE_FOLDABLE


def _folded_dice(p_sig, labels, f, c, *, generalized, smooth_nr=_SMOOTH_NR,
                 smooth_dr=_SMOOTH_DR):
    """dice/generalized_dice on the W-folded layout: spatial sums give
    (B, f*C); the (f, C) regroup restores exact per-class statistics."""
    axes = _spatial_axes(p_sig)
    b = p_sig.shape[0]
    inter = jnp.sum(p_sig * labels, axis=axes).reshape(b, f, c).sum(1)
    psum = jnp.sum(p_sig, axis=axes).reshape(b, f, c).sum(1)
    gsum = jnp.sum(labels, axis=axes).reshape(b, f, c).sum(1)
    if generalized:
        return _generalized_dice_from_sums(
            inter, psum, gsum, smooth_nr=smooth_nr, smooth_dr=smooth_dr)
    return _dice_from_sums(inter, psum + gsum, smooth_nr=smooth_nr,
                           smooth_dr=smooth_dr)


class CompositeLoss:
    """Comma-list composite loss (reference Loss, loss.py:25-86).

    `CompositeLoss("mse,bce,dice", num_classes, combine="sum")(preds, labels)`
    — preds are logits (N,D,H,W,C), labels one-hot float of the same shape.
    Pure and jit-compatible; distance maps for `boundary` must be supplied by
    the caller (precomputed host-side, see losses/edt.py).

    `fold`: lane-dense loss epilogue. A (…, C=15) f32 tensor pads 15 -> 128
    lanes on TPU (8.5x bytes on every elementwise pass AND its backward);
    reshaping to (B,D,H,W/f,f*C) before the loss removes the tax — measured
    1.64x on the full train step (benchmarks/train_probe.py, bs 2x96^3,
    mse+bce+dice). None = auto: fold 8 on TPU when every configured loss is
    fold-invariant (see FOLDABLE), off otherwise; the folded values equal
    the unfolded ones (same multiset for elementwise means; exact (f, C)
    regroup for the dice family)."""

    def __init__(
        self,
        losses: str,
        num_classes: int,
        combine: str = "sum",
        fold: Optional[int] = None,
    ) -> None:
        self.num_classes = num_classes
        self.combine = combine
        self.fold = fold
        self.names: Sequence[str] = [s.strip() for s in losses.split(",")]
        for name in self.names:
            if name not in _SIMPLE and name not in (
                "boundary", "generalized_wasserstein_dice"
            ):
                raise NotImplementedError(f"Loss ({name}) is not listed yet")

    def _auto_fold(self, preds: jnp.ndarray) -> int:
        explicit = self.fold is not None and self.fold > 1

        def declined(reason: str) -> int:
            # an explicitly requested fold that cannot be honored must not
            # silently become the slow layout (ADVICE r4); auto mode
            # (fold=None) falls back silently by design.
            if explicit:
                warnings.warn(
                    f"CompositeLoss(fold={self.fold}) cannot be applied "
                    f"({reason}); using the standard (unfolded) layout",
                    stacklevel=3,
                )
            return 1

        if not all(n in FOLDABLE for n in self.names):
            bad = [n for n in self.names if n not in FOLDABLE]
            return declined(f"non-fold-invariant losses {bad}")
        fold = self.fold
        if fold is None:
            try:
                on_tpu = jax.devices()[0].platform == "tpu"
            except Exception:  # pragma: no cover
                on_tpu = False
            fold = 8 if on_tpu else 1
        if fold <= 1:
            return 1
        if preds.ndim != 5:
            return declined(f"preds must be 5D NDHWC, got ndim={preds.ndim}")
        if preds.shape[3] % fold != 0:
            return declined(
                f"W={preds.shape[3]} is not divisible by fold={fold}")
        return fold

    def __call__(
        self,
        preds: jnp.ndarray,
        labels: jnp.ndarray,
        dist_maps: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if preds.shape[-1] != self.num_classes:
            raise ValueError(
                f"preds have {preds.shape[-1]} channels but CompositeLoss was "
                f"configured for num_classes={self.num_classes}; check the "
                "include_background setting on the Engine (it adds/removes "
                "the background channel before the loss)"
            )
        f = self._auto_fold(preds)
        if f > 1:
            b, d, h, w, c = preds.shape
            pf = preds.reshape(b, d, h, w // f, f * c)
            lf = labels.reshape(b, d, h, w // f, f * c)
            values = []
            for name in self.names:
                if name in _ELEMENTWISE_FOLDABLE:
                    values.append(_SIMPLE[name](pf, lf))
                else:  # dice family
                    values.append(_folded_dice(
                        jax.nn.sigmoid(pf), lf, f, c,
                        generalized=(name == "generalized_dice")))
            return self._combine(values)

        values = []
        for name in self.names:
            if name == "boundary":
                if dist_maps is None:
                    raise ValueError(
                        "boundary loss requires precomputed dist_maps"
                    )
                values.append(boundary_loss(preds, dist_maps))
            elif name == "generalized_wasserstein_dice":
                values.append(
                    generalized_wasserstein_dice_loss(
                        preds, jnp.argmax(labels, axis=-1)
                    )
                )
            else:
                values.append(_SIMPLE[name](preds, labels))
        return self._combine(values)

    def _combine(self, values) -> jnp.ndarray:
        if len(values) == 1:
            return values[0]
        stacked = jnp.stack(values)
        if self.combine == "sum":
            return jnp.sum(stacked)
        if self.combine == "mean":
            return jnp.mean(stacked)
        if self.combine == "log":
            return jnp.log1p(jnp.sum(stacked))
        raise NotImplementedError(
            "Unsupported loss_combine; choose from 'sum', 'mean', 'log'."
        )


def approx_distance_field(mask: jnp.ndarray, iterations: int = 10
                          ) -> jnp.ndarray:
    """On-device approximate EDT of a soft (...,D,H,W,C) foreground mask via
    iterative 6-neighbour min-propagation (chamfer relaxation). Used by
    `hausdorff_dt_loss`; exact host-side EDT lives in losses/edt.py."""
    big = float(iterations + 1)
    d = jnp.where(mask > 0.5, 0.0, big)

    def step(dist, _):
        padded = jnp.pad(
            dist, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
            constant_values=big,
        )
        m = dist
        for axis, off in ((1, 0), (1, 2), (2, 0), (2, 2), (3, 0), (3, 2)):
            idx = [slice(None), slice(1, -1), slice(1, -1), slice(1, -1),
                   slice(None)]
            idx[axis] = slice(off, off + dist.shape[axis])
            m = jnp.minimum(m, padded[tuple(idx)] + 1.0)
        return m, None

    d, _ = jax.lax.scan(step, d, None, length=iterations)
    return d


def hausdorff_dt_loss(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    alpha: float = 2.0,
    dt_iterations: int = 10,
) -> jnp.ndarray:
    """Distance-transform Hausdorff loss (reference HausdorffDTLoss,
    loss.py:135-170): mean of (p-g)^2 * (dt(p)^a + dt(g)^a).

    The reference's distance_field uses a defective O(n^4) EDT
    (loss.py:90-104) and hard-codes .cuda(); here the fields come from a
    jit-compatible chamfer approximation (exact within `dt_iterations`
    voxels of the surface, which dominates the loss mass)."""
    p = jax.nn.sigmoid(preds)
    pred_dt = approx_distance_field(p, dt_iterations)
    target_dt = approx_distance_field(labels, dt_iterations)
    err = jnp.square(p - labels)
    field = err * (jnp.power(pred_dt, alpha) + jnp.power(target_dt, alpha))
    return jnp.mean(field)


_SIMPLE["hausdorff_dt"] = hausdorff_dt_loss
