"""Does the training loss epilogue pay the (…,C) lane-padding tax? (v5e)

The r3 inference win: (…,15) f32 DDIM state tensors pad 15 -> 128 lanes
(8.5x bytes); folding W into lanes removed it (+15% end-to-end, api.py).
The training step carries the same (…,C) f32 tensors through its loss
epilogue — one-hot labels, sigmoid(preds), mse/bce elementwise maps, and
per-class dice reductions — plus their BACKWARD passes. This probe times
the full jitted train step with
  (a) the standard CompositeLoss("mse,bce,dice"), and
  (b) a lane-folded variant computing the identical scalars on
      (B, D, H, W/f, f*C) reshapes (elementwise losses are reshape-
      invariant; the dice per-class sums un-fold with a (f, C) reshape
      of the reduced axis),
and asserts the losses agree. If (b) wins, the fold moves into the engine
(VERDICT r3 weak #5).

Usage: python benchmarks/train_probe.py [batch] [fold]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diff_unet_tpu.api import DiffusionSegmenter  # noqa: E402
from diff_unet_tpu.engine.train import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from diff_unet_tpu.losses import CompositeLoss  # noqa: E402
from diff_unet_tpu.models import DiffUNet  # noqa: E402

C = 15
R = 96
_SMOOTH_NR = 1e-5
_SMOOTH_DR = 1e-5


class FoldedMseBceDice:
    """mse+bce+dice (sum combine) computed on a W-folded lane-dense layout.

    Numerically identical to CompositeLoss("mse,bce,dice"): elementwise maps
    see the same multiset of values; dice's per-(batch,class) sums are
    recovered by reducing the (f, C) split of the folded channel axis."""

    def __init__(self, num_classes: int, fold: int = 8):
        self.num_classes = num_classes
        self.fold = fold

    def __call__(self, preds, labels, dist_maps=None):
        f = self.fold
        b, d, h, w, c = preds.shape
        p = preds.reshape(b, d, h, w // f, f * c)
        l_ = labels.reshape(b, d, h, w // f, f * c)
        sp = jax.nn.sigmoid(p)
        mse = jnp.mean(jnp.square(sp - l_))
        bce = jnp.mean(
            jnp.maximum(p, 0) - p * l_ + jnp.log1p(jnp.exp(-jnp.abs(p)))
        )
        inter = jnp.sum(sp * l_, axis=(1, 2, 3)).reshape(b, f, c).sum(1)
        denom = (
            jnp.sum(sp, axis=(1, 2, 3)) + jnp.sum(l_, axis=(1, 2, 3))
        ).reshape(b, f, c).sum(1)
        dice = jnp.mean(
            1.0 - (2.0 * inter + _SMOOTH_NR) / (denom + _SMOOTH_DR))
        return mse + bce + dice


def time_step(step, state, batch, n=5):
    rng = jax.random.key(11)
    state, m = step(state, batch, rng)
    loss0 = float(m["loss"])  # compile + completion barrier
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
        _ = float(m["loss"])
    return (time.perf_counter() - t0) / n, loss0


def main():
    args = sys.argv[1:]
    bs = int(args[0]) if args else 2
    fold = int(args[1]) if len(args) > 1 else 8
    shape = (bs, R, R, R, 1)

    seg = DiffusionSegmenter(
        module=DiffUNet(out_channels=C, dtype=jnp.bfloat16, pack=2),
        num_classes=C,
    )
    lab = jax.nn.one_hot(
        jax.random.randint(jax.random.key(12), shape[:4], 0, C), C
    ).astype(jnp.float32)
    batch = {
        "image": jax.random.normal(jax.random.key(13), shape, jnp.float32),
        "label": lab,
    }

    results = {}
    losses = {}
    for name, crit in (
        ("standard", CompositeLoss("mse,bce,dice", C)),
        ("folded", FoldedMseBceDice(C, fold)),
    ):
        state = create_train_state(seg, jax.random.key(0), shape)
        step = make_train_step(seg, crit)
        sec, loss0 = time_step(step, state, batch)
        results[name] = sec
        losses[name] = loss0
        print(f"# {name:9s} {sec:.4f} s/step  loss={loss0:.6f}", flush=True)

    np.testing.assert_allclose(losses["standard"], losses["folded"],
                               rtol=1e-5)
    print(json.dumps({
        "bench": "train_probe", "batch": bs, "fold": fold,
        "standard_s": round(results["standard"], 4),
        "folded_s": round(results["folded"], 4),
        "speedup": round(results["standard"] / results["folded"], 4),
    }), flush=True)


if __name__ == "__main__":
    main()
