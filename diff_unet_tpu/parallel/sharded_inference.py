"""Multi-chip whole-volume inference: windows sharded over the mesh.

The TPU-native scale-out of sliding-window inference (SURVEY.md §2.2
"sequence/context parallel" row, and the DataParallel window batching of
engine.py:173): every device runs the batched DDIM scan over a *disjoint
subset of windows* of the (replicated) volume and scatter-adds predictions
into a local accumulator; a single `psum` over ICI merges the stitch.
Embarrassingly parallel with one collective — no per-call replica
gather/scatter, no host round-trips.

Works on any ("data", ...) mesh; validated on the virtual 8-device CPU mesh
against the single-device inferer (bitwise-equal stitching given the same
per-window rng discipline).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from diff_unet_tpu.engine.sliding_window import (
    SlidingWindowInferer,
    window_keys,
)


def make_sharded_inferer(
    inferer: SlidingWindowInferer,
    mesh: Mesh,
    predictor: Callable,   # (params, windows (sw,*roi,Cin), keys (sw,)) -> (sw,*roi,C)
    out_channels: int,
    volume_shape,          # static (D, H, W, Cin)
    axis: str = "data",
):
    """Build a jitted f(params, volume, rng) -> (D,H,W,C) stitched logits."""
    n_dev = mesh.shape[axis]
    rd, rh, rw = inferer.roi
    d, h, w, cin = volume_shape
    pad_shape = tuple(max(r, s) for r, s in zip(inferer.roi, (d, h, w)))

    groups = inferer._geometry(pad_shape)
    sw = 1
    while sw * 2 <= inferer.sw_batch_size:
        sw *= 2

    def device_layout(group_list):
        """Flatten po2 batch groups, pad to a multiple of n_dev*sw, lay out
        device-major (n_dev, per_dev_batches, sw, ...). Works on numpy
        (build time) and traced jnp arrays (runtime geometry override —
        shapes are static per bucket). Cross-device padding is bounded by
        n_dev*sw-1 slots."""
        xp = jnp if any(isinstance(g, jnp.ndarray) for g, _ in group_list) \
            else np
        st = xp.concatenate([g.reshape(-1, 3) for g, _ in group_list])
        va = xp.concatenate([v.reshape(-1) for _, v in group_list])
        per_dev_batches = -(-st.shape[0] // (n_dev * sw))
        pad = per_dev_batches * n_dev * sw - st.shape[0]
        st = xp.concatenate([st, xp.zeros((pad, 3), np.int32)])
        va = xp.concatenate([va, xp.zeros(pad, np.float32)])
        return (st.reshape(n_dev, per_dev_batches, sw, 3),
                va.reshape(n_dev, per_dev_batches, sw))

    starts, valid = device_layout(groups)

    imp = inferer.importance()             # (*roi)

    def local(params, volume, starts_l, valid_l, rng):
        """Runs on one device: its window subset -> local partial stitch."""
        starts_l = starts_l[0]   # shard_map adds the device-sharded dim
        valid_l = valid_l[0]
        out_shape = (*pad_shape, out_channels)
        accum = jnp.zeros(out_shape, jnp.float32)
        # no trailing 1-dim: it pads to 128 lanes (see sliding_window.py)
        weight = jnp.zeros(pad_shape, jnp.float32)
        imp_j = jnp.asarray(imp)

        def gather(s):
            return jax.lax.dynamic_slice(
                volume, (s[0], s[1], s[2], 0), (rd, rh, rw, cin)
            )

        def body(carry, inputs):
            acc, wgt = carry
            b_starts, b_valid = inputs
            windows = jax.vmap(gather)(b_starts)
            # same per-window key discipline as the serial inferer
            # (sliding_window.window_keys): noise depends only on the
            # window's start coordinates, never on batching or layout
            keys = window_keys(rng, b_starts)
            preds = predictor(params, windows, keys)
            preds = preds.astype(jnp.float32)

            def scatter_one(j, aw):
                acc_, wgt_ = aw
                s = b_starts[j]
                w_map = imp_j * b_valid[j]
                idx = (s[0], s[1], s[2], 0)
                cur = jax.lax.dynamic_slice(
                    acc_, idx, (rd, rh, rw, out_channels))
                acc_ = jax.lax.dynamic_update_slice(
                    acc_, cur + preds[j] * w_map[..., None], idx)
                curw = jax.lax.dynamic_slice(
                    wgt_, idx[:3], (rd, rh, rw))
                wgt_ = jax.lax.dynamic_update_slice(
                    wgt_, curw + w_map, idx[:3])
                return acc_, wgt_

            acc, wgt = jax.lax.fori_loop(0, sw, scatter_one, (acc, wgt))
            return (acc, wgt), None

        (accum, weight), _ = jax.lax.scan(
            body, (accum, weight), (starts_l, valid_l)
        )
        accum = jax.lax.psum(accum, axis)
        weight = jax.lax.psum(weight, axis)[..., None]
        return jnp.where(weight > 0, accum / weight, 0.0)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )

    def run(params, volume, rng, groups_override=None):
        """`groups_override`: runtime window geometry (same structure as
        `inferer._geometry`'s output) — used by the bucketed compile cache
        so the true clamped starts of each real volume are traced inputs
        while this program stays keyed on the bucket shape."""
        if groups_override is not None:
            st, va = device_layout(groups_override)
        else:
            st, va = jnp.asarray(starts), jnp.asarray(valid)
        pads = [(0, p - s) for p, s in zip(pad_shape, (d, h, w))]
        if any(x != (0, 0) for x in pads):
            volume = jnp.pad(volume, pads + [(0, 0)])
        out = sharded(params, volume, st, va, rng)
        return out[:d, :h, :w, :]

    return jax.jit(run)
