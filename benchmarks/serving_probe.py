"""Decompose continuous-serving wall time into dispatch / fence segments.

The continuous path runs at 98% (bf16) / 89% (int8) of what the raw step
rate permits (BASELINE.md r3). This probe times every host-side segment of
`ContinuousBatchingInferer.serve` — gather/concat/predict/scatter/finalize
dispatch, fence waits, python scheduling — to locate the missing int8
~250 ms/batch. Dispatch segments include any synchronous relay round trips;
fence waits are where actual device time surfaces.

Usage: python benchmarks/serving_probe.py [n_volumes] [unit] [--int8]
"""
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax.numpy as jnp  # noqa: E402

from diff_unet_tpu.api import DiffusionSegmenter  # noqa: E402
from diff_unet_tpu.engine import serving  # noqa: E402
from diff_unet_tpu.engine.serving import ContinuousBatchingInferer  # noqa: E402
from diff_unet_tpu.models import DiffUNet  # noqa: E402

C = 15
VOL = (96, 192, 192)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_vol = int(args[0]) if args else 8
    unit = int(args[1]) if len(args) > 1 else 16
    int8 = "--int8" in sys.argv

    seg = DiffusionSegmenter(
        module=DiffUNet(out_channels=C, dtype=jnp.bfloat16, pack=2,
                        quantize=int8),
        num_classes=C, sample_steps=10,
    )
    params = seg.init(jax.random.key(0), (8, 96, 96, 96, 1))
    if int8:
        from diff_unet_tpu.engine.quantize import quantize_inference_params
        calib = jax.random.normal(jax.random.key(9), (2, 96, 96, 96, 1),
                                  jnp.float32)
        params = quantize_inference_params(seg, params,
                                           calibration_images=[calib])

    volumes = [
        jax.random.normal(jax.random.key(100 + i), (*VOL, 1), jnp.float32)
        for i in range(n_vol)
    ]
    cb = ContinuousBatchingInferer(seg, roi=(96, 96, 96), unit=unit,
                                   overlap=0.25)

    acc = defaultdict(float)
    cnt = defaultdict(int)

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            acc[name] += time.perf_counter() - t0
            cnt[name] += 1
            return out
        return wrap

    for name in ("_concat", "_predict", "_digest"):
        setattr(cb, name, timed(name, getattr(cb, name)))

    # gather/scatter/finalize live in the per-bucket program LRU: wrap the
    # dict the LRU hands out so every dispatch is timed regardless of bucket
    orig_bucket_programs = cb._bucket_programs

    def bucket_programs(bucket):
        progs = orig_bucket_programs(bucket)
        if not progs.get("_timed"):
            for name in ("_gather", "_scatter", "_finalize"):
                progs[name[1:]] = timed(name, progs[name[1:]])
            progs["_timed"] = True
        return progs

    cb._bucket_programs = bucket_programs
    orig_block = serving._block
    # restore the module global even if serve raises (OOM, interrupt) —
    # otherwise the timing wrapper leaks for the rest of the process
    serving._block = timed("fence_wait", orig_block)
    try:
        def drain(i, logits, binary):
            t0 = time.perf_counter()
            _ = float(logits[0, 0, 0, 0])
            acc["drain_read"] += time.perf_counter() - t0
            cnt["drain_read"] += 1

        t0 = time.perf_counter()
        cb.serve(params, volumes, jax.random.key(1), on_result=drain)
        print(f"# warmup: {time.perf_counter() - t0:.1f}s", flush=True)

        acc.clear()
        cnt.clear()
        t0 = time.perf_counter()
        cb.serve(params, volumes, jax.random.key(2), on_result=drain)
        dt = time.perf_counter() - t0
    finally:
        serving._block = orig_block

    segs = {k: round(v, 3) for k, v in sorted(acc.items())}
    accounted = sum(acc.values())
    print(json.dumps({
        "bench": "serving_probe",
        "dtype": "int8" if int8 else "bf16",
        "n_volumes": n_vol, "unit": unit,
        "volumes_per_min": round(60.0 * n_vol / dt, 2),
        "total_s": round(dt, 3),
        "segments_s": segs,
        "calls": dict(cnt),
        "python_other_s": round(dt - accounted, 3),
    }, indent=None), flush=True)


if __name__ == "__main__":
    main()
