"""Continuous-batching serving throughput on the real chip.

Serves N AMOS-sized volumes (96x192x192, 9 windows each) through the
cross-volume window scheduler (engine/serving.py) and reports volumes/min,
comparable to the monolithic whole-volume number in BASELINE.md (34.3 bf16 /
44.4 int8 vol/min at r3). The point: per-volume batching is capped at the
sw=8 rate + a tail dispatch; packing windows across volumes into full
16-batches runs everything at the sw=16 rate (BASELINE.md r3 calibration).

Usage: python benchmarks/serving_bench.py [n_volumes] [unit] [--int8] [--swin]

--swin serves through DiffSwinUNETR (feature_size=48, pack-2) instead of the
flagship DiffUNet — same scheduler, different denoiser; fills the Swin
whole-volume serving row (BASELINE.md has only its step rate otherwise).
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

from diff_unet_tpu.api import DiffusionSegmenter  # noqa: E402
from diff_unet_tpu.engine.serving import ContinuousBatchingInferer  # noqa: E402
from diff_unet_tpu.models import DiffUNet  # noqa: E402

C = 15
VOL = (96, 192, 192)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_vol = int(args[0]) if args else 8
    unit = int(args[1]) if len(args) > 1 else 16
    int8 = "--int8" in sys.argv
    swin = "--swin" in sys.argv

    if swin:
        from diff_unet_tpu.models.swin_unetr import DiffSwinUNETR
        module = DiffSwinUNETR(out_channels=C, image_size=(96, 96, 96),
                               dtype=jnp.bfloat16, pack=2, quantize=int8)
    else:
        module = DiffUNet(out_channels=C, dtype=jnp.bfloat16, pack=2,
                          quantize=int8)
    seg = DiffusionSegmenter(module=module, num_classes=C, sample_steps=10)
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

    # results stream out as volumes finalize; the host read of one element
    # per result is both the completion barrier (the axon relay's
    # block_until_ready returns early) and what keeps device memory flat
    # (retaining every (D,H,W,C) f32 logits+binary pair would OOM)
    def drain(i, logits, binary):
        _ = float(logits[0, 0, 0, 0])

    # warmup: a FULL identical pass, so the timed pass sees exactly the
    # already-compiled program set (batch schedule depends on the volume
    # list, so a shorter warmup would leave tail programs to compile
    # inside the timed region)
    t0 = time.perf_counter()
    cb.serve(params, volumes, jax.random.key(1), on_result=drain)
    print(f"# warmup ({n_vol} volumes incl. compile): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    cb.serve(params, volumes, jax.random.key(2), on_result=drain)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "bench": "continuous_serving_ddim10",
        "model": "diff_swin_unetr" if swin else "diff_unet",
        "dtype": "int8" if int8 else "bf16",
        "n_volumes": n_vol, "unit": unit, "vol_shape": list(VOL),
        "volumes_per_min": round(60.0 * n_vol / dt, 2),
        "sec_per_volume": round(dt / n_vol, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
