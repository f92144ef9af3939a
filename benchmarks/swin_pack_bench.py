"""DiffSwinUNETR pack-2 DDIM rate on the real chip (VERDICT r2 ask #9).

Run from /root/repo: `python benchmarks/swin_pack_bench.py [sw ...]`.
Host-read completion barrier (axon relay's block_until_ready returns
early). Compare against BASELINE.md r3: unpacked sw=8 = 30.6 steps/s.
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
from diff_unet_tpu.models.swin_unetr import DiffSwinUNETR  # noqa: E402

C = 15


def _read(x):
    return float(jnp.ravel(x)[0])


def bench(swb, pack, steps=10, n=3, int8=False):
    seg = DiffusionSegmenter(
        module=DiffSwinUNETR(out_channels=C, image_size=(96, 96, 96),
                             dtype=jnp.bfloat16, pack=pack, quantize=int8),
        num_classes=C, sample_steps=steps,
    )
    shape = (swb, 96, 96, 96, 1)
    params = seg.init(jax.random.key(0), shape)
    if int8:
        from diff_unet_tpu.engine.quantize import quantize_inference_params
        calib = jax.random.normal(jax.random.key(9), (2, 96, 96, 96, 1),
                                  jnp.float32)
        params = quantize_inference_params(seg, params,
                                           calibration_images=[calib])
    image = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    f = jax.jit(lambda p, im, r: seg.ddim_sample(p, im, r))
    t0 = time.perf_counter()
    _read(f(params, image, jax.random.key(2)))
    print(f"# compile+first call: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        _read(f(params, image, jax.random.key(2)))
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "bench": "ddim_diff_swin_unetr", "pack": pack, "sw_batch": swb,
        "steps_per_sec": round(swb * steps / dt, 2),
        "sec_per_call": round(dt, 3)}), flush=True)


if __name__ == "__main__":
    int8 = "--int8" in sys.argv
    sws = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [8, 16]
    for sw in sws:
        try:
            bench(sw, 2, int8=int8)
        except Exception as e:  # OOM at larger sw is an expected outcome
            print(json.dumps({"bench": "ddim_diff_swin_unetr", "pack": 2,
                              "sw_batch": sw, "int8": int8,
                              "error": repr(e)[:300]}),
                  flush=True)
