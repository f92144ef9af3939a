"""Benchmark: DDIM denoise steps/sec/chip on the flagship Diff-UNet.

Measures the jitted respaced DDIM-10 sampling loop (embed-once + 10 denoiser
forwards per window) on a batch of sw_batch_size=4 windows of 96^3 — the
exact inner workload of whole-volume sliding-window inference
(reference engine.py:167-177 with cfg/amos settings).

One "denoise step" = one denoiser forward on one 96^3 window (the unit the
reference executes (windows x 10) times per volume, SURVEY.md §3.2).

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
anchor is an analytic A100 estimate computed from this model's own measured
FLOPs: A100 bf16 peak 312 TFLOP/s x 45% assumed MFU for a conv-heavy UNet.
This is recorded (not hidden): baseline_steps_per_sec is included in the
JSON line and the methodology lives in BASELINE.md.
"""
import json
import time

import jax

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax.numpy as jnp  # noqa: E402

SW_BATCH = 16  # pack-2 halves L0/L1 activation bytes; 16 fits v5e HBM (+2%)
STEPS = 10
CLASSES = 15
ROI = 96
A100_PEAK_FLOPS = 312e12
A100_ASSUMED_MFU = 0.45


def main():
    from diff_unet_tpu.api import DiffusionSegmenter
    from diff_unet_tpu.models import DiffUNet

    seg = DiffusionSegmenter(
        module=DiffUNet(out_channels=CLASSES, dtype=jnp.bfloat16, pack=2),
        num_classes=CLASSES, sample_steps=STEPS,
    )
    shape = (SW_BATCH, ROI, ROI, ROI, 1)
    params = seg.init(jax.random.key(0), shape)
    image = jax.random.normal(jax.random.key(1), shape, jnp.float32)

    sample = jax.jit(seg.ddim_sample)

    # FLOPs of a single denoiser forward (one step, full window batch).
    # The anchor uses the ORIGINAL (unpacked) model's FLOPs: channel-packed
    # execution does 2x MACs on the two C=64 levels (structural zeros,
    # ops/packed.py), and counting those would flatter vs_baseline — the
    # reference on an A100 runs the original FLOPs.
    # analysed at batch 1 (FLOPs are linear in batch; a sw=16 unpacked
    # compile alongside the packed loop would exceed HBM)
    seg_ref = DiffusionSegmenter(
        module=DiffUNet(out_channels=CLASSES, dtype=jnp.bfloat16),
        num_classes=CLASSES, sample_steps=STEPS,
    )
    denoise = jax.jit(seg_ref.denoise)
    x1 = jnp.zeros((1, ROI, ROI, ROI, CLASSES), jnp.float32)
    im1 = jnp.zeros((1, ROI, ROI, ROI, 1), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    try:
        cost = denoise.lower(params, im1, x1, t1).compile().cost_analysis()
        flops_per_batch_step = float(cost["flops"]) * SW_BATCH
    except Exception:
        flops_per_batch_step = float("nan")
    del denoise, seg_ref, x1, im1, t1

    # warmup / compile. NOTE: under the axon relay block_until_ready can
    # return before compute finishes; a host read of a result element is the
    # only reliable completion barrier, so every timed iteration reads one.
    out = sample(params, image, jax.random.key(2))
    _ = float(out.ravel()[0])

    n_iters = 5
    # a host read every iteration: the only reliable completion barrier
    # under the relay (block_until_ready returns early), and it keeps only
    # one result buffer alive (queued dispatches hold all five result
    # buffers concurrently, which does not fit HBM at sw=16).
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = sample(params, image, jax.random.key(3 + i))
        _ = float(out.ravel()[0])
    elapsed = time.perf_counter() - t0

    window_steps = SW_BATCH * STEPS * n_iters
    steps_per_sec = window_steps / elapsed

    if flops_per_batch_step == flops_per_batch_step:  # not NaN
        flops_per_step = flops_per_batch_step / SW_BATCH
        baseline = A100_PEAK_FLOPS * A100_ASSUMED_MFU / flops_per_step
    else:
        baseline = float("nan")

    # opt-in W8A8 int8 serving rate (reported as extra fields; bf16 stays
    # the headline value for apples-to-apples honesty). sw=16 fits since
    # the dense state packing of the DDIM loop (api.py, BASELINE.md r3).
    int8_steps = None
    int8_error = None
    try:
        from diff_unet_tpu.engine.quantize import quantize_inference_params

        del out
        seg_q = DiffusionSegmenter(
            module=DiffUNet(out_channels=CLASSES, dtype=jnp.bfloat16,
                            pack=2, quantize=True),
            num_classes=CLASSES, sample_steps=STEPS,
        )
        merged = quantize_inference_params(
            seg_q, params, calibration_images=[image[:2]])
        sample_q = jax.jit(seg_q.ddim_sample)
        out_q = sample_q(merged, image, jax.random.key(2))
        _ = float(out_q.ravel()[0])
        t0 = time.perf_counter()
        for i in range(n_iters):
            out_q = sample_q(merged, image, jax.random.key(3 + i))
            _ = float(out_q.ravel()[0])
        int8_elapsed = time.perf_counter() - t0
        int8_steps = SW_BATCH * STEPS * n_iters / int8_elapsed
    except Exception as e:  # keep the bf16 headline; record the regression
        int8_error = f"{type(e).__name__}: {e}"[:300]

    print(json.dumps({
        "metric": "ddim_denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "96^3-window denoiser steps/sec",
        "vs_baseline": round(steps_per_sec / baseline, 3)
        if baseline == baseline else None,
        "baseline_steps_per_sec": round(baseline, 2)
        if baseline == baseline else None,
        "flops_per_step": flops_per_step if baseline == baseline else None,
        "sw_batch": SW_BATCH, "steps": STEPS, "classes": CLASSES,
        "seconds_per_window_batch": round(elapsed / n_iters, 4),
        "int8_steps_per_sec": round(int8_steps, 2) if int8_steps else None,
        "int8_sw_batch": SW_BATCH,
        "int8_mode": "offline W8A8, calibrated static act scales",
        **({"int8_error": int8_error} if int8_error else {}),
    }))


if __name__ == "__main__":
    main()
