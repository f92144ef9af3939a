"""Benchmark: DDIM denoise steps/sec/chip on the flagship Diff-UNet.

Measures the jitted respaced DDIM-10 sampling loop (embed-once + 10 denoiser
forwards per window) on a batch of sw_batch_size=16 windows of 96^3 — the
exact inner workload of whole-volume sliding-window inference
(reference engine.py:167-177 with cfg/amos settings).

One "denoise step" = one denoiser forward on one 96^3 window (the unit the
reference executes (windows x 10) times per volume, SURVEY.md §3.2).

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
anchor is an analytic A100 estimate computed from this model's own measured
FLOPs: A100 bf16 peak 312 TFLOP/s x 45% assumed MFU for a conv-heavy UNet.
This is recorded (not hidden): baseline_steps_per_sec is included in the
JSON line and the methodology lives in BASELINE.md.

Emission contract (VERDICT r4 ask #1): the headline JSON line is printed
and flushed IMMEDIATELY after the steps measurement; each optional section
(serving bf16, swin, train, int8, serving int8) then re-prints the full —
now wider — JSON line when it completes, inside a wall-clock budget
(BENCH_BUDGET_S, default 450 s) checked before each section starts. A
driver timeout therefore loses only the tail sections, never the headline:
the LAST complete JSON line on stdout is always the current scoreboard.
Per-section timestamps go to stderr. `python bench.py --smoke` runs ONLY
the headline (<2 min warm).

Relay first-read stall (r4 postmortem, measured r5): on some axon-relay
hosts the FIRST device->host read of a process blocks for minutes
(63-742 s observed on one tiny (8,128) read; every later read, and every
later program's first execution, is then fast). This — not bench
structure or compile time — is what emptied BENCH_r04.json. Mitigation
here: a daemon thread issues a trivial device round-trip at import time so
the stall is absorbed concurrently with tracing/compilation, and a
preliminary headline line (value=null, status=channel_warmup, the stall
diagnostics) is emitted before the first result read so even a timeout
mid-stall leaves a parseable record of WHY.
"""
import json
import os
import sys
import threading
import time

import jax

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax.numpy as jnp  # noqa: E402

_CHANNEL = {"t_warm": None}


def _warm_channel():
    t0 = time.time()
    x = jnp.ones((8, 128), jnp.float32)
    _ = float(x.ravel()[0])
    _CHANNEL["t_warm"] = time.time() - t0


_warmer = threading.Thread(target=_warm_channel, daemon=True)
_warmer.start()

SW_BATCH = 16  # pack-2 halves L0/L1 activation bytes; 16 fits v5e HBM (+2%)
SWIN_SW_BATCH = 16  # transposed window-resident stages amortise: 43.2 vs 41.3 steps/s at sw=8 (r5)
STEPS = 10
CLASSES = 15
ROI = 96
A100_PEAK_FLOPS = 312e12
A100_ASSUMED_MFU = 0.45
# FLOPs of ONE unpacked denoiser forward on one 96^3 window, measured via
# denoise.lower(...).compile().cost_analysis() (r3 bench run, BENCH_r03.json;
# re-derive with BENCH_RECOMPUTE_FLOPS=1). The model + shape are fixed, so
# this is a constant of the benchmark, and hard-coding it removes a ~40 s
# throwaway unpacked compile from the timed path (r4 postmortem,
# BASELINE.md round-5 summary). The anchor deliberately uses UNPACKED
# FLOPs: pack-2 does 2x MACs on the two C=64 levels (structural zeros,
# ops/packed.py) and counting those would flatter vs_baseline.
FLOPS_PER_STEP = 1426626052096.0

T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "450"))
RESULT = {}


def emit():
    """Print the full current scoreboard as one JSON line (and flush)."""
    print(json.dumps(RESULT), flush=True)


def note(msg):
    print(f"[bench +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def over_budget(est_s, section):
    remaining = BUDGET_S - (time.time() - T0)
    if remaining < est_s:
        note(f"SKIP {section}: est {est_s:.0f}s > {remaining:.0f}s left")
        RESULT.setdefault("sections_skipped", []).append(section)
        return True
    return False


def measured_flops_per_step(seg_params):
    """Optionally re-derive FLOPS_PER_STEP (one unpacked batch-1 compile)."""
    from diff_unet_tpu.api import DiffusionSegmenter
    from diff_unet_tpu.models import DiffUNet

    seg_ref = DiffusionSegmenter(
        module=DiffUNet(out_channels=CLASSES, dtype=jnp.bfloat16),
        num_classes=CLASSES, sample_steps=STEPS,
    )
    denoise = jax.jit(seg_ref.denoise)
    x1 = jnp.zeros((1, ROI, ROI, ROI, CLASSES), jnp.float32)
    im1 = jnp.zeros((1, ROI, ROI, ROI, 1), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    cost = denoise.lower(seg_params, im1, x1, t1).compile().cost_analysis()
    return float(cost["flops"])


def serving_vol_per_min(serve_seg, serve_params, n_vol=8):
    """North-star: AMOS volumes/min through cross-volume continuous batching.

    Same methodology as benchmarks/serving_bench.py: 8 AMOS-sized volumes
    (96x192x192, 9 windows each — the r3-comparable count; fewer weighs
    the drained tail more), full warmup pass, timed pass runs warm.
    """
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


def main():
    from diff_unet_tpu.api import DiffusionSegmenter
    from diff_unet_tpu.models import DiffUNet

    smoke = "--smoke" in sys.argv or os.environ.get("BENCH_SMOKE") == "1"

    note("headline: init + compile ddim_sample (pack-2, sw=16)")
    seg = DiffusionSegmenter(
        module=DiffUNet(out_channels=CLASSES, dtype=jnp.bfloat16, pack=2),
        num_classes=CLASSES, sample_steps=STEPS,
    )
    shape = (SW_BATCH, ROI, ROI, ROI, 1)
    params = seg.init(jax.random.key(0), shape)
    image = jax.random.normal(jax.random.key(1), shape, jnp.float32)

    sample = jax.jit(seg.ddim_sample)

    flops_per_step = FLOPS_PER_STEP
    if os.environ.get("BENCH_RECOMPUTE_FLOPS") == "1":
        note("re-deriving FLOPS_PER_STEP via cost_analysis")
        flops_per_step = measured_flops_per_step(params)
        note(f"flops_per_step = {flops_per_step:.4e}")

    # a preliminary record BEFORE the first result read: if the relay
    # first-read stall (module docstring) eats the driver's timeout, the
    # artifact still explains itself instead of being empty.
    RESULT.update({
        "metric": "ddim_denoise_steps_per_sec_per_chip",
        "value": None, "status": "channel_warmup",
        "unit": "96^3-window denoiser steps/sec",
        "sw_batch": SW_BATCH, "steps": STEPS, "classes": CLASSES,
    })
    emit()

    # warmup / compile. NOTE: under the axon relay block_until_ready can
    # return before compute finishes; a host read of a result element is the
    # only reliable completion barrier, so every timed iteration reads one.
    out = sample(params, image, jax.random.key(2))
    _ = float(out.ravel()[0])
    _warmer.join(timeout=0)
    if _CHANNEL["t_warm"] is not None:
        RESULT["relay_first_read_s"] = round(_CHANNEL["t_warm"], 1)
        note(f"relay first-read stall: {_CHANNEL['t_warm']:.1f}s")
    RESULT.pop("status", None)
    note("headline: compiled + warm; timing 5 iters")

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

    steps_per_sec = SW_BATCH * STEPS * n_iters / elapsed
    baseline = A100_PEAK_FLOPS * A100_ASSUMED_MFU / flops_per_step

    RESULT.update({
        "metric": "ddim_denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "96^3-window denoiser steps/sec",
        "vs_baseline": round(steps_per_sec / baseline, 3),
        "baseline_steps_per_sec": round(baseline, 2),
        "flops_per_step": flops_per_step,
        "sw_batch": SW_BATCH, "steps": STEPS, "classes": CLASSES,
        "seconds_per_window_batch": round(elapsed / n_iters, 4),
    })
    note(f"headline: {steps_per_sec:.1f} steps/s — emitting")
    emit()
    if smoke:
        return

    # ---- north-star: continuous serving volumes/min (BASELINE.json).
    if not over_budget(45, "serving_bf16"):
        note("serving bf16: warmup + timed pass (8 AMOS volumes)")
        try:
            del out
            RESULT["volumes_per_min_bf16"] = round(
                serving_vol_per_min(seg, params), 2)
        except Exception as e:
            RESULT["serving_error"] = f"{type(e).__name__}: {e}"[:300]
        emit()

    # ---- second flagship family: DiffSwinUNETR DDIM steps/s (VERDICT r4
    # ask #2) — the transposed window-resident Swin path, pack-2 convs.
    if not over_budget(45, "swin"):
        note(f"swin: init + compile ddim_sample (sw={SWIN_SW_BATCH})")
        try:
            from diff_unet_tpu.models.swin_unetr import DiffSwinUNETR

            seg_s = DiffusionSegmenter(
                module=DiffSwinUNETR(out_channels=CLASSES,
                                     image_size=(ROI, ROI, ROI), pack=2,
                                     dtype=jnp.bfloat16),
                num_classes=CLASSES, sample_steps=STEPS,
            )
            sshape = (SWIN_SW_BATCH, ROI, ROI, ROI, 1)
            params_s = seg_s.init(jax.random.key(0), sshape)
            image_s = jax.random.normal(jax.random.key(1), sshape,
                                        jnp.float32)
            sample_s = jax.jit(seg_s.ddim_sample)
            out_s = sample_s(params_s, image_s, jax.random.key(2))
            _ = float(out_s.ravel()[0])
            t0 = time.perf_counter()
            for i in range(3):
                out_s = sample_s(params_s, image_s, jax.random.key(3 + i))
                _ = float(out_s.ravel()[0])
            swin_elapsed = (time.perf_counter() - t0) / 3
            RESULT["swin_steps_per_sec"] = round(
                SWIN_SW_BATCH * STEPS / swin_elapsed, 2)
            RESULT["swin_sw_batch"] = SWIN_SW_BATCH
            del out_s, sample_s, params_s, image_s, seg_s
        except Exception as e:
            RESULT["swin_error"] = f"{type(e).__name__}: {e}"[:300]
        emit()

    # ---- training step (VERDICT r3 ask #5): regression-track vs r2's
    # 0.317 s/step (bs 2x96^3, pack-2, mse+bce+dice; fold auto-on since r4)
    if not over_budget(30, "train"):
        note("train: compile + 5 steps")
        try:
            from diff_unet_tpu.engine import make_optimizer
            from diff_unet_tpu.engine.train import (
                create_train_state, make_train_step,
            )
            from diff_unet_tpu.losses import CompositeLoss

            bs = 2
            tshape = (bs, ROI, ROI, ROI, 1)
            state = create_train_state(seg, jax.random.key(0), tshape,
                                       make_optimizer(lr=1e-4))
            step = make_train_step(seg, CompositeLoss("mse,bce,dice",
                                                      CLASSES),
                                   donate=False)
            rng_np = jax.random.key(11)
            lab = jax.nn.one_hot(
                jax.random.randint(jax.random.key(12), tshape[:4], 0,
                                   CLASSES),
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
            RESULT["train_sec_per_step"] = round(
                (time.perf_counter() - t0) / n_train, 4)
            RESULT["train_batch"] = bs
            del state, step, batch, lab, m
        except Exception as e:
            RESULT["train_error"] = f"{type(e).__name__}: {e}"[:300]
        emit()

    # ---- opt-in W8A8 int8 (extra fields; bf16 stays the headline value
    # for apples-to-apples honesty). sw=16 fits since the dense DDIM state
    # packing (api.py, BASELINE.md r3).
    seg_q = merged = None
    if not over_budget(60, "int8"):
        note("int8: quantize + compile + 5 iters")
        try:
            from diff_unet_tpu.engine.quantize import (
                quantize_inference_params,
            )

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
            RESULT["int8_steps_per_sec"] = round(
                SW_BATCH * STEPS * n_iters / int8_elapsed, 2)
            RESULT["int8_sw_batch"] = SW_BATCH
            RESULT["int8_mode"] = \
                "offline W8A8, calibrated static act scales"
            del out_q, sample_q
        except Exception as e:
            RESULT["int8_error"] = f"{type(e).__name__}: {e}"[:300]
        emit()

    if merged is not None and not over_budget(45, "serving_int8"):
        note("serving int8: warmup + timed pass")
        try:
            RESULT["volumes_per_min_int8"] = round(
                serving_vol_per_min(seg_q, merged), 2)
        except Exception as e:
            RESULT["serving_int8_error"] = f"{type(e).__name__}: {e}"[:300]
        emit()

    note(f"done in {time.time() - T0:.1f}s")


if __name__ == "__main__":
    main()
