"""Extended benchmark suite (bench.py stays the one-line driver metric).

Measures, on the real chip:
1. diff_unet DDIM-10 denoise steps/sec (window batch 8) — headline
2. diff_swin_unetr DDIM-10 denoise steps/sec (window batch 2)
3. diff_unet training steps/sec (batch 2, 96^3)
4. whole-volume sliding-window inference volumes/min (AMOS-sized volume)

Completion is forced with host reads (axon relay's block_until_ready
returns early).
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

from diff_unet_tpu.api import DiffusionSegmenter
from diff_unet_tpu.engine import make_optimizer, make_train_step
from diff_unet_tpu.engine.sliding_window import make_diffusion_inferer
from diff_unet_tpu.engine.train import create_train_state
from diff_unet_tpu.losses import CompositeLoss
from diff_unet_tpu.models import DiffUNet
from diff_unet_tpu.models.swin_unetr import DiffSwinUNETR

C = 15


def _read(x):
    return float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


def _time(f, *args, n=3):
    out = f(*args)
    _read(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
        _read(out)
    return (time.perf_counter() - t0) / n


def bench_ddim(module, swb, steps=10, tag=""):
    seg = DiffusionSegmenter(module=module, num_classes=C,
                             sample_steps=steps)
    shape = (swb, 96, 96, 96, 1)
    params = seg.init(jax.random.key(0), shape)
    image = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    f = jax.jit(lambda p, im, r: seg.ddim_sample(p, im, r))
    dt = _time(f, params, image, jax.random.key(2))
    rate = swb * steps / dt
    print(json.dumps({"bench": f"ddim_{tag}", "steps_per_sec": round(rate, 2),
                      "sw_batch": swb, "sec_per_call": round(dt, 3)}))
    return rate


def bench_train_step(batch_size=2):
    # pack-2: backward fits without block remat (BASELINE.md r2: 1.9x,
    # 0.60 -> 0.32 s/step at bs 2x96^3)
    seg = DiffusionSegmenter(
        module=DiffUNet(out_channels=C, pack=2, dtype=jnp.bfloat16),
        num_classes=C,
    )
    shape = (batch_size, 96, 96, 96, 1)
    state = create_train_state(seg, jax.random.key(0), shape,
                               make_optimizer(lr=1e-4))
    rng = jax.random.key(1)
    batch = {
        "image": jax.random.normal(rng, shape, jnp.float32),
        "label": jax.nn.one_hot(
            jax.random.randint(rng, shape[:4], 0, C), C
        ).astype(jnp.float32),
    }
    step = make_train_step(seg, CompositeLoss("mse,bce,dice", C),
                           donate=False)
    dt = _time(lambda s, b, r: step(s, b, r)[1]["loss"], state, batch,
               jax.random.key(2))
    print(json.dumps({"bench": "train_step", "steps_per_sec":
                      round(1 / dt, 3), "batch": batch_size,
                      "sec_per_step": round(dt, 3)}))
    return 1 / dt


def bench_whole_volume(vol_shape=(96, 192, 192)):
    """AMOS-like post-resample volume through sliding-window DDIM-10."""
    seg = DiffusionSegmenter(
        module=DiffUNet(out_channels=C, dtype=jnp.bfloat16, pack=2),
        num_classes=C,
    )
    params = seg.init(jax.random.key(0), (8, 96, 96, 96, 1))
    infer = make_diffusion_inferer(seg, roi=(96, 96, 96), sw_batch_size=8,
                                   overlap=0.25)
    vol = jax.random.normal(jax.random.key(1), (*vol_shape, 1), jnp.float32)
    f = lambda p, v, r: infer(p, v, r)[0]
    dt = _time(f, params, vol, jax.random.key(2), n=2)
    print(json.dumps({"bench": "whole_volume_ddim10",
                      "volumes_per_min": round(60 / dt, 2),
                      "vol_shape": list(vol_shape),
                      "sec_per_volume": round(dt, 2)}))
    return 60 / dt


if __name__ == "__main__":
    # select benches by flag; default = all
    which = {a for a in sys.argv[1:] if a.startswith("--")} or {
        "--unet", "--train", "--volume", "--swin"}
    if "--unet" in which:
        bench_ddim(DiffUNet(out_channels=C, dtype=jnp.bfloat16, pack=2), 16,
                   tag="diff_unet")
    if "--train" in which:
        bench_train_step()
    if "--volume" in which:
        bench_whole_volume()
    if "--swin" in which:
        # pack-2 full-res conv blocks: BASELINE.md r3 36.3 steps/s config
        bench_ddim(
            DiffSwinUNETR(out_channels=C, image_size=(96, 96, 96), pack=2,
                          dtype=jnp.bfloat16), 8, tag="diff_swin_unetr",
        )
