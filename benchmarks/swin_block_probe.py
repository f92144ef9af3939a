"""Per-segment timing of one stage-1 SwinTransformerBlock (v5e, sw=8).

Stage 1 dominates the DiffSwinUNETR backbone (70 ms of ~97 ms,
swin_breakdown --stages) yet its two fused attention cores account for only
~24 ms (attention_probe --s1). This probe times every other segment of the
block at the live geometry — (8, 48, 48, 48, 48) bf16, window 7^3 — to find
where the remaining time goes. Candidate taxes: C=48 pads to 128 lanes
(2.67x bytes on every elementwise/norm pass) and the window
partition/reverse relayouts whose 7-sized dims defeat (8, 128) tiling.

Usage: python benchmarks/swin_block_probe.py [--seg ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from flax import linen as nn  # noqa: E402

from diff_unet_tpu.ops.swin import (  # noqa: E402
    SwinMlp,
    window_partition,
    window_region_ids,
    window_reverse,
)

DT = jnp.bfloat16
B, R, C, H = 8, 48, 48, 3
WS = (7, 7, 7)
SS = (3, 3, 3)
N = 343
NP = 384
RP = 49          # padded spatial (48 -> 49 = 7*7)
BW = B * (RP // 7) ** 3


def chain_time(fn, args, n=8, reps=3):
    @jax.jit
    def run(c0, args):
        def body(i, c):
            perturbed = jax.tree_util.tree_map(
                lambda a: a + c.astype(a.dtype) * 0
                if jnp.issubdtype(a.dtype, jnp.floating) else a, args)
            out = fn(*perturbed)
            if isinstance(out, (tuple, list)):
                out = out[0]
            return c + jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, c0)

    _ = float(run(jnp.float32(0), args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(jnp.float32(0), args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def report(name, dt, nbytes):
    gbps = nbytes / dt / 1e9
    print(f"{name:44s} {dt * 1e3:8.2f} ms  {gbps:7.0f} GB/s(logical)",
          flush=True)


def main():
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, R, R, R, C), DT)
    xbytes = x.size * 2

    # 1. LayerNorm at (B, 48^3, 48)
    ln = nn.LayerNorm(epsilon=1e-5, dtype=DT)
    lnp = ln.init(key, x)
    report("LayerNorm (48^3, C=48)",
           chain_time(lambda a: ln.apply(lnp, a), (x,)), 2 * xbytes)

    # 2. pad 48->49 + roll + window partition (the pre-attention relayout)
    def pre(a):
        a = jnp.pad(a, [(0, 0), (0, 1), (0, 1), (0, 1), (0, 0)])
        a = jnp.roll(a, shift=(-3, -3, -3), axis=(1, 2, 3))
        return window_partition(a, WS)

    report("pad+roll+partition -> (2744, 343, 48)",
           chain_time(pre, (x,)), 2 * xbytes)

    # 3. partition alone (no pad/roll) at the padded size
    xp = jax.random.normal(key, (B, RP, RP, RP, C), DT)
    report("partition alone (49^3)",
           chain_time(lambda a: window_partition(a, WS), (xp,)),
           2 * xp.size * 2)

    # 4. qkv Dense on windows (2744, 343, 48) -> (.., 144)
    w = jax.random.normal(key, (BW, N, C), DT)
    dense = nn.Dense(3 * C, dtype=DT)
    dp = dense.init(key, w)
    report("qkv Dense 48->144 on (2744,343,48)",
           chain_time(lambda a: dense.apply(dp, a), (w,)),
           4 * w.size * 2)

    # 5. relayout qkv -> kernel layout (3, BW, H, Dh, N) + pad N->384
    qkv = jax.random.normal(key, (BW, N, 3 * C), DT)

    def relayout(a):
        t = jnp.transpose(a.reshape(BW, N, 3, H, C // H), (2, 0, 3, 4, 1))
        return jnp.pad(t, [(0, 0)] * 4 + [(0, NP - N)])

    report("qkv relayout -> (3,BW,H,16,384)",
           chain_time(relayout, (qkv,)), 2 * qkv.size * 2)

    # 6. kernel output relayout back (BW,H,16,384) -> (BW,343,48)
    ot = jax.random.normal(key, (BW, H, C // H, NP), DT)

    def back(a):
        o = jnp.transpose(a[..., :N], (0, 3, 1, 2))
        return o.reshape(BW, N, C)

    report("out relayout <- (BW,H,16,384)",
           chain_time(back, (ot,)), 2 * ot.size * 2)

    # 7. proj Dense 48->48
    densep = nn.Dense(C, dtype=DT)
    dpp = densep.init(key, w)
    report("proj Dense 48->48",
           chain_time(lambda a: densep.apply(dpp, a), (w,)), 2 * w.size * 2)

    # 8. reverse + unroll + crop
    def post(a):
        y = window_reverse(a, WS, (B, RP, RP, RP))
        y = jnp.roll(y, shift=(3, 3, 3), axis=(1, 2, 3))
        return y[:, :R, :R, :R, :]

    report("reverse+unroll+crop",
           chain_time(post, (w,)), 2 * w.size * 2)

    # 9. MLP (LN + fc1 48->192 + gelu + fc2 192->48) at (B,48^3,48)
    mlp = SwinMlp(C, dtype=DT)
    mp = mlp.init(key, x)
    report("MLP 48->192->48 (48^3)",
           chain_time(lambda a: mlp.apply(mp, a), (x,)), 10 * xbytes)

    # 10. residual add
    report("residual add",
           chain_time(lambda a, b_: a + b_, (x, x)), 3 * xbytes)


if __name__ == "__main__":
    main()
