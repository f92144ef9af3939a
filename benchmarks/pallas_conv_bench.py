"""Pallas packed-aug conv vs XLA packed conv at the DiffUNet L0/L1 shapes.

Chained-op timing (lax.fori_loop inside one jit) per BASELINE.md's roofline
methodology — the axon relay's ~2 ms dispatch cost poisons per-call timing.

Variants:
  xla        — pk.packed_conv (2x-MAC structural zeros, XLA conv at the
               chip's matmul ceiling; the r2 measured reference: 20.0 ms @L0)
  aug        — conv3x3_packed_aug (1.33x MACs, unpipelined DMA; lost in r2)
  pipe       — conv3x3_packed_aug_pipelined (double-buffered slab DMA)
  pipe+fuse  — pipelined with the prologue (norm-apply+lrelu+FiLM) and the
               stats epilogue, pricing the fully fused ConvNormAct

Run: python benchmarks/pallas_conv_bench.py [sw_batch]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

from diff_unet_tpu.ops import packed as pk  # noqa: E402
from diff_unet_tpu.ops.pallas_packed_conv import (  # noqa: E402
    conv3x3_packed_aug,
    conv3x3_packed_aug_pipelined,
    prologue_pad_value,
)

R = 10


def timeit_q(fn, *a, iters=3):
    out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def bench_shape(n, dd, hh, wp, cin, cout, bd=8, bh=8):
    key = jax.random.key(0)
    x = jax.random.normal(key, (n, dd, hh, wp, 2 * cin), jnp.bfloat16)
    w = (jax.random.normal(key, (3, 3, 3, cin, cout), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)
    b = jnp.zeros((cout,), jnp.bfloat16)
    ps = jnp.ones((2 * cin,), jnp.float32) * 1.01
    pb = jnp.zeros((2 * cin,), jnp.float32)
    flops = 2 * 27 * cin * cout * n * dd * hh * (2 * wp) * R
    res = {}

    def run(name, step):
        if cout == cin:
            @jax.jit
            def chain(x):
                def body(i, h):
                    return (step(h) * 0.1).astype(jnp.bfloat16)
                return jax.lax.fori_loop(0, R, body, x)
        else:
            # not shape-chainable: thread a scalar through the input so the
            # conv cannot be hoisted out of the loop
            @jax.jit
            def chain(x):
                def body(i, c):
                    return jnp.mean(step(x + (c * 1e-6).astype(x.dtype)),
                                    dtype=jnp.float32)
                return jax.lax.fori_loop(0, R, body, jnp.float32(0))
        try:
            t = timeit_q(chain, x)
            res[name + "_ms"] = round(t / R * 1e3, 2)
            res[name + "_eff_tf"] = round(flops / t / 1e12, 1)
        except Exception as e:  # OOM / lowering failure: record, continue
            res[name + "_error"] = type(e).__name__ + ": " + str(e)[:120]

    run("xla", lambda h: pk.packed_conv(h, w, b, 2))
    if cout == cin:   # chainable shapes only
        run("pipe_taps", lambda h: conv3x3_packed_aug_pipelined(
            h, w, b, block_d=bd, block_h=bh, inner="taps"))
        run("im2col2", lambda h: conv3x3_packed_aug_pipelined(
            h, w, b, block_d=bd, block_h=bh, rows_per_dot=2))
        run("im2col4", lambda h: conv3x3_packed_aug_pipelined(
            h, w, b, block_d=bd, block_h=bh, rows_per_dot=4))
        run("im2col2_bh16", lambda h: conv3x3_packed_aug_pipelined(
            h, w, b, block_d=bd, block_h=16, rows_per_dot=2))

        pv = prologue_pad_value(ps, pb, negative_slope=0.1)

        def fused(h):
            y, stats = conv3x3_packed_aug_pipelined(
                h, w, b, block_d=bd, block_h=bh,
                prologue_scale=ps, prologue_bias=pb,
                prologue_negative_slope=0.1, pad_value=pv,
                with_stats=True)
            return y
        run("im2col2_fuse", fused)
    return res


def main():
    sw = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = {}
    # L0: 96^3 pack-2, C64->C64 (conv_1 of the stem / upcat_1 second conv)
    out["L0_c64"] = bench_shape(sw, 96, 96, 48, 64, 64)
    # L1: 48^3 pack-2, C64->C64
    out["L1_c64"] = bench_shape(sw, 48, 48, 24, 64, 64)
    # L0 upcat first conv: C128 -> C64 (XLA only: not chainable)
    out["L0_c128_to_c64"] = bench_shape(sw, 96, 96, 48, 128, 64)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
