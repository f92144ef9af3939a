"""Stage-1 physics at the POST-SHIFT window-resident geometry (VERDICT r4
ask #3): per-segment decomposition of the shipped BasicLayer path —
partition once / per-block bodies / MXU shift hops / reverse once — at the
live stage-1 shape (8, 48^3, C=48, window 7^3, bf16, sw=8).

Segments:
  stage (depth=2)       the whole window-resident BasicLayer (no merge)
  partition_t           (B,49^3,48) -> (2744, 48, 384), one per stage
  reverse_t+roll+crop   the stage exit, one per stage
  shift hop (pallas)    ops/pallas_shift.py permutation-matmul kernel
  shift hop (xla ref)   reverse -> roll -> re-partition alternative
  block body no-shift   LN+qkv+attention+proj+MLP+residuals (window_ctx)
  block body shifted    same with region-id mask riding QK^T

The sum of segments vs the whole stage exposes what XLA fuses across
segment boundaries; the residual after subtracting blocks+hops+boundary
relayouts is the stage's remaining wall (compare BASELINE.md round-4
tables: r3 layout 60.05 ms, transposed 45.69 ms pre-shift-kernel).

Usage: python benchmarks/swin_stage_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax.numpy as jnp  # noqa: E402

from diff_unet_tpu.ops.pallas_shift import shift_windows_t  # noqa: E402
from diff_unet_tpu.ops.swin import (  # noqa: E402
    BasicLayer,
    SwinTransformerBlock,
    window_partition_t,
    window_region_ids,
    window_reverse_t,
    window_valid_mask,
)

DT = jnp.bfloat16
B, R, C, H = 8, 48, 48, 3
WS = (7, 7, 7)
SS = (3, 3, 3)
RP = 49
GRID = (7, 7, 7)
N = 343
NP = 384
BW = B * 343


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


def report(name, dt):
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, R, R, R, C), DT)
    wt = jax.random.normal(key, (BW, C, NP), DT)

    # whole stage (window-resident path auto-selected on TPU for C=48)
    layer = BasicLayer(dim=C, depth=2, num_heads=H, window_size=WS,
                       downsample=False, dtype=DT)
    lp = layer.init(jax.random.key(1), x)
    t_stage = report("stage depth=2 (window-resident)",
                     chain_time(lambda a: layer.apply(lp, a), (x,)))

    # stage boundary relayouts
    xp = jax.random.normal(key, (B, RP, RP, RP, C), DT)
    t_part = report("partition_t (49^3 -> 2744x48x384)",
                    chain_time(lambda a: window_partition_t(a, WS, NP),
                               (xp,)))

    def exit_(a):
        y = window_reverse_t(a, WS, (B, RP, RP, RP))
        y = jnp.roll(y, shift=SS, axis=(1, 2, 3))
        return y[:, :R, :R, :R, :]

    t_rev = report("reverse_t + roll + crop", chain_time(exit_, (wt,)))

    # shift hops
    t_hop = report("shift hop (pallas matmul)",
                   chain_time(lambda a: shift_windows_t(
                       a, WS, SS, GRID, B, use_pallas=True), (wt,)))
    report("shift hop (xla reverse/roll/partition)",
           chain_time(lambda a: shift_windows_t(
               a, WS, SS, GRID, B, use_pallas=False), (wt,)))

    # block bodies in window layout
    vm = window_valid_mask((RP, RP, RP), (R, R, R), WS, (0, 0, 0), NP)
    blk0 = SwinTransformerBlock(dim=C, num_heads=H, window_size=WS,
                                shift_size=(0, 0, 0), dtype=DT)
    ctx0 = {"region_ids": None, "vm": vm, "n": N, "b": B}
    bp0 = blk0.init(jax.random.key(2), wt, window_ctx=ctx0)
    t_b0 = report("block body no-shift",
                  chain_time(lambda a: blk0.apply(bp0, a, window_ctx=ctx0),
                             (wt,)))

    rids = window_region_ids((RP, RP, RP), WS, SS)
    vms = window_valid_mask((RP, RP, RP), (R, R, R), WS, SS, NP)
    blk1 = SwinTransformerBlock(dim=C, num_heads=H, window_size=WS,
                                shift_size=SS, dtype=DT)
    ctx1 = {"region_ids": rids, "vm": vms, "n": N, "b": B}
    bp1 = blk1.init(jax.random.key(3), wt, window_ctx=ctx1)
    t_b1 = report("block body shifted",
                  chain_time(lambda a: blk1.apply(bp1, a, window_ctx=ctx1),
                             (wt,)))

    # depth=2 runs ONE in-stage hop (no-shift block -> shifted block); the
    # return to the unshifted frame is the exit roll, already in t_rev
    seg_sum = t_part + t_rev + t_hop + t_b0 + t_b1
    print(f"{'sum(segments)':44s} {seg_sum * 1e3:8.2f} ms "
          f"(stage measured {t_stage * 1e3:.2f}; the gap is XLA fusing "
          f"across segment boundaries)", flush=True)


if __name__ == "__main__":
    main()
