"""Decompose the Pallas packed-conv kernel's time at the L0 shape.

Probes (numerics intentionally wrong where noted; perf attribution only):
  im2col2          — full kernel (baseline)
  noepi            — skip the realign/bias/act epilogue (probe)
  nostore          — skip the im2col gather stores (probe)
  slice            — b-half realignment by sublane slice instead of roll
  taps_slice       — taps inner with slice realignment

Also prints the FULL error for the fused (prologue+stats) compile failure.
Run: python benchmarks/pallas_conv_probe.py
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

from diff_unet_tpu.ops import packed as pk  # noqa: E402
from diff_unet_tpu.ops.pallas_packed_conv import (  # noqa: E402
    conv3x3_packed_aug_pipelined,
    prologue_pad_value,
)

R = 10
N, D, H, WP, CIN, COUT = 8, 96, 96, 48, 64, 64

key = jax.random.key(0)
x = jax.random.normal(key, (N, D, H, WP, 2 * CIN), jnp.bfloat16)
w = (jax.random.normal(key, (3, 3, 3, CIN, COUT)) * 0.05).astype(jnp.bfloat16)
b = jnp.zeros((COUT,), jnp.bfloat16)


def timeit(step):
    @jax.jit
    def chain(x):
        def body(i, h):
            return (step(h) * 0.1).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, R, body, x)
    out = chain(x)
    _ = float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(3):
        out = chain(x)
        _ = float(out.ravel()[0])
    return (time.perf_counter() - t0) / 3 / R * 1e3


def report(name, **kw):
    try:
        print(f"{name}: {timeit(lambda h: conv3x3_packed_aug_pipelined(h, w, b, **kw)):.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


print(f"xla: {timeit(lambda h: pk.packed_conv(h, w, b, 2)):.2f} ms",
      flush=True)
report("im2col2")
report("noepi", _probe="noepi")
report("nostore", _probe="nostore")
report("slice", realign="slice")
report("taps_slice", inner="taps", realign="slice")

# fused: print the full compile error if it still fails
ps = jnp.ones((2 * CIN,), jnp.float32) * 1.01
pb = jnp.zeros((2 * CIN,), jnp.float32)
pv = prologue_pad_value(ps, pb, negative_slope=0.1)
try:
    def fused(h):
        y, st = conv3x3_packed_aug_pipelined(
            h, w, b, prologue_scale=ps, prologue_bias=pb,
            prologue_negative_slope=0.1, pad_value=pv, with_stats=True)
        return y
    t = timeit(fused)
    print(f"fused: {t:.2f} ms", flush=True)
except Exception:
    print("fused FAILED:", flush=True)
    traceback.print_exc()
