"""Can a Pallas kernel beat XLA's window-partition relayout? (v5e)

After the transposed-layout pass, stage-1's remaining wall is the
partition/reverse transposes (~8+6 ms per block for a 100 MB logical
tensor — ~30 GB/s effective; the permutation itself is bandwidth-trivial).
This probe measures a Pallas partition kernel that reads (1, 7, 49, 49, C)
spatial slabs (contiguous HBM extents) and emits the (49, C, Np) window
rows via in-VMEM rearranges, against the XLA transpose chain.

If Mosaic's in-register relayouts are fast, the same structure extends to
a fused partition+LN+qkv+attention mega-kernel; if not, this closes the
exploration with a measurement (the r3 pallas-conv pattern).

Usage: python benchmarks/pallas_partition_probe.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from diff_unet_tpu.ops.swin import window_partition_t  # noqa: E402

DT = jnp.bfloat16
B, RP, C = 8, 49, 48
WS = 7
G = RP // WS          # 7 windows per axis
N = WS ** 3           # 343
NP = 384
NW = G ** 3


def _kernel(x_ref, o_ref):
    """x_ref: (1, 7, 49, 49, C) d-slab; o_ref: (49, C, NP) window rows."""
    xb = x_ref[0]                                   # (7, 49, 49, C)
    xb = xb.reshape(WS, G, WS, G, WS, C)            # (td, nh, th, nw, tw, C)
    xb = xb.transpose(1, 3, 5, 0, 2, 4)             # (nh, nw, C, td, th, tw)
    xb = xb.reshape(G * G, C, N)
    o_ref[:] = jnp.pad(xb, [(0, 0), (0, 0), (0, NP - N)])


def pallas_partition_t(x):
    b = x.shape[0]
    grid = (b, G)
    in_spec = pl.BlockSpec((1, WS, RP, RP, C), lambda i, j: (i, j, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((G * G, C, NP), lambda i, j: (i * G + j, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b * NW, C, NP), x.dtype),
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_spec,
    )(x)


def chain_time(fn, args, n=8, reps=3):
    @jax.jit
    def run(c0, args):
        def body(i, c):
            perturbed = jax.tree_util.tree_map(
                lambda a: a + c.astype(a.dtype) * 0
                if jnp.issubdtype(a.dtype, jnp.floating) else a, args)
            out = fn(*perturbed)
            return c + jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, c0)

    _ = float(run(jnp.float32(0), args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(jnp.float32(0), args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    x = jax.random.normal(jax.random.key(0), (B, RP, RP, RP, C), DT)

    # parity first
    got = np.asarray(pallas_partition_t(x))
    want = np.asarray(window_partition_t(x, (WS, WS, WS), NP))
    np.testing.assert_allclose(got, want)
    print("parity ok", flush=True)

    nbytes = 2 * x.size * 2
    dt_x = chain_time(
        functools.partial(window_partition_t, ws=(WS, WS, WS), n_pad=NP),
        (x,))
    print(f"XLA partition_t     {dt_x * 1e3:8.2f} ms "
          f"{nbytes / dt_x / 1e9:6.0f} GB/s(logical)", flush=True)
    dt_p = chain_time(pallas_partition_t, (x,))
    print(f"Pallas partition_t  {dt_p * 1e3:8.2f} ms "
          f"{nbytes / dt_p / 1e9:6.0f} GB/s(logical)", flush=True)


if __name__ == "__main__":
    main()
