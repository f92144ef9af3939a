"""Window-attention core: XLA einsum path vs fused Pallas kernel (v5e).

Times ONLY the attention core (qk^T + bias + shift mask + softmax + pv) at
the four DiffSwinUNETR stage geometries of a 96^3 volume with window batch
sw=8 — the inputs the WindowAttention module hands each path after its qkv
projection. Drives VERDICT r3 ask #1 (rebuild + re-measure the kernel at
the real post-r3 stage shapes).

Geometries (window 7^3 -> N=343 padded to 384; stage 4 clamps to 6^3):
  stage1: BW=2744 H=3   stage2: BW=512 H=6   stage3: BW=64 H=12
  stage4: BW=8   H=24 N=216->256 (no shift: window == dims)

Usage: python benchmarks/attention_probe.py [--s1 --s2 --s3 --s4]
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

from diff_unet_tpu.ops.pallas_attention import (  # noqa: E402
    _dense_mask,
    fused_window_attention,
    reference_window_attention,
)
from diff_unet_tpu.ops.swin import window_region_ids  # noqa: E402

DT = jnp.bfloat16
DH = 16

STAGES = {
    # xla_chunk: the XLA path materialises (BW, H, N, N) f32 scores — the
    # full stage-1 window batch (4.9 GB x several temporaries) exceeds HBM,
    # so XLA is timed at bw/xla_chunk and scaled (windows are independent;
    # linear scaling slightly flatters XLA if anything)
    "--s1": dict(bw=2744, h=3, dims=(49, 49, 49), ws=(7, 7, 7),
                 ss=(3, 3, 3), xla_chunk=4),
    "--s2": dict(bw=512, h=6, dims=(28, 28, 28), ws=(7, 7, 7), ss=(3, 3, 3)),
    "--s3": dict(bw=64, h=12, dims=(14, 14, 14), ws=(7, 7, 7), ss=(3, 3, 3)),
    "--s4": dict(bw=8, h=24, dims=(6, 6, 6), ws=(6, 6, 6), ss=None),
}


def chain_time(fn, args, consts=(), n=8, reps=3):
    # args/consts are REAL jit parameters: closed-over arrays are baked
    # into the HLO as constants and a stage-1 q/k/v (300 MB) or dense mask
    # (161 MB) exceeds the axon relay's compile-request size limit
    # (HTTP 413). Only `args` get the CSE-defeating perturbation.
    @jax.jit
    def run(c0, args, consts):
        def body(i, c):
            perturbed = jax.tree_util.tree_map(
                lambda a: a + c.astype(a.dtype) * 0
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                args,
            )
            out = fn(*perturbed, *consts)
            return c + jnp.mean(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, c0)

    _ = float(run(jnp.float32(0), args, consts))
    best = float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(run(jnp.float32(0), args, consts))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def run_stage(tag, bw, h, dims, ws, ss, xla_chunk=1):
    nv = int(np.prod(ws))
    n = -(-nv // 128) * 128
    ks = jax.random.split(jax.random.key(1), 4)
    q = jax.random.normal(ks[0], (bw, h, n, DH), DT)
    k = jax.random.normal(ks[1], (bw, h, n, DH), DT)
    v = jax.random.normal(ks[2], (bw, h, n, DH), DT)
    v = v.at[:, :, nv:].set(0.0)
    bias = jax.random.normal(ks[3], (h, n, n), jnp.float32) * 0.1
    ids = None
    nw = 1
    if ss is not None:
        ids = window_region_ids(dims, ws, ss)      # (nW, nv)
        nw = ids.shape[0]

    # correctness first (one shot on a window slice, bf16 tolerance; the
    # full stage-1 reference would not fit HBM)
    bc = min(bw, 64)
    got = jax.jit(
        lambda *a: fused_window_attention(
            *a, n_valid=nv, region_ids=ids, n_windows=nw)
    )(q[:bc], k[:bc], v[:bc], bias)
    want = reference_window_attention(
        q[:bc], k[:bc], v[:bc], bias, nv,
        _dense_mask(ids) if ids is not None else None, n_windows=nw)
    d = np.abs(np.asarray(got[:, :, :nv], np.float32)
               - np.asarray(want[:, :, :nv], np.float32)).max()

    bwx = bw // xla_chunk
    xla_consts = (bias,) if ids is None else (bias, _dense_mask(ids))
    dt_x = xla_chunk * chain_time(
        lambda q_, k_, v_, b_, *m_: reference_window_attention(
            q_, k_, v_, b_, nv, m_[0] if m_ else None, n_windows=nw),
        (q[:bwx], k[:bwx], v[:bwx]), xla_consts)
    dt_p = chain_time(
        lambda q_, k_, v_, b_: fused_window_attention(
            q_, k_, v_, b_, nv, region_ids=ids, n_windows=nw),
        (q, k, v), (bias,))
    print(f"{tag} bw={bw} h={h} n={nv}->{n} shift={ss is not None} "
          f"maxdiff={d:.4f}  xla={dt_x * 1e3:7.2f} ms  "
          f"pallas={dt_p * 1e3:7.2f} ms  ({dt_x / dt_p:4.1f}x)", flush=True)


def main():
    which = [a for a in sys.argv[1:] if a in STAGES] or list(STAGES)
    print(f"window attention core, sw=8 geometries, {jax.devices()[0]}",
          flush=True)
    for tag in which:
        run_stage(tag, **STAGES[tag])


if __name__ == "__main__":
    main()
