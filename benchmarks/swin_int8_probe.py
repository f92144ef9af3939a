"""W8A8 int8 on the Swin ATTENTION path: does it pay? (VERDICT r3 ask #1b)

The r3 "Swin int8 = net loss" measurement quantized only the UNETR conv
blocks; this probe measures int8 where the Swin FLOPs actually live — the
qkv/proj/MLP dense layers (LayerNorm'd inputs, ideal for calibrated static
scales) — at the live stage-1 geometry in the post-r4 TRANSPOSED layout,
with the real fused attention kernel in the middle.

Variants (one shifted stage-1 block, (8, 48^3, 48) bf16, window 7^3):
  bf16        the shipped transposed block
  int8-dense  qkv/proj/fc1/fc2 as W8A8 (per-out-channel weight scales,
              static act scales), attention core bf16
Correctness: cosine correlation of outputs vs bf16.

Usage: python benchmarks/swin_int8_probe.py
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
    fused_window_attention_qkv,
)
from diff_unet_tpu.ops.swin import (  # noqa: E402
    _dense_t,
    _layer_norm_t,
    window_partition_t,
    window_region_ids,
    window_reverse_t,
    window_valid_mask,
)

DT = jnp.bfloat16
B, R, C, H = 8, 48, 48, 3
WS = (7, 7, 7)
SS = (3, 3, 3)
N = 343
NP = 384
RP = 49


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


def quant_w(k):
    """Per-output-channel symmetric int8 weight quantization."""
    s = jnp.max(jnp.abs(k), axis=0) / 127.0
    wq = jnp.round(k / s).astype(jnp.int8)
    return wq, s.astype(jnp.float32)


def dense_t_int8(x, wq, sw, sx, bias):
    """W8A8 einsum wcn,cd->wdn with a STATIC activation scale sx."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127)
    xq = xq.astype(jnp.int8)
    y = jnp.einsum("wcn,cd->wdn", xq, wq,
                   preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * sw)[:, None]
    return (y + bias[:, None]).astype(DT)


def main():
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, R, R, R, C), DT)
    ks = jax.random.split(key, 8)

    s1 = jnp.ones((C,), jnp.float32)
    b1 = jnp.zeros((C,), jnp.float32)
    k_qkv = jax.random.normal(ks[0], (C, 3 * C), DT) * 0.1
    b_qkv = jnp.zeros((3 * C,), jnp.float32)
    k_proj = jax.random.normal(ks[1], (C, C), DT) * 0.1
    b_proj = jnp.zeros((C,), jnp.float32)
    k_fc1 = jax.random.normal(ks[2], (C, 4 * C), DT) * 0.1
    b_fc1 = jnp.zeros((4 * C,), jnp.float32)
    k_fc2 = jax.random.normal(ks[3], (4 * C, C), DT) * 0.1
    b_fc2 = jnp.zeros((C,), jnp.float32)
    bias_attn = jax.random.normal(ks[4], (H, N, N), jnp.float32) * 0.1
    bias_p = jnp.pad(bias_attn, [(0, 0), (0, NP - N), (0, NP - N)])
    rids = window_region_ids((RP, RP, RP), WS, SS)
    vm = window_valid_mask((RP, RP, RP), (R, R, R), WS, SS, NP)
    vmj = jnp.asarray(vm)

    quants = {n_: quant_w(k) for n_, k in
              [("qkv", k_qkv), ("proj", k_proj), ("fc1", k_fc1),
               ("fc2", k_fc2)]}

    def block(a, mode):
        a = jnp.pad(a, [(0, 0), (0, 1), (0, 1), (0, 1), (0, 0)])
        a = jnp.roll(a, shift=(-3, -3, -3), axis=(1, 2, 3))
        wt = window_partition_t(a, WS, NP)
        h1 = _layer_norm_t(wt, s1, b1)
        h1 = (h1.reshape(B, -1, C, NP)
              * vmj[None, :, None, :].astype(h1.dtype)).reshape(-1, C, NP)
        # static act scales: LayerNorm'd / bounded inputs, ~5 sigma clip
        # (a production path would calibrate these like engine/quantize.py;
        # for a PERF probe the value only affects corr, not time)
        sx = 5.0 / 127
        if mode == "int8":
            qkvt = dense_t_int8(h1, *quants["qkv"], sx, b_qkv)
        else:
            qkvt = _dense_t(h1, k_qkv, b_qkv, DT)
        qkvt = qkvt.reshape(-1, 3, H, C // H, NP)
        o = fused_window_attention_qkv(qkvt, bias_p, N, rids,
                                       n_windows=rids.shape[0])
        o = o.reshape(-1, C, NP)
        if mode == "int8":
            o = dense_t_int8(o, *quants["proj"], sx, b_proj)
        else:
            o = _dense_t(o, k_proj, b_proj, DT)
        wt = wt + o
        y = _layer_norm_t(wt, s1, b1)
        if mode == "int8":
            y = dense_t_int8(y, *quants["fc1"], sx, b_fc1)
            y = jax.nn.gelu(y, approximate=False)
            y = dense_t_int8(y, *quants["fc2"], sx, b_fc2)
        else:
            y = _dense_t(y, k_fc1, b_fc1, DT)
            y = jax.nn.gelu(y, approximate=False)
            y = _dense_t(y, k_fc2, b_fc2, DT)
        wt = wt + y
        out = window_reverse_t(wt, WS, (B, RP, RP, RP))
        out = jnp.roll(out, shift=(3, 3, 3), axis=(1, 2, 3))
        return out[:, :R, :R, :R, :]

    out_bf = np.asarray(jax.jit(lambda a: block(a, "bf16"))(x),
                        np.float32)
    out_i8 = np.asarray(jax.jit(lambda a: block(a, "int8"))(x),
                        np.float32)
    corr = float(np.corrcoef(out_bf.ravel(), out_i8.ravel())[0, 1])
    print(f"output corr int8 vs bf16: {corr:.5f}", flush=True)

    dt_bf = chain_time(lambda a: block(a, "bf16"), (x,))
    print(f"stage1 shifted block  bf16       {dt_bf * 1e3:8.2f} ms",
          flush=True)
    dt_i8 = chain_time(lambda a: block(a, "int8"), (x,))
    print(f"stage1 shifted block  int8-dense {dt_i8 * 1e3:8.2f} ms "
          f"({dt_bf / dt_i8:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
