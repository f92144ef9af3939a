"""Transposed window layout (BW, C, N) probe at the stage-1 geometry (v5e).

swin_block_probe showed every non-attention segment of a stage-1 Swin block
bandwidth-bound at 22-112 GB/s physical: the (.., C=48) trailing dim pads to
128 lanes (2.67x bytes) and the window relayouts move those padded bytes
repeatedly. This probe measures the same segments in the TRANSPOSED window
layout (BW, C, N=343->384): tokens in lanes (1.12x pad), channels in
sublanes (48 = 6 full sublane tiles) — the layout the fused Pallas
attention kernel is already native in, so the qkv/out relayouts vanish.

Segments:
  LN_t       LayerNorm over the sublane (C) axis
  qkv_t      einsum wcn,cd->wdn 48->144
  proj_t     48->48
  mlp_t      LN + fc1(48->192) + gelu + fc2(192->48)
  part_t     pad+roll+partition straight into (BW, C, N)
  rev_t      (BW, C, N) -> unroll+crop -> spatial
  resid_t    residual add
  block_t    the full non-attention block pipeline chained

Usage: python benchmarks/swin_t_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax.numpy as jnp  # noqa: E402

DT = jnp.bfloat16
B, R, C, H = 8, 48, 48, 3
WS = 7
SS = 3
N = WS ** 3              # 343
NP = 384                 # N padded to lanes
RP = 49                  # padded spatial (48 -> 49 = 7*7)
NW = (RP // WS) ** 3     # 343 windows
BW = B * NW


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


def partition_t(x):
    """(B, D, H, W, C) -> pad -> roll -> (B*nW, C, N) -> pad N->NP."""
    x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 1), (0, 0)])
    x = jnp.roll(x, shift=(-SS, -SS, -SS), axis=(1, 2, 3))
    b = x.shape[0]
    x = x.reshape(b, RP // WS, WS, RP // WS, WS, RP // WS, WS, C)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)           # (b,nd,nh,nw,C,7,7,7)
    x = x.reshape(-1, C, N)
    return jnp.pad(x, [(0, 0), (0, 0), (0, NP - N)])


def reverse_t(w):
    """(B*nW, C, NP) -> spatial (B, R, R, R, C) (unroll + crop)."""
    g = RP // WS
    x = w[..., :N].reshape(B, g, g, g, C, WS, WS, WS)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)           # (B,g,7,g,7,g,7,C)
    x = x.reshape(B, RP, RP, RP, C)
    x = jnp.roll(x, shift=(SS, SS, SS), axis=(1, 2, 3))
    return x[:, :R, :R, :R, :]


def ln_t(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-2, keepdims=True)
    var = jnp.var(xf, axis=-2, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale[:, None] + bias[:, None]).astype(x.dtype)


def dense_t(x, kernel, bias):
    y = jnp.einsum("wcn,cd->wdn", x, kernel.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y + bias.astype(jnp.float32)[:, None]).astype(x.dtype)


def main():
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, R, R, R, C), DT)
    xbytes = x.size * 2
    w = jax.random.normal(key, (BW, C, NP), DT)
    wbytes = w.size * 2

    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    k_qkv = jax.random.normal(key, (C, 3 * C), DT) * 0.05
    b_qkv = jnp.zeros((3 * C,), DT)
    k_proj = jax.random.normal(key, (C, C), DT) * 0.05
    b_proj = jnp.zeros((C,), DT)
    k_fc1 = jax.random.normal(key, (C, 4 * C), DT) * 0.05
    b_fc1 = jnp.zeros((4 * C,), DT)
    k_fc2 = jax.random.normal(key, (4 * C, C), DT) * 0.05
    b_fc2 = jnp.zeros((C,), DT)

    report("part_t: pad+roll+partition -> (2744,48,384)",
           chain_time(partition_t, (x,)), 2 * xbytes)
    report("rev_t: (2744,48,384) -> spatial",
           chain_time(reverse_t, (w,)), 2 * wbytes)
    report("LN_t over C (sublane axis)",
           chain_time(lambda a: ln_t(a, scale, bias), (w,)), 2 * wbytes)
    report("qkv_t einsum 48->144",
           chain_time(lambda a: dense_t(a, k_qkv, b_qkv), (w,)), 4 * wbytes)
    report("proj_t einsum 48->48",
           chain_time(lambda a: dense_t(a, k_proj, b_proj), (w,)),
           2 * wbytes)

    def mlp_t(a):
        h = ln_t(a, scale, bias)
        h = dense_t(h, k_fc1, b_fc1)
        h = jax.nn.gelu(h, approximate=False)
        return dense_t(h, k_fc2, b_fc2)

    report("mlp_t: LN+fc1+gelu+fc2", chain_time(mlp_t, (w,)), 10 * wbytes)
    report("residual add", chain_time(lambda a, b_: a + b_, (w, w)),
           3 * wbytes)

    # the full non-attention pipeline: everything a block does outside the
    # fused attention kernel, chained (partition -> LN -> qkv | proj ->
    # residual -> MLP -> residual -> reverse)
    def block_t(a):
        shortcut = partition_t(a)
        h = ln_t(shortcut, scale, bias)
        qkv = dense_t(h, k_qkv, b_qkv)
        attn_out = qkv[:, :C]        # stand-in for the fused kernel output
        o = dense_t(attn_out, k_proj, b_proj)
        h2 = shortcut + o
        y = mlp_t(h2)
        return reverse_t(h2 + y)

    report("block_t (all non-attn segments chained)",
           chain_time(block_t, (x,)), 2 * xbytes)


if __name__ == "__main__":
    main()
