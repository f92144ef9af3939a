"""Roofline calibration: chained-op rates with no dispatch overhead.

The axon relay costs ~1.5-2 ms per dispatch+host-read round trip, which
poisons naive per-call microbenchmarks; every rate here is timed as a
`lax.fori_loop` chain inside ONE jit. Reference numbers (v5e, r2) live in
BASELINE.md "Round-2 roofline calibration".

Run: python benchmarks/roofline.py
"""
import time, json, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

def timeit_q(fn, *a, iters=5):
    out = fn(*a); _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    out = fn(*a); _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters

k = jax.random.key(0)
res = {}
R = 10  # chain length inside one jit

# (a) chained big matmul
n = 8192
a = jax.random.normal(k, (n, n), jnp.bfloat16)
b = jax.random.normal(k, (n, n), jnp.bfloat16) * 0.01
@jax.jit
def mmchain(a, b):
    def body(i, x):
        return jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16) * 0.01
    return jax.lax.fori_loop(0, R, body, a)
t = timeit_q(mmchain, a, b)
res["mm8192_chain_tf"] = round(2 * n**3 * R / t / 1e12, 1)

# (b) chained packed conv at L0 shape (C=128 dense <- pack2 of C=64)
x = jax.random.normal(k, (8, 96, 96, 48, 128), jnp.bfloat16)
w = jax.random.normal(k, (3, 3, 3, 128, 128), jnp.bfloat16) * 0.01
@jax.jit
def convchain(x, w):
    def body(i, h):
        return jax.lax.conv_general_dilated(
            h, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16) * 0.1
    return jax.lax.fori_loop(0, R, body, x)
t = timeit_q(convchain, x, w)
flops = 2 * 27 * 128 * 128 * 8 * 96 * 96 * 48 * R
res["conv_l0p_chain_ms"] = round(t / R * 1e3, 2)
res["conv_l0p_chain_tf"] = round(flops / t / 1e12, 1)

# (c) chained instance-norm + leaky-relu at L0 shape
from diff_unet_tpu.ops.blocks import InstanceNorm
import flax.linen as nn
mod = InstanceNorm(dtype=jnp.bfloat16)
p = mod.init(k, x)
@jax.jit
def normchain(x):
    def body(i, h):
        h = mod.apply(p, h)
        return nn.leaky_relu(h, 0.1)
    return jax.lax.fori_loop(0, R, body, x)
t = timeit_q(normchain, x)
res["in_lrelu_l0_ms"] = round(t / R * 1e3, 3)

# (d) packed maxpool at L0
from diff_unet_tpu.ops import packed as pk
@jax.jit
def poolchain(x):
    def body(i, h):
        o = pk.packed_maxpool2(h, 2)         # (8,48,48,24,128)
        return jnp.pad(o, [(0,0),(0,48),(0,48),(0,24),(0,0)])  # keep shape
    return jax.lax.fori_loop(0, R, body, x)
t = timeit_q(poolchain, x)
res["pool_l0_ms"] = round(t / R * 1e3, 3)
print(json.dumps(res))
