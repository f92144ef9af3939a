"""Real-TPU parity check: transposed (BW, C, Np) block vs standard path.

Runs one shifted stage-1 SwinTransformerBlock at a reduced live geometry in
f32 and bf16, comparing the transposed path (with the real fused-qkv Pallas
kernel) against the standard XLA path. Complements the CPU interpret-mode
tests in tests/test_swin_transposed.py.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from diff_unet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diff_unet_tpu.ops.swin import (  # noqa: E402
    BasicLayer,
    SwinTransformerBlock,
    use_transposed_blocks,
)


def check(dt, tol):
    block = SwinTransformerBlock(dim=48, num_heads=3, window_size=(7, 7, 7),
                                 shift_size=(3, 3, 3), dtype=dt)
    x = jax.random.normal(jax.random.key(0), (2, 24, 24, 24, 48),
                          jnp.float32)
    with use_transposed_blocks(False):
        params = block.init(jax.random.key(1), x)
        want = np.asarray(jax.jit(block.apply)(params, x))
    with use_transposed_blocks(True):
        got = np.asarray(jax.jit(block.apply)(params, x))
    err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-6)
    status = "OK" if err < tol else "FAIL"
    print(f"{status} dtype={dt} rel_err={err:.2e} (tol {tol})", flush=True)
    return err < tol


def check_stage(dt, tol):
    """Depth-2 window-resident stage: exercises the real MXU shift kernel
    between the no-shift and shift blocks."""
    layer = BasicLayer(dim=48, depth=2, num_heads=3, window_size=(7, 7, 7),
                       downsample=False, dtype=dt)
    x = jax.random.normal(jax.random.key(2), (2, 24, 24, 24, 48),
                          jnp.float32)
    with use_transposed_blocks(False):
        params = layer.init(jax.random.key(1), x)
        want = np.asarray(jax.jit(layer.apply)(params, x))
    with use_transposed_blocks(True):
        got = np.asarray(jax.jit(layer.apply)(params, x))
    err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-6)
    status = "OK" if err < tol else "FAIL"
    print(f"{status} stage dtype={dt} rel_err={err:.2e} (tol {tol})",
          flush=True)
    return err < tol


def main():
    # f32 on TPU: both paths route matmuls through the MXU at default
    # precision (bf16 mantissa), but with different op groupings, so f32
    # parity is only ~1e-3 here; exact-math parity (2e-5) is pinned by the
    # CPU tests (tests/test_swin_transposed.py). With
    # jax.default_matmul_precision("highest") the f32 error drops back to
    # float-exact levels.
    with jax.default_matmul_precision("highest"):
        ok = check(jnp.float32, 1e-4)
        ok &= check_stage(jnp.float32, 1e-4)
    ok &= check(jnp.bfloat16, 3e-2)
    ok &= check_stage(jnp.bfloat16, 3e-2)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
