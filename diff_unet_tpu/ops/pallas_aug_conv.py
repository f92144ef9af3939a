"""Pallas TPU kernel: 3x3x3 'same' conv on pack-2 tensors, aug-331 form.

The zero-waste formulation for C=64 levels (1.33x MACs — the structural
floor for 64->128 lane pairing, see BASELINE.md):

- For packed column k (voxels w = 2k, 2k+1) the 3-tap W support is the four
  voxels u[2k-1 .. 2k+2]. Build the augmented row aug[k] =
  (u[2k-1] | u[2k] | u[2k+1] | u[2k+2]) : 4C = 256 lanes, IN VMEM, by two
  sublane rolls + lane concat of the packed slab (edge columns zeroed).
- Per (dd, dh) tap one MXU dot (m, 4C) @ (4C, 2C) with the dense block
  weight [[w-1, 0], [w0, w-1], [w+1, w0], [0, w+1]] — outputs land aligned,
  no accumulator realignment (what cost the a/b-split kernel
  ops/pallas_packed_conv.py ~12%, probe r2).
- W is never sliced or padded: the slab DMA moves full Wp rows (sublane
  dim stays 8-aligned); D/H halos come from an XLA pre-pad of the input.

Measured context (v5e, chained timing): XLA's packed conv runs at the
chip's matmul ceiling (~157 TF/s raw = ~78 TF/s effective with its 2x
structural zeros); the same formulation as a pure-XLA (3,3,1,256,128) conv
ties it (~120 TF/s raw core).

MEASURED RESULT (r2): 25.2 ms at L0 (raw 83 TF/s, eff 62) vs XLA packed
20.0 ms — the in-VMEM aug build (two f32 rolls + masked concat over the
whole slab) is VPU-bound and costs more than the 0.67x MAC saving returns;
the a/b-split kernel (ops/pallas_packed_conv.py) reaches 117-133 raw with
the same conclusion. Both kernels are kept as documented exploration; the
production path stays on XLA's packed conv (ops/packed.py), which this
chip executes at its practical ceiling. See BASELINE.md round-2 roofline.

No reference analogue: the reference computes these convs with cuDNN via
torch Conv3d (models/basic_unet/denoiser.py:23-108); this decomposition is
TPU lane-geometry math.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def assemble_aug_kernel(w: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) DHWIO -> (3, 3, 4Cin, 2Cout) aug-331 blocks.

    Rows (u[2k-1], u[2k], u[2k+1], u[2k+2]); cols (o even | o odd):
    o_2k   = w-1 u[2k-1] + w0 u[2k]   + w+1 u[2k+1]
    o_2k+1 = w-1 u[2k]   + w0 u[2k+1] + w+1 u[2k+2]
    """
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3), w.shape
    if dtype is not None:
        w = w.astype(dtype)
    z = jnp.zeros((3, 3, cin, cout), w.dtype)
    wm, w0, wp1 = w[:, :, 0], w[:, :, 1], w[:, :, 2]
    return jnp.concatenate([
        jnp.concatenate([wm, z], -1),
        jnp.concatenate([w0, wm], -1),
        jnp.concatenate([wp1, w0], -1),
        jnp.concatenate([z, wp1], -1),
    ], axis=2)                                       # (3, 3, 4Cin, 2Cout)


def conv3x3_aug(
    x_p: jnp.ndarray,                    # packed (N, D, H, Wp, 2Cin)
    w: jnp.ndarray,                      # ORIGINAL (3, 3, 3, Cin, Cout)
    b: Optional[jnp.ndarray] = None,     # (Cout,) or None
    *,
    dtype=None,
    block_d: int = 8,
    block_h: int = 8,
    negative_slope: Optional[float] = None,   # fused LeakyReLU epilogue
    interpret: bool = False,
) -> jnp.ndarray:
    """'SAME' 3x3x3 conv on a pack-2 input; returns (N, D, H, Wp, 2*Cout).

    Bias and an optional LeakyReLU fuse into the accumulator epilogue.
    """
    n, d, h, wp, k2 = x_p.shape
    cin, cout = w.shape[3], w.shape[4]
    assert k2 == 2 * cin, (x_p.shape, w.shape)
    assert wp % 8 == 0, f"Wp={wp} must be sublane-aligned"

    cdt = dtype or x_p.dtype
    xpad = jnp.pad(x_p.astype(cdt),
                   ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    wk = assemble_aug_kernel(w, dtype=cdt)           # (3, 3, 4Cin, 2Cout)
    n2 = 2 * cout
    k4 = 4 * cin
    bias2 = None if b is None else jnp.tile(b, 2).astype(
        jnp.float32).reshape(1, n2)

    bd = block_d
    while d % bd:
        bd //= 2
    bh = block_h
    while h % bh:
        bh //= 2
    m = bh * wp

    def body(x_hbm, w_ref, b_ref, o_ref, slab, aug, sem):
        ni, di, hi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        cp = pltpu.make_async_copy(
            x_hbm.at[ni, pl.ds(di * bd, bd + 2), pl.ds(hi * bh, bh + 2)],
            slab, sem)
        cp.start()
        cp.wait()

        # Build the augmented slab once per cell: lane concat of
        # (po shifted +1 | pf | po | pf shifted -1), edge columns zeroed.
        pf = slab[:, :, :, :cin]
        po = slab[:, :, :, cin:]
        col = jax.lax.broadcasted_iota(jnp.int32, (bd + 2, bh + 2, wp, cin),
                                       2)
        # Mosaic only rotates 32-bit data; the two per-slab rolls go through
        # f32 (copy cost is negligible next to the 9 MXU dots per row).
        prev_o = pltpu.roll(po.astype(jnp.float32), 1, 2).astype(po.dtype)
        prev_o = jnp.where(col == 0, jnp.zeros_like(prev_o), prev_o)
        next_f = pltpu.roll(pf.astype(jnp.float32), wp - 1, 2).astype(
            pf.dtype)
        next_f = jnp.where(col == wp - 1, jnp.zeros_like(next_f), next_f)
        aug[...] = jnp.concatenate([prev_o, pf, po, next_f], axis=-1)

        def od_body(od, _):
            acc = jnp.zeros((m, n2), jnp.float32)
            for dd in range(3):
                for dh in range(3):
                    lhs = aug[od + dd, pl.ds(dh, bh)].reshape(m, k4)
                    acc = acc + jax.lax.dot_general(
                        lhs, w_ref[dd, dh],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            y = acc
            if b_ref is not None:
                y = y + b_ref[:]
            if negative_slope is not None:
                y = jnp.where(y >= 0, y, y * negative_slope)
            o_ref[0, od] = y.reshape(bh, wp, n2).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, bd, od_body, 0)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [xpad, wk]
    if bias2 is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(bias2)

        def kfn(x_hbm, w_ref, b_ref, o_ref, slab, aug, sem):
            body(x_hbm, w_ref, b_ref, o_ref, slab, aug, sem)
    else:
        def kfn(x_hbm, w_ref, o_ref, slab, aug, sem):
            body(x_hbm, w_ref, None, o_ref, slab, aug, sem)

    return pl.pallas_call(
        kfn,
        out_shape=jax.ShapeDtypeStruct((n, d, h, wp, n2), cdt),
        grid=(n, d // bd, h // bh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, bd, bh, wp, n2),
            lambda ni, di, hi: (ni, di, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((bd + 2, bh + 2, wp, k2), cdt),
            pltpu.VMEM((bd + 2, bh + 2, wp, k4), cdt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)
