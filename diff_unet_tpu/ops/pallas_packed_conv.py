"""Pallas TPU kernel: 3x3x3 'same' conv on pack-2 tensors via implicit GEMM.

Motivation (measured, v5e, BASELINE.md): the two C=64 pyramid levels hold
~82% of the DiffUNet denoiser FLOPs. XLA-native options either pad lanes
(C=64 -> ~53 TF/s effective) or execute the pack-2 kernel with 50%
structural zeros (2x MACs at ~150 TF/s raw = ~74 TF/s effective,
ops/packed.py). This kernel cuts the structural waste:

- Pack-2 output column k holds voxels w = 2k, 2k+1, whose 3-tap W support
  is u[2k-1 .. 2k+2] = a[k] ++ a[k+1], where a[j] = (u[2j-1], u[2j]) are
  the columns of the W-halo-padded input xpad (N, D+2, H+2, Wpad, 2Cin).
- Per (dd, dh) tap the kernel runs ONE MXU dot with K = 2Cin and
  N = 4Cout: the output's left half is the a[k] contribution (weights
  6/8 dense), the right half the a[k+1] contribution (2/8 dense),
  realigned by a single f32 `pltpu.roll` of the accumulator per output
  row — the only data movement besides one HBM DMA per (BD, BH) cell.
  No unaligned slices, no per-tap rolls (what sank ops/pallas_conv.py).
- MAC count = 9 * (BH*Wpad) * 2Cin * 4Cout per output row-block
  ~= 1.33x * (Wpad/Wp) the original conv MACs, vs 2x for the XLA
  packed path.

No reference analogue: the reference computes these convs with cuDNN via
torch Conv3d (models/basic_unet/denoiser.py:23-108); this decomposition is
TPU lane-geometry math.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diff_unet_tpu.ops import packed as pk


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def assemble_ab_kernel(w: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Original (3, 3, 3, Cin, Cout) DHWIO weights -> (3, 3, 2Cin, 4Cout).

    Output columns are [a-contribution (2Cout) | a+1-contribution (2Cout)],
    each split into (o=0 | o=1) blocks; rows are (u[2k-1], u[2k]).
    Entry = w[dd, dh, w_in - w_out + 1] when |w_in - w_out| <= 1 else 0.

    a[k] rows feed out col k:   u[2k-1]->o0 via kw=-1; u[2k]->o0 via kw=0,
                                u[2k]->o1 via kw=-1.
    a[k+1] rows feed out col k: u[2k+1]->o0 via kw=+1, ->o1 via kw=0;
                                u[2k+2]->o1 via kw=+1.
    """
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3), w.shape
    if dtype is not None:
        w = w.astype(dtype)
    z = jnp.zeros((3, 3, cin, cout), w.dtype)
    wa = jnp.concatenate([
        jnp.concatenate([w[:, :, 0], z], -1),           # u[2k-1]
        jnp.concatenate([w[:, :, 1], w[:, :, 0]], -1),  # u[2k]
    ], axis=2)                                          # (3,3,2Cin,2Cout)
    wb = jnp.concatenate([
        jnp.concatenate([w[:, :, 2], w[:, :, 1]], -1),  # u[2k+1]
        jnp.concatenate([z, w[:, :, 2]], -1),           # u[2k+2]
    ], axis=2)
    return jnp.concatenate([wa, wb], axis=3)            # (3,3,2Cin,4Cout)


def build_padded_input(parts: Sequence[jnp.ndarray], wpad: int,
                       dtype=None) -> jnp.ndarray:
    """Packed parts [(N,D,H,Wp,2Ci)] -> halo-padded (N,D+2,H+2,Wpad,2Cin).

    Column j of the result is a[j] = (u[2j-1], u[2j]) of the logical
    unpacked concat u; columns beyond (Wp+1) are zero (DMA tile alignment).
    XLA fuses unpack+concat+pad+repack into a single copy.
    """
    cols = [pk.unpack_w(p, 2) for p in parts]
    u = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=-1)
    if dtype is not None:
        u = u.astype(dtype)
    n, d, h, w, c = u.shape
    up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (1, 2 * wpad - w - 1), (0, 0)))
    return up.reshape(n, d + 2, h + 2, wpad, 2 * c)


def conv3x3_packed_aug(
    parts: Union[jnp.ndarray, Sequence[jnp.ndarray]],
    w: jnp.ndarray,                      # ORIGINAL (3,3,3, Cin, Cout)
    b: Optional[jnp.ndarray] = None,     # (Cout,) or None
    *,
    dtype=None,
    block_d: int = 8,
    block_h: int = 8,
    negative_slope: Optional[float] = None,   # fused LeakyReLU epilogue
    interpret: bool = False,
) -> jnp.ndarray:
    """'SAME' 3x3x3 conv on pack-2 input(s); returns (N, D, H, Wp, 2*Cout).

    `parts` is one packed tensor or a list of packed tensors whose logical
    concat (in order) forms the conv input — the packed-space analogue of
    torch.cat before Conv3d. Bias and an optional LeakyReLU are fused into
    the accumulator epilogue.
    """
    parts = list(parts) if isinstance(parts, (list, tuple)) else [parts]
    n, d, h, wp = parts[0].shape[:4]
    cin, cout = w.shape[3], w.shape[4]
    assert sum(p.shape[-1] for p in parts) == 2 * cin, (
        [p.shape for p in parts], w.shape)

    cdt = dtype or parts[0].dtype
    wpad = _round_up(wp + 1, 8)
    xpad = build_padded_input(parts, wpad, dtype=cdt)  # (N,D+2,H+2,Wpad,K2)
    wab = assemble_ab_kernel(w, dtype=cdt)             # (3,3,K2,4Cout)
    k2 = 2 * cin
    n2 = 2 * cout
    bias2 = None if b is None else jnp.tile(b, 2).astype(
        jnp.float32).reshape(1, 2 * cout)

    bd = block_d
    while d % bd:
        bd //= 2
    bh = block_h
    while h % bh:
        bh //= 2
    m = bh * wpad

    def body_fn(ni, di, hi, x_hbm, w_ref, b_ref, o_ref, slab, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[ni, pl.ds(di * bd, bd + 2), pl.ds(hi * bh, bh + 2)],
            slab, sem,
        )
        dma.start()
        dma.wait()

        def od_body(od, _):
            acc = jnp.zeros((m, 2 * n2), jnp.float32)
            for dd in range(3):
                for dh in range(3):
                    lhs = slab[od + dd, pl.ds(dh, bh)].reshape(m, k2)
                    acc = acc + jax.lax.dot_general(
                        lhs, w_ref[dd, dh],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            p = acc.reshape(bh, wpad, 2 * n2)
            pa = p[:, :, :n2]
            # a[k+1] contribution: roll one column left, then keep 0..wp-1
            pb = pltpu.roll(p[:, :, n2:], wpad - 1, 1)
            y = (pa + pb)[:, :wp, :]
            if b_ref is not None:
                y = y + b_ref[:]
            if negative_slope is not None:
                y = jnp.where(y >= 0, y, y * negative_slope)
            o_ref[0, od] = y.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, bd, od_body, 0)

    grid = (n, d // bd, h // bh)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [xpad, wab]
    scratch = [
        pltpu.VMEM((bd + 2, bh + 2, wpad, k2), cdt),
        pltpu.SemaphoreType.DMA,
    ]
    if bias2 is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(bias2)

        def kfn(x_hbm, w_ref, b_ref, o_ref, slab, sem):
            body_fn(pl.program_id(0), pl.program_id(1), pl.program_id(2),
                    x_hbm, w_ref, b_ref, o_ref, slab, sem)
    else:
        def kfn(x_hbm, w_ref, o_ref, slab, sem):
            body_fn(pl.program_id(0), pl.program_id(1), pl.program_id(2),
                    x_hbm, w_ref, None, o_ref, slab, sem)

    return pl.pallas_call(
        kfn,
        out_shape=jax.ShapeDtypeStruct((n, d, h, wp, n2), cdt),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, bd, bh, wp, n2),
            lambda ni, di, hi: (ni, di, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
