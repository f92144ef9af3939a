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
                       dtype=None,
                       pad_value: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """Packed parts [(N,D,H,Wp,2Ci)] -> halo-padded (N,D+2,H+2,Wpad,2Cin).

    Column j of the result is a[j] = (u[2j-1], u[2j]) of the logical
    unpacked concat u; columns beyond (Wp+1) are zero (DMA tile alignment).
    XLA fuses unpack+concat+pad+repack into a single copy.

    `pad_value` (per original channel, length Cin or 2*Cin tiled) fills the
    halo/pad region instead of zeros — the compensation making a fused
    input prologue exact: the prologue maps pad_value to 0, preserving the
    zero-padded SAME-conv semantics without any in-kernel masking.
    """
    cols = [pk.unpack_w(p, 2) for p in parts]
    u = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=-1)
    if dtype is not None:
        u = u.astype(dtype)
    n, d, h, w, c = u.shape
    up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (1, 2 * wpad - w - 1), (0, 0)))
    if pad_value is not None:
        pv = jnp.asarray(pad_value, up.dtype)
        if pv.shape[-1] == 2 * c:       # a-layout (tiled halves) -> original
            pv = pv[..., :c]
        if pv.ndim == 2:                # per-sample (N, C) fill values
            pv = pv.reshape(pv.shape[0], 1, 1, 1, c)
        iota = lambda ax: jax.lax.broadcasted_iota(  # noqa: E731
            jnp.int32, up.shape[1:4], ax).reshape(1, *up.shape[1:4], 1)
        valid = ((iota(0) >= 1) & (iota(0) <= d)
                 & (iota(1) >= 1) & (iota(1) <= h)
                 & (iota(2) >= 1) & (iota(2) <= w))
        up = jnp.where(valid, up, pv)
    return up.reshape(n, d + 2, h + 2, wpad, 2 * c)


def prologue_pad_value(
    scale: jnp.ndarray, bias: jnp.ndarray,
    const: Optional[jnp.ndarray] = None,
    negative_slope: Optional[float] = None,
) -> jnp.ndarray:
    """Per-channel pad fill v solving prologue(v) == 0 for the fused input
    prologue `lrelu(scale*x + bias) + const`:

        lrelu(scale*v + bias) = -const
        scale*v + bias = inv_lrelu(-const)    (inv_lrelu(y)=y if y>=0
                                               else y/slope)
        v = (inv_lrelu(-const) - bias) / scale

    scale == 0 degenerates (the prologue is constant); v=0 is returned and
    the caller keeps exactness only when bias/const make prologue(0)=0.
    """
    scale = jnp.asarray(scale, jnp.float32)
    bias = jnp.asarray(bias, jnp.float32)
    z = (-jnp.asarray(const, jnp.float32) if const is not None
         else jnp.zeros_like(bias))
    if negative_slope is not None:
        z = jnp.where(z >= 0, z, z / negative_slope)
    return jnp.where(scale != 0, (z - bias) / jnp.where(scale == 0, 1.0,
                                                        scale), 0.0)


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


def conv3x3_packed_aug_pipelined(
    parts: Union[jnp.ndarray, Sequence[jnp.ndarray]],
    w: jnp.ndarray,                      # ORIGINAL (3,3,3, Cin, Cout)
    b: Optional[jnp.ndarray] = None,     # (Cout,) or None
    *,
    dtype=None,
    block_d: int = 8,
    block_h: int = 8,
    negative_slope: Optional[float] = None,   # fused LeakyReLU epilogue
    prologue_scale: Optional[jnp.ndarray] = None,  # (2Cin,) a-layout
    prologue_bias: Optional[jnp.ndarray] = None,   # affine on the INPUT slab
    prologue_const: Optional[jnp.ndarray] = None,  # added AFTER the lrelu
    prologue_negative_slope: Optional[float] = None,
    pad_value: Optional[jnp.ndarray] = None,   # see prologue_pad_value
    with_stats: bool = False,           # also return per-channel sum/sumsq
    inner: str = "im2col",              # "im2col" | "taps"
    rows_per_dot: int = 2,              # im2col: output rows per MXU dot
    realign: str = "roll",              # "roll" | "slice" b-half realignment
    _probe: Optional[str] = None,       # perf probes: "noepi" | "nostore"
    interpret: bool = False,
):
    """Double-buffered variant of `conv3x3_packed_aug`.

    The original kernel issues its halo-slab DMA and immediately waits on it
    (`dma.start(); dma.wait()`), so HBM reads never overlap MXU work — the
    likely reason it lost to XLA's conv despite doing 1.33x vs 2x MACs
    (BASELINE.md r2 roofline). This version prefetches grid cell i+1's slab
    into the alternate buffer while cell i computes (the standard Pallas
    double-buffering pattern), and optionally fuses the surrounding
    InstanceNorm/activation/FiLM work so the conv's elementwise neighbours
    cost zero extra HBM passes:

    - input prologue `lrelu(scale*x + bias) + const` applied ONCE to the
      slab in VMEM right after its DMA — folds the PRECEDING InstanceNorm's
      normalize+affine, the LeakyReLU, and a per-channel FiLM add (the
      PackedTwoConv temb) into this conv's read. Zero-pad semantics are
      preserved by filling the halo with `pad_value` (prologue_pad_value),
      which the prologue maps back to exactly 0 — no in-kernel masking.
      All prologue vectors are per packed channel in the a-layout
      ([u_odd | u_even] halves, i.e. jnp.tile(per_channel, 2)).
    - `with_stats`: accumulates sum and sum-of-squares of the conv output
      per packed channel into a second output (n, 2, 2*cout) f32 — the
      reduce pass of the FOLLOWING InstanceNorm, computed while the output
      block is still in VMEM.

    Returns y or (y, stats) with stats[ni, 0] = sum, stats[ni, 1] = sumsq.
    """
    parts = list(parts) if isinstance(parts, (list, tuple)) else [parts]
    n, d, h, wp = parts[0].shape[:4]
    cin, cout = w.shape[3], w.shape[4]
    assert sum(p.shape[-1] for p in parts) == 2 * cin, (
        [p.shape for p in parts], w.shape)

    cdt = dtype or parts[0].dtype
    wpad = _round_up(wp + 1, 8)
    xpad = build_padded_input(parts, wpad, dtype=cdt,
                              pad_value=pad_value)   # (N,D+2,H+2,Wpad,K2)
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
    nd, nh = d // bd, h // bh
    total = n * nd * nh
    use_im2col = inner == "im2col"
    og = max(1, rows_per_dot)
    while bd % og:
        og //= 2
    # keep the double-buffered im2col blocks + slabs within ~12 MB VMEM
    # (wide-Cin convs like the UpCat 128->64 would blow 16 MB at og=2)
    itemsize = jnp.dtype(cdt).itemsize
    slab_bytes = 2 * (bd + 2) * (bh + 2) * wpad * k2 * itemsize
    while og > 1 and slab_bytes + 2 * og * m * 9 * k2 * itemsize > 12 << 20:
        og //= 2

    prol_tab = None
    if prologue_scale is not None:
        # vectors are (k2,) shared or (n, k2) per-sample (InstanceNorm
        # affines differ per batch element); table layout (n, 3, k2)
        def row(v):
            if v is None:
                return jnp.zeros((n, 1, k2), jnp.float32)
            v = jnp.asarray(v, jnp.float32)
            v = jnp.broadcast_to(v.reshape((-1, 1, k2)), (n, 1, k2))
            return v
        prol_tab = jnp.concatenate(
            [row(prologue_scale), row(prologue_bias), row(prologue_const)],
            axis=1).astype(cdt)

    def body_fn(x_hbm, w_ref, b_ref, p_ref, o_ref, s_ref, slabs, sem,
                im_ref):
        ni, di, hi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        i = (ni * nd + di) * nh + hi

        def dma_for(cell, slot):
            ni_ = cell // (nd * nh)
            rem = cell % (nd * nh)
            return pltpu.make_async_copy(
                x_hbm.at[ni_,
                         pl.ds((rem // nh) * bd, bd + 2),
                         pl.ds((rem % nh) * bh, bh + 2)],
                slabs.at[slot],
                sem.at[slot],
            )

        @pl.when(i == 0)
        def _():
            dma_for(0, 0).start()

        @pl.when(i + 1 < total)
        def _():
            dma_for(i + 1, (i + 1) % 2).start()

        dma_for(i, i % 2).wait()
        slot = i % 2

        if p_ref is not None:
            # one in-place pass over the slab (VMEM-bandwidth, ~2us/cell)
            # replaces a whole HBM normalize+activation+FiLM pass
            ps_ = p_ref[0, 0].reshape(1, 1, 1, k2)
            pb_ = p_ref[0, 1].reshape(1, 1, 1, k2)
            pc_ = p_ref[0, 2].reshape(1, 1, 1, k2)
            v = slabs[slot] * ps_ + pb_
            if prologue_negative_slope is not None:
                # max/min form: Mosaic can't lower a bf16 vector compare
                # ("Target does not support this comparison")
                zero = jnp.zeros((), v.dtype)
                v = jnp.maximum(v, zero) \
                    + jnp.minimum(v, zero) * prologue_negative_slope
            slabs[slot] = v + pc_

        if s_ref is not None:
            @pl.when(jnp.logical_and(di == 0, hi == 0))
            def _():
                s_ref[:] = jnp.zeros_like(s_ref)

        def row_epilogue(od, p, stats):
            """p (bh, wpad, 2*n2) f32 -> realign, bias, act, write, stats."""
            if _probe == "noepi":   # perf probe: skip realignment entirely
                o_ref[0, od] = p[:, :wp, :n2].astype(o_ref.dtype)
                return stats
            pa = p[:, :, :n2]
            if realign == "slice":
                y = pa[:, :wp, :] + p[:, 1:wp + 1, n2:]
            else:
                pb_ = pltpu.roll(p[:, :, n2:], wpad - 1, 1)
                y = (pa + pb_)[:, :wp, :]
            if b_ref is not None:
                y = y + b_ref[:]
            if negative_slope is not None:
                y = jnp.where(y >= 0, y, y * negative_slope)
            o_ref[0, od] = y.astype(o_ref.dtype)
            if s_ref is None:
                return stats
            y2 = y.reshape(bh * wp, n2)
            return stats + jnp.concatenate([
                jnp.sum(y2, axis=0, keepdims=True),
                jnp.sum(jnp.square(y2), axis=0, keepdims=True),
            ], axis=0)                                 # (2, n2) f32

        init = (0 if s_ref is None
                else jnp.zeros((2, n2), jnp.float32))

        if im_ref is None:
            # "taps" inner: 9 small dots accumulating (m, 2n2) in VMEM
            def od_body(od, stats):
                acc = jnp.zeros((m, 2 * n2), jnp.float32)
                for dd in range(3):
                    for dh in range(3):
                        lhs = slabs[slot, od + dd,
                                    pl.ds(dh, bh)].reshape(m, k2)
                        acc = acc + jax.lax.dot_general(
                            lhs, w_ref[dd, dh],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                return row_epilogue(od, acc.reshape(bh, wpad, 2 * n2),
                                    stats)

            st = jax.lax.fori_loop(0, bd, od_body, init)
        else:
            # "im2col" inner: gather the 9 taps of `og` output rows into a
            # (og*m, 9*k2) VMEM block, then ONE MXU dot with K=9*k2 — the
            # f32 accumulator is written once instead of read-modify-written
            # 9 times (the taps inner moves ~66 MB of accumulator traffic
            # per cell; this one ~7 MB)
            def blk_body(ob, stats):
                isl = ob % 2
                if _probe != "nostore":
                    for r in range(og):
                        for dd in range(3):
                            for dh in range(3):
                                tap = dd * 3 + dh
                                im_ref[isl, pl.ds(r * m, m),
                                       tap * k2:(tap + 1) * k2] = (
                                    slabs[slot, ob * og + r + dd,
                                          pl.ds(dh, bh)].reshape(m, k2))
                acc = jax.lax.dot_general(
                    im_ref[isl], w_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (og*m, 2n2)
                for r in range(og):
                    stats = row_epilogue(
                        ob * og + r,
                        acc[r * m:(r + 1) * m].reshape(bh, wpad, 2 * n2),
                        stats)
                return stats

            st = jax.lax.fori_loop(0, bd // og, blk_body, init)
        if s_ref is not None:
            s_ref[0] += st

    grid = (n, nd, nh)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [xpad, wab.reshape(9 * k2, 2 * n2) if use_im2col else wab]
    if bias2 is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(bias2)
    if prol_tab is not None:
        in_specs.append(pl.BlockSpec(
            (1, 3, k2), lambda ni, di, hi: (ni, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(prol_tab)

    out_shape = [jax.ShapeDtypeStruct((n, d, h, wp, n2), cdt)]
    out_specs = [pl.BlockSpec(
        (1, bd, bh, wp, n2),
        lambda ni, di, hi: (ni, di, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )]
    if with_stats:
        out_shape.append(jax.ShapeDtypeStruct((n, 2, n2), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, 2, n2),
            lambda ni, di, hi: (ni, 0, 0),
            memory_space=pltpu.VMEM,
        ))

    def kfn(*refs):
        nin = len(args)
        x_hbm, w_ref = refs[0], refs[1]
        k = 2
        b_ref = None
        if bias2 is not None:
            b_ref = refs[k]
            k += 1
        p_ref = refs[k] if prol_tab is not None else None
        outs = refs[nin:nin + len(out_shape)]
        o_ref = outs[0]
        s_ref = outs[1] if with_stats else None
        rest = refs[nin + len(out_shape):]
        slabs, sem = rest[0], rest[1]
        im_ref = rest[2] if use_im2col else None
        body_fn(x_hbm, w_ref, b_ref, p_ref, o_ref, s_ref, slabs, sem,
                im_ref)

    scratch = [
        pltpu.VMEM((2, bd + 2, bh + 2, wpad, k2), cdt),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if use_im2col:
        scratch.append(pltpu.VMEM((2, og * m, 9 * k2), cdt))
    out = pl.pallas_call(
        kfn,
        out_shape=tuple(out_shape) if with_stats else out_shape[0],
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if with_stats else out_specs[0],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return out
