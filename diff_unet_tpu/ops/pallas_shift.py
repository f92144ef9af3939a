"""Pallas TPU kernel: shifted-window roll as MXU permutation matmuls.

In the transposed window layout (BW, C, Np), the Swin shift (spatial
roll by -ss between the no-shift and shift blocks of a stage) is a static
token permutation: shifted window (A, t) reads unshifted window
((A + (t+ss)//ws) mod g, (t+ss) mod ws) per axis. The permutation is
UNIFORM across windows, so it factors into 8 neighbor choices
k in {0,1}^3 with one (Np, Np) one-hot routing matrix each:

    out_window(A) = sum_k  wt[(A+k) mod g]  @  P_k

The XLA alternative — window_reverse_t -> jnp.roll -> window_partition_t —
is two spatial relayouts (~16 ms at the stage-1 geometry, the dominant
remaining block cost after the r4 transposed-layout pass); this kernel is
8 small matmuls per window on the otherwise-idle MXU plus one extra HBM
read of the window tensor. One-hot matmuls are exact in bf16 (each output
element is a single product by 1.0).

Grid: one program per (batch, window). The 8 neighbor blocks are the SAME
operand with 8 modular index maps; the stacked routing matrix
(8*Np, Np) is a shared constant block. Backward = the inverse permutation
(shift by -ss), so the custom_vjp reuses the kernel with inverted tables.

Reference behavior: models/swin_unetr/transformer.py:91-121 (torch.roll
around window attention); this kernel replaces the roll+re-partition pair,
not the attention math.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def _routing_matrices(ws: Tuple[int, ...], ss: Tuple[int, ...],
                      n_pad: int) -> np.ndarray:
    """(8, Np, Np) float32 one-hot: P[k, m, n] = 1 iff shifted token n of a
    window reads unshifted token m of neighbor k = (k0, k1, k2). Pad tokens
    (n >= N) have all-zero columns (outputs 0 — NaN-safe, masked anyway)."""
    n_tok = int(np.prod(ws))
    p = np.zeros((8, n_pad, n_pad), np.float32)
    for n in range(n_tok):
        t = np.unravel_index(n, ws)
        src_t = []
        k = 0
        for i in range(3):
            ti = t[i] + ss[i]
            delta, mi = divmod(ti, ws[i])
            # ss may be negative (inverse shift): divmod floors, so
            # delta in {-1, 0, 1}; neighbor offset is delta mod 2 only for
            # the +/-1 cases — encode offset sign in the table builder.
            src_t.append(mi)
            k = k * 2 + (1 if delta != 0 else 0)
        m = int(np.ravel_multi_index(src_t, ws))
        p[k, m, n] = 1.0
    return p


def _neighbor_step(ss_i: int) -> int:
    """Grid step of the 'delta != 0' neighbor along one axis: +1 for a
    forward shift (roll by -ss), -1 for the inverse."""
    return 1 if ss_i > 0 else (-1 if ss_i < 0 else 0)


def _shift_pallas(wt, ws, ss, grid_dims, b):
    bw, c, n_pad = wt.shape
    g0, g1, g2 = grid_dims
    nw = g0 * g1 * g2
    assert bw == b * nw, (wt.shape, grid_dims, b)
    p_np = _routing_matrices(tuple(ws), tuple(ss), n_pad)
    # stack neighbors along rows: one (C, 8*Np) @ (8*Np, Np) MXU call
    p_stk = jnp.asarray(p_np.reshape(8 * n_pad, n_pad), dtype=wt.dtype)
    steps = (_neighbor_step(ss[0]), _neighbor_step(ss[1]),
             _neighbor_step(ss[2]))

    def nbr_spec(k):
        k0, k1, k2 = (k >> 2) & 1, (k >> 1) & 1, k & 1

        def imap(ib, a0, a1, a2):
            return (ib * nw
                    + ((a0 + k0 * steps[0]) % g0) * g1 * g2
                    + ((a1 + k1 * steps[1]) % g1) * g2
                    + ((a2 + k2 * steps[2]) % g2), 0, 0)

        return pl.BlockSpec((1, c, n_pad), imap, memory_space=pltpu.VMEM)

    p_spec = pl.BlockSpec((8 * n_pad, n_pad), lambda *_: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, c, n_pad),
        lambda ib, a0, a1, a2: (ib * nw + a0 * g1 * g2 + a1 * g2 + a2, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def kernel(*refs):
        nbrs = [r.at[0] for r in refs[:8]]
        p_ref, o_ref = refs[8], refs[9]
        x = jnp.concatenate([r[:] for r in nbrs], axis=-1)   # (C, 8*Np)
        o_ref[0] = jax.lax.dot_general(
            x, p_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(wt.shape, wt.dtype),
        grid=(b, g0, g1, g2),
        in_specs=[nbr_spec(k) for k in range(8)] + [p_spec],
        out_specs=out_spec,
    )(*([wt] * 8), p_stk)


def shift_windows_t_reference(wt, ws, ss, grid_dims, b):
    """jnp reference: reverse -> roll -> re-partition (parity/CPU path)."""
    from diff_unet_tpu.ops.swin import window_partition_t, window_reverse_t

    g0, g1, g2 = grid_dims
    dims = (b, g0 * ws[0], g1 * ws[1], g2 * ws[2])
    x = window_reverse_t(wt, ws, dims)
    x = jnp.roll(x, shift=tuple(-s for s in ss), axis=(1, 2, 3))
    return window_partition_t(x, ws, wt.shape[-1])


def shift_windows_t(wt: jnp.ndarray, ws: Tuple[int, ...],
                    ss: Tuple[int, ...], grid_dims: Tuple[int, ...],
                    b: int, use_pallas: bool = True) -> jnp.ndarray:
    """Token-space window shift (spatial roll by -ss) in the transposed
    window layout. `grid_dims` = windows per axis; `b` = batch. Pad tokens
    of the output are ZERO (one-hot columns are empty there); callers mask
    them anyway (window_valid_mask). Differentiable: backward applies the
    inverse shift to the cotangent (permutations are orthogonal)."""
    if not use_pallas:
        return shift_windows_t_reference(wt, ws, ss, grid_dims, b)

    @jax.custom_vjp
    def shift(wt):
        return _shift_pallas(wt, ws, ss, grid_dims, b)

    def fwd(wt):
        return shift(wt), None

    def bwd(_, g):
        inv = tuple(-s for s in ss)
        return (_shift_pallas(g, ws, inv, grid_dims, b),)

    shift.defvjp(fwd, bwd)
    return shift(wt)
