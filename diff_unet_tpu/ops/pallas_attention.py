"""Pallas TPU kernel: fused windowed multi-head attention.

Computes softmax(q k^T * scale + rel_bias [+ region_mask]) v for Swin-style
local windows in a single kernel — the hot op of the Swin family
(SURVEY.md #25). The XLA path materialises the (BW, H, N, N) score tensor in
HBM several times (scores, +bias, +mask, softmax); at stage 0 of a 96^3
volume that is ~1 GB of traffic per pass. This kernel keeps the N x N scores
in VMEM: one HBM read of q/k/v (plus the small shared bias/mask tables) and
one write of the output.

Grid: one program per (window, head). The relative-position bias (H, N, N)
is shared across windows; the shifted-window region mask (nW, N, N) is
indexed per window via the BlockSpec index map. Token count N is padded to a
multiple of 128 by the caller; padded key tokens are masked with -inf before
the softmax.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_body(q_ref, k_ref, v_ref, bias_ref, mask_ref, nvalid_ref, o_ref):
    """q/k/v/o refs are (Dh, N): tokens in the lane dimension (128-aligned),
    head_dim in sublanes — the layout Mosaic tiling requires for Dh < 128."""
    n = q_ref.shape[1]
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)

    # scores[nq, nk] = sum_d q[d, nq] k[d, nk]
    scores = jax.lax.dot_general(
        q, k, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores + bias_ref[:].astype(jnp.float32)
    if mask_ref is not None:
        scores = scores + mask_ref[:].astype(jnp.float32)

    nvalid = nvalid_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    scores = jnp.where(col < nvalid, scores, -1e30)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    # out[d, nq] = sum_nk v[d, nk] p[nq, nk]
    o_ref[:] = jax.lax.dot_general(
        v, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def fused_window_attention(
    q: jnp.ndarray,                 # (BW, H, N, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,              # (H, N, N) rel-pos bias, window-shared
    n_valid: int,
    mask: Optional[jnp.ndarray] = None,   # (nW, N, N) region mask
    n_windows: int = 1,             # windows per batch element (mask cycle)
) -> jnp.ndarray:
    bw, h, n, dh = q.shape
    assert n % 128 == 0, "caller must pad tokens to a multiple of 128"
    q = q * (dh ** -0.5)
    nvalid_arr = jnp.full((1,), n_valid, jnp.int32)

    # (BW, H, N, Dh) -> (BW, H, Dh, N): tokens into the lane dimension
    qt = q.transpose(0, 1, 3, 2)
    kt = k.transpose(0, 1, 3, 2)
    vt = v.transpose(0, 1, 3, 2)

    grid = (bw, h)
    qkv_spec = pl.BlockSpec((1, 1, dh, n), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, n, n), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    if mask is not None:
        mask_spec = pl.BlockSpec(
            (1, n, n), lambda i, j: (i % n_windows, 0, 0),
            memory_space=pltpu.VMEM,
        )

        def kernel(q_ref, k_ref, v_ref, b_ref, m_ref, nv_ref, o_ref):
            _attn_body(q_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0],
                       b_ref.at[0], m_ref.at[0], nv_ref, o_ref.at[0, 0])

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bw, h, dh, n), q.dtype),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec,
                      smem_spec],
            out_specs=qkv_spec,
        )(qt, kt, vt, bias, mask, nvalid_arr)
    else:
        def kernel(q_ref, k_ref, v_ref, b_ref, nv_ref, o_ref):
            _attn_body(q_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0],
                       b_ref.at[0], None, nv_ref, o_ref.at[0, 0])

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bw, h, dh, n), q.dtype),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, smem_spec],
            out_specs=qkv_spec,
        )(qt, kt, vt, bias, nvalid_arr)
    return out.transpose(0, 1, 3, 2)


def reference_window_attention(q, k, v, bias, n_valid, mask=None,
                               n_windows: int = 1):
    """jnp reference used for kernel parity tests."""
    bw = q.shape[0]
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("whnd,whmd->whnm", q * scale, k,
                        preferred_element_type=jnp.float32)
    scores = scores + bias[None].astype(scores.dtype)
    if mask is not None:
        widx = jnp.arange(bw) % n_windows
        scores = scores + mask[widx][:, None].astype(scores.dtype)
    col = jnp.arange(q.shape[2])
    scores = jnp.where(col[None, None, None, :] < n_valid, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("whnm,whmd->whnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
