"""Pallas TPU kernel: fused windowed multi-head attention.

Computes softmax(q k^T * scale + rel_bias [+ region_mask]) v for Swin-style
local windows in a single kernel — the hot op of the Swin family
(SURVEY.md #25; reference models/swin_unetr/attention.py:14-120). The XLA
path materialises the (BW, H, N, N) score tensor in HBM several times
(scores, +bias, +mask, softmax); at stage 1 of a 96^3 volume that is ~4 GB
of traffic per pass. This kernel keeps the N x N scores in VMEM: one HBM
read of q/k/v plus the small shared bias table and one write of the output.

v2 design (the v1 kernel lost most of its win to three costs it didn't
have to pay — measured in BASELINE.md "round-4 Swin attention"):
- matmuls run in the INPUT dtype (bf16) with f32 accumulation, like the XLA
  einsum path; v1 upcast q/k/v to f32 and paid 4-8x on the MXU.
- the shifted-window mask rides the Q K^T matmul: the per-window one-hot
  region encoding (R, N) is appended to q (scaled by +100) and k, so
  [q; 100e]^T [k; e] = q^T k + 100*same_region — row-shift-equivalent to
  the reference's -100*different — and for K <= 128 the MXU pass latency
  is independent of K, so the masking is free; v1 loaded a dense (N, N)
  f32 mask block per program (~590 KB x windows x heads = gigabytes of
  HBM reads) and added it on the VPU.
- the grid is (heads, windows) with windows minor, so the (N, N) bias block
  index is unchanged across consecutive programs and Pallas fetches it once
  per head instead of once per program.
- the key-padding mask is pre-baked into the bias columns (caller side), and
  the softmax normaliser is folded into p before the PV matmul, so the
  epilogue is max/exp/sum plus a single fused multiply.

Grid: one program per (head, window). The relative-position bias (H, N, N)
is shared across windows; region ids are indexed per window via the
BlockSpec index map. Token count N is padded to a multiple of 128 by the
caller; padded key tokens carry -1e30 bias columns and region id -1.

Backward: `pallas_call` has no autodiff rules; `fused_window_attention`
wraps the kernel in a custom_vjp whose backward recomputes the attention
with the jnp reference path and differentiates that (same math, XLA
backward) — training through the fused kernel works and matches the
einsum path's gradients.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_body(q_ref, k_ref, v_ref, bias_ref, enc_ref, o_ref,
               q_scale: float = 1.0):
    """q/k/v/o refs are (Dh, N): tokens in the lane dimension (128-aligned),
    head_dim in sublanes — the layout Mosaic tiling requires for Dh < 128.
    Matmuls run in the ref dtype (bf16 in production) with f32 accumulation;
    softmax statistics are f32.

    The shifted-window region mask rides the Q K^T matmul: enc_ref is the
    per-window one-hot region encoding (R, N); [q; 100*enc]^T [k; enc]
    = q^T k + 100*same_region(q, k), and softmax is row-shift-invariant, so
    +100*same is exactly the reference's -100*different. For K <= 128 the
    MXU pass latency is independent of K, so the masking costs nothing."""
    q = q_ref[:]
    if q_scale != 1.0:
        q = q * jnp.asarray(q_scale, q.dtype)
    k = k_ref[:]
    v = v_ref[:]
    if enc_ref is not None:
        e = enc_ref[:]
        q = jnp.concatenate([q, (100.0 * e).astype(q.dtype)], axis=0)
        k = jnp.concatenate([k, e.astype(k.dtype)], axis=0)

    # scores[nq, nk] = sum_d q[d, nq] k[d, nk]  (f32 accumulation)
    scores = jax.lax.dot_general(
        q, k, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # bias carries the key-padding -1e30 columns (baked in by the caller)
    scores = scores + bias_ref[:]

    m = jnp.max(scores, axis=-1, keepdims=True)
    e_s = jnp.exp(scores - m)
    r = 1.0 / jnp.sum(e_s, axis=-1, keepdims=True)
    p = (e_s * r).astype(v.dtype)
    # out[d, nq] = sum_nk v[d, nk] p[nq, nk]
    o_ref[:] = jax.lax.dot_general(
        v, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _region_onehot_cached(ids_bytes, shape, n):
    ids = np.frombuffer(ids_bytes, np.int32).reshape(shape)
    nw, nv = ids.shape
    r = int(-(-(ids.max() + 1) // 16) * 16)   # sublane-tile-aligned R
    enc = np.zeros((nw, r, n), np.float32)
    w_idx, t_idx = np.meshgrid(np.arange(nw), np.arange(nv), indexing="ij")
    enc[w_idx.ravel(), ids.ravel(), t_idx.ravel()] = 1.0
    return enc


def _region_onehot(region_ids: np.ndarray, n: int) -> np.ndarray:
    """Static (nW, R, N) one-hot region encoding; padded tokens all-zero."""
    ids = np.ascontiguousarray(region_ids.astype(np.int32))
    return _region_onehot_cached(ids.tobytes(), ids.shape, n)


def _squeeze_block(ref):
    """Strip a block's leading unit dims, leaving the (rows, N) tile."""
    return ref.at[(0,) * (len(ref.shape) - 2)]


def _pallas_attn(operands, qkv_specs, out_spec, dims, out_dtype, bias,
                 n_valid, region_ids, n_windows, q_scale):
    """Shared kernel plumbing for both attention entry points (ADVICE r4):
    the split (q, k, v) and fused-qkv paths differ ONLY in their operands
    and BlockSpec index maps; the grid, bias/colmask/enc handling and
    kernel wrappers live here once."""
    bw, h, dh, n = dims
    assert n % 128 == 0, "caller must pad tokens to a multiple of 128"

    # key-padding mask baked into the bias columns (saves an in-kernel
    # iota/compare/select on every (N, N) tile)
    bias = bias.astype(jnp.float32)
    if n_valid < n:
        colmask = np.zeros((1, 1, n), np.float32)
        colmask[..., n_valid:] = -1e30
        bias = bias + colmask

    # heads major / windows minor: the bias block index is constant across
    # the inner window sweep, so its copy is elided after the first fetch
    grid = (h, bw)
    bias_spec = pl.BlockSpec((1, n, n), lambda j, i: (j, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bw, h, dh, n), out_dtype)

    if region_ids is not None:
        enc = jnp.asarray(_region_onehot(region_ids, n), dtype=out_dtype)
        enc_spec = pl.BlockSpec(
            (1, enc.shape[1], n), lambda j, i: (i % n_windows, 0, 0),
            memory_space=pltpu.VMEM,
        )

        def kernel(q_ref, k_ref, v_ref, b_ref, enc_ref, o_ref):
            _attn_body(_squeeze_block(q_ref), _squeeze_block(k_ref),
                       _squeeze_block(v_ref), b_ref.at[0], enc_ref.at[0],
                       _squeeze_block(o_ref), q_scale=q_scale)

        return pl.pallas_call(
            kernel, out_shape=out_shape, grid=grid,
            in_specs=[*qkv_specs, bias_spec, enc_spec], out_specs=out_spec,
        )(*operands, bias, enc)

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
        _attn_body(_squeeze_block(q_ref), _squeeze_block(k_ref),
                   _squeeze_block(v_ref), b_ref.at[0], None,
                   _squeeze_block(o_ref), q_scale=q_scale)

    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=grid,
        in_specs=[*qkv_specs, bias_spec], out_specs=out_spec,
    )(*operands, bias)


def _pallas_forward(qt, kt, vt, bias, n_valid, region_ids, n_windows):
    """Transposed-layout core: q/k/v arrive (BW, H, Dh, N) — tokens already
    in the lane dimension — and the output keeps that layout. The q scale
    rides the kernel body (no separate HBM pass over q)."""
    bw, h, dh, n = qt.shape
    qkv_spec = pl.BlockSpec((1, 1, dh, n), lambda j, i: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    return _pallas_attn(
        [qt, kt, vt], [qkv_spec] * 3, qkv_spec, (bw, h, dh, n), qt.dtype,
        bias, n_valid, region_ids, n_windows, q_scale=dh ** -0.5)


def fused_window_attention_t(
    qt: jnp.ndarray,                # (BW, H, Dh, N) — tokens in lanes
    kt: jnp.ndarray,
    vt: jnp.ndarray,
    bias: jnp.ndarray,              # (H, N, N) rel-pos bias, window-shared
    n_valid: int,
    region_ids: Optional[np.ndarray] = None,  # STATIC (nW, n_valid) ids
    n_windows: int = 1,             # windows per batch element (mask cycle)
) -> jnp.ndarray:
    """Differentiable fused window attention in the kernel-native transposed
    layout (the module uses this to reach the kernel with ONE relayout of
    the qkv projection instead of three). Output is (BW, H, Dh, N).
    Backward recomputes through the jnp reference path (XLA backward)."""
    if region_ids is not None:
        region_ids = np.asarray(region_ids)
        assert region_ids.shape[0] == n_windows

    @jax.custom_vjp
    def attn(qt, kt, vt, bias):
        return _pallas_forward(qt, kt, vt, bias, n_valid, region_ids,
                               n_windows)

    def fwd(qt, kt, vt, bias):
        return attn(qt, kt, vt, bias), (qt, kt, vt, bias)

    def bwd(res, g):
        qt, kt, vt, bias = res

        def ref_t(qt_, kt_, vt_, b_):
            out = reference_window_attention(
                qt_.transpose(0, 1, 3, 2), kt_.transpose(0, 1, 3, 2),
                vt_.transpose(0, 1, 3, 2), b_, n_valid,
                _dense_mask(region_ids) if region_ids is not None else None,
                n_windows=n_windows,
            )
            return out.transpose(0, 1, 3, 2)

        _, vjp = jax.vjp(ref_t, qt, kt, vt, bias)
        return vjp(g)

    attn.defvjp(fwd, bwd)
    return attn(qt, kt, vt, bias)


def _pallas_forward_qkv(qkvt, bias, n_valid, region_ids, n_windows):
    """Fused-qkv core: qkvt is ONE (BW, 3, H, Dh, N) array (the free reshape
    of the transposed-layout qkv projection, ops/swin.py) — q/k/v are
    sliced by three BlockSpec index maps over the same operand, so no
    HBM-level split/transpose ever materialises."""
    bw, three, h, dh, n = qkvt.shape
    assert three == 3, qkvt.shape

    def qkv_spec(sel):
        return pl.BlockSpec((1, 1, 1, dh, n),
                            lambda j, i, s=sel: (i, s, j, 0, 0),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, 1, dh, n), lambda j, i: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    return _pallas_attn(
        [qkvt, qkvt, qkvt], [qkv_spec(0), qkv_spec(1), qkv_spec(2)],
        out_spec, (bw, h, dh, n), qkvt.dtype, bias, n_valid, region_ids,
        n_windows, q_scale=dh ** -0.5)


def fused_window_attention_qkv(
    qkvt: jnp.ndarray,              # (BW, 3, H, Dh, N) — fused qkv, tokens in lanes
    bias: jnp.ndarray,              # (H, N, N) rel-pos bias, window-shared
    n_valid: int,
    region_ids: Optional[np.ndarray] = None,  # STATIC (nW, n_valid) ids
    n_windows: int = 1,
) -> jnp.ndarray:
    """Differentiable fused window attention over a FUSED qkv array — the
    transposed-layout entry point: (BW, 3C, N) reshapes to (BW, 3, H, Dh, N)
    for free, and the kernel slices q/k/v via index maps (zero relayout).
    Output is (BW, H, Dh, N). Backward recomputes through the jnp reference
    path (XLA backward)."""
    if region_ids is not None:
        region_ids = np.asarray(region_ids)
        assert region_ids.shape[0] == n_windows

    @jax.custom_vjp
    def attn(qkvt, bias):
        return _pallas_forward_qkv(qkvt, bias, n_valid, region_ids,
                                   n_windows)

    def fwd(qkvt, bias):
        return attn(qkvt, bias), (qkvt, bias)

    def bwd(res, g):
        qkvt, bias = res

        def ref_t(qkvt_, b_):
            q = qkvt_[:, 0].transpose(0, 1, 3, 2)
            k = qkvt_[:, 1].transpose(0, 1, 3, 2)
            v = qkvt_[:, 2].transpose(0, 1, 3, 2)
            out = reference_window_attention(
                q, k, v, b_, n_valid,
                _dense_mask(region_ids) if region_ids is not None else None,
                n_windows=n_windows,
            )
            return out.transpose(0, 1, 3, 2)

        _, vjp = jax.vjp(ref_t, qkvt, bias)
        return vjp(g)

    attn.defvjp(fwd, bwd)
    return attn(qkvt, bias)


def fused_window_attention(
    q: jnp.ndarray,                 # (BW, H, N, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,              # (H, N, N) rel-pos bias, window-shared
    n_valid: int,
    region_ids: Optional[np.ndarray] = None,  # STATIC (nW, n_valid) ids
    n_windows: int = 1,             # windows per batch element (mask cycle)
) -> jnp.ndarray:
    """(BW, H, N, Dh)-layout wrapper around fused_window_attention_t."""
    out = fused_window_attention_t(
        q.transpose(0, 1, 3, 2), k.transpose(0, 1, 3, 2),
        v.transpose(0, 1, 3, 2), bias, n_valid, region_ids, n_windows,
    )
    return out.transpose(0, 1, 3, 2)


@functools.lru_cache(maxsize=None)
def _dense_mask_cached(ids_bytes, shape):
    ids = np.frombuffer(ids_bytes, np.int32).reshape(shape)
    return jnp.where(
        jnp.asarray(ids[:, None, :] != ids[:, :, None]), -100.0, 0.0
    )


def _dense_mask(region_ids: np.ndarray) -> jnp.ndarray:
    ids = np.ascontiguousarray(region_ids.astype(np.int32))
    return _dense_mask_cached(ids.tobytes(), ids.shape)


def reference_window_attention(q, k, v, bias, n_valid, mask=None,
                               n_windows: int = 1):
    """jnp reference used for kernel parity tests and the custom backward."""
    bw = q.shape[0]
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("whnd,whmd->whnm", q * scale, k,
                        preferred_element_type=jnp.float32)
    scores = scores + bias[None].astype(scores.dtype)
    if mask is not None:
        nm = mask.shape[1]
        widx = jnp.arange(bw) % n_windows
        m = mask[widx][:, None]
        scores = scores.at[:, :, :nm, :nm].add(m.astype(scores.dtype))
    col = jnp.arange(q.shape[2])
    scores = jnp.where(col[None, None, None, :] < n_valid, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("whnm,whmd->whnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
