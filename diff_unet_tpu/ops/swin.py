"""3D (shifted-)window Swin transformer stack, channel-last, TPU-first.

Capability parity with the reference's vendored+modified MONAI Swin stack
(SURVEY.md #25):
- WindowAttention with 3D relative position bias
  (models/swin_unetr/attention.py:14-120),
- window partition/reverse/get_window_size (attention.py:163-252),
- shifted-window region masks (attention.py:123-160) — the compact (nW, N)
  region-id table is computed *statically in numpy at trace time* per
  (resolution, window, shift); the dense (nW, N, N) mask is two on-device
  ops over it (reference recomputes the whole mask per forward,
  transformer.py:100),
- SwinTransformerBlock norm->win-attn->residual->MLP (transformer.py:319-482),
- BasicLayer with alternating no-shift/shift blocks + patch merging
  (transformer.py:24-121),
- PatchMerging (v0.9.0 semantics, duplicated-slice quirk preserved for
  pretrained-weight compatibility) and PatchMergingV2 (patch.py:19-94),
- conv PatchEmbed (patch_embed.py:23-64),
- SwinTransformer with optional per-stage timestep injection
  (transformer.py:124-316: x_stage += t_proj(swish(temb))) and non-affine
  layer-norm `proj_out` stage outputs.

All shapes are static under jit; region-id tables and relative-position
indices are numpy constants embedded in the compiled program (dense masks
are derived on device — a dense stage-0 mask constant would be 161 MB).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------- static geometry helpers ----------

def get_window_size(dims: Sequence[int], window_size: Sequence[int],
                    shift_size: Optional[Sequence[int]] = None):
    """Clamp window to the input size; zero the shift there
    (attention.py:228-252)."""
    ws = list(window_size)
    ss = list(shift_size) if shift_size is not None else None
    for i, d in enumerate(dims):
        if d <= window_size[i]:
            ws[i] = d
            if ss is not None:
                ss[i] = 0
    return (tuple(ws), tuple(ss)) if ss is not None else tuple(ws)


def window_partition(x: jnp.ndarray, ws: Sequence[int]) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B*nW, wd*wh*ww, C) (attention.py:163-193)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2],
                  ws[2], c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws[0] * ws[1] * ws[2], c)


def window_reverse(windows: jnp.ndarray, ws: Sequence[int],
                   dims: Sequence[int]) -> jnp.ndarray:
    """Inverse of window_partition (attention.py:196-225)."""
    b, d, h, w = dims
    x = windows.reshape(b, d // ws[0], h // ws[1], w // ws[2],
                        ws[0], ws[1], ws[2], -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, -1)


def window_partition_t(x: jnp.ndarray, ws: Sequence[int],
                       n_pad: int) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B*nW, C, Np): the TRANSPOSED window layout with
    tokens in the LANE dimension, padded to Np (a multiple of 128).

    Why: a (.., N, C) window tensor with C=48 pads 48 -> 128 lanes (2.67x
    bytes on every elementwise/norm/matmul pass — measured 22-112 GB/s on
    the stage-1 block segments, benchmarks/swin_block_probe.py); in
    (.., C, N=343->384) layout the pad tax is 1.12x and the fused Pallas
    attention kernel (ops/pallas_attention.py) is native in it, so the
    qkv/out relayouts vanish."""
    b, d, h, w, c = x.shape
    n = ws[0] * ws[1] * ws[2]
    x = x.reshape(b, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2],
                  ws[2], c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    x = x.reshape(-1, c, n)
    if n_pad > n:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, n_pad - n)])
    return x


def window_reverse_t(wt: jnp.ndarray, ws: Sequence[int],
                     dims: Sequence[int]) -> jnp.ndarray:
    """Inverse of window_partition_t: (B*nW, C, Np) -> (B, D, H, W, C)."""
    b, d, h, w = dims
    n = ws[0] * ws[1] * ws[2]
    c = wt.shape[1]
    x = wt[..., :n].reshape(b, d // ws[0], h // ws[1], w // ws[2], c,
                            ws[0], ws[1], ws[2])
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, d, h, w, c)


@functools.lru_cache(maxsize=None)
def window_valid_mask(dims_padded: Tuple[int, ...],
                      dims_valid: Tuple[int, ...], ws: Tuple[int, ...],
                      ss: Tuple[int, ...], n_pad: int):
    """STATIC (nW, Np) float32 {0,1} token-validity table, or None when
    every token is real (no spatial padding).

    The transposed block path normalizes BEFORE padding-aware windowing, so
    pad tokens carry LayerNorm bias instead of the zeros the reference
    feeds qkv (reference normalizes the unpadded tensor, then zero-pads);
    multiplying by this mask after norm1 restores exact parity."""
    if tuple(dims_padded) == tuple(dims_valid):
        return None
    d, h, w = dims_padded
    vol = np.zeros((1, d, h, w, 1), np.float32)
    vol[:, :dims_valid[0], :dims_valid[1], :dims_valid[2]] = 1.0
    vol = np.roll(vol, shift=tuple(-s for s in ss), axis=(1, 2, 3))
    m = vol.reshape(1, d // ws[0], ws[0], h // ws[1], ws[1],
                    w // ws[2], ws[2], 1)
    m = m.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    m = m.reshape(-1, ws[0] * ws[1] * ws[2])                 # (nW, N)
    if n_pad > m.shape[1]:
        m = np.pad(m, [(0, 0), (0, n_pad - m.shape[1])])
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def window_region_ids(dims: Tuple[int, ...], ws: Tuple[int, ...],
                      ss: Tuple[int, ...]) -> np.ndarray:
    """Per-token shift-region ids, (nW, N) int32 (attention.py:123-155),
    computed once in numpy per static geometry.

    This is the compact form of the shifted-window mask: the dense
    (nW, N, N) mask is `where(ids[:, None, :] != ids[:, :, None], -100, 0)`
    and is built ON DEVICE (compute_attn_mask) — embedding the dense f32
    mask as a program constant costs nW*N^2*4 bytes (161 MB at the 96^3
    stage-0 geometry: 343 windows x 343^2), which overflows compile-request
    limits and bloats every program; the id constant is N x smaller."""
    d, h, w = dims
    img_mask = np.zeros((1, d, h, w, 1), np.float32)
    cnt = 0
    for ds in (slice(-ws[0]), slice(-ws[0], -ss[0] or None),
               slice(-ss[0] or d, None)):
        for hs in (slice(-ws[1]), slice(-ws[1], -ss[1] or None),
                   slice(-ss[1] or h, None)):
            for wsl in (slice(-ws[2]), slice(-ws[2], -ss[2] or None),
                        slice(-ss[2] or w, None)):
                img_mask[:, ds, hs, wsl, :] = cnt
                cnt += 1
    # numpy window partition (must stay traceable-free: this runs inside
    # jit tracing via the lru_cache as a pure compile-time constant)
    m = img_mask.reshape(1, d // ws[0], ws[0], h // ws[1], ws[1],
                         w // ws[2], ws[2], 1)
    m = m.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return m.reshape(-1, ws[0] * ws[1] * ws[2]).astype(np.int32)  # (nW, N)


def compute_attn_mask(dims: Tuple[int, ...], ws: Tuple[int, ...],
                      ss: Tuple[int, ...]) -> jnp.ndarray:
    """Shifted-window region mask, (nW, N, N) float32 with 0 / -100
    (attention.py:123-160). Only the (nW, N) region-id table is a
    compile-time constant; the dense mask is two on-device ops."""
    mw = jnp.asarray(window_region_ids(dims, ws, ss))
    return jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)


@functools.lru_cache(maxsize=None)
def relative_position_index(ws: Tuple[int, ...]) -> np.ndarray:
    """(N, N) index into the (2wd-1)(2wh-1)(2ww-1) bias table
    (attention.py:56-88)."""
    coords = np.stack(
        np.meshgrid(*[np.arange(s) for s in ws], indexing="ij")
    ).reshape(len(ws), -1)                          # (3, N)
    rel = coords[:, :, None] - coords[:, None, :]   # (3, N, N)
    rel = rel.transpose(1, 2, 0)
    for i in range(3):
        rel[:, :, i] += ws[i] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= 2 * ws[2] - 1
    return rel.sum(-1)


# ---------- modules ----------

# trace-time toggle for the fused Pallas attention kernel
# (ops/pallas_attention.py): True/False force it, None = auto (enabled on
# TPU backends, +6% end-to-end on DiffSwinUNETR DDIM; off elsewhere).
# Flip with `use_pallas_attention()` or set before tracing.
USE_PALLAS_ATTENTION = None


def _pallas_attention_enabled() -> bool:
    if USE_PALLAS_ATTENTION is not None:
        return USE_PALLAS_ATTENTION
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pallas_attention_auto(n_programs: int) -> bool:
    """Kernel gating for WindowAttention: an explicit USE_PALLAS_ATTENTION
    force always wins; auto mode requires a TPU backend AND a grid big
    enough to amortise launch overhead (stage-4-sized grids are
    launch-bound, benchmarks/attention_probe.py)."""
    if USE_PALLAS_ATTENTION is not None:
        return USE_PALLAS_ATTENTION
    return _pallas_attention_enabled() and n_programs >= 256


class use_pallas_attention:
    """Context manager enabling the fused Pallas window-attention kernel."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        global USE_PALLAS_ATTENTION
        self.prev = USE_PALLAS_ATTENTION
        USE_PALLAS_ATTENTION = self.enabled

    def __exit__(self, *exc):
        global USE_PALLAS_ATTENTION
        USE_PALLAS_ATTENTION = self.prev


# trace-time toggle for the TRANSPOSED (BW, C, N) block execution layout.
# True/False force it, None = auto: enabled on TPU for stages whose channel
# count pays lane-padding tax (C < 256; stage 4's C=384 = 3x128 is already
# lane-exact and its N=216 -> 256 pad would make things WORSE).
USE_TRANSPOSED_BLOCKS = None


def _transposed_enabled(c: int) -> bool:
    if USE_TRANSPOSED_BLOCKS is not None:
        return USE_TRANSPOSED_BLOCKS
    if c >= 256:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


class use_transposed_blocks:
    """Context manager forcing the transposed Swin block layout on/off."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        global USE_TRANSPOSED_BLOCKS
        self.prev = USE_TRANSPOSED_BLOCKS
        USE_TRANSPOSED_BLOCKS = self.enabled

    def __exit__(self, *exc):
        global USE_TRANSPOSED_BLOCKS
        USE_TRANSPOSED_BLOCKS = self.prev


def _layer_norm_t(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                  eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the SUBLANE (channel, axis -2) dim of (BW, C, Np):
    f32 statistics like flax nn.LayerNorm."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-2, keepdims=True)
    var = jnp.var(xf, axis=-2, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale[:, None] + bias[:, None]).astype(x.dtype)


def _dense_t(x: jnp.ndarray, kernel: jnp.ndarray,
             bias: Optional[jnp.ndarray], dtype) -> jnp.ndarray:
    """nn.Dense over the SUBLANE dim: (BW, C, Np) @ (C, D) -> (BW, D, Np)."""
    k = kernel.astype(dtype) if dtype is not None else kernel
    xd = x.astype(dtype) if dtype is not None else x
    y = jnp.einsum("wcn,cd->wdn", xd, k)
    if bias is not None:
        b = bias.astype(y.dtype) if dtype is not None else bias
        y = y + b[:, None]
    return y


class WindowAttention(nn.Module):
    """Windowed MHSA with learned relative position bias.

    Two execution paths: the XLA einsum path, and the fused Pallas kernel
    (ops/pallas_attention.py) that keeps the NxN score tensor in VMEM —
    enabled at trace time via `use_pallas_attention()`.
    """
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    qkv_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 region_ids: Optional[np.ndarray] = None,
                 transposed: bool = False,
                 n_valid: Optional[int] = None) -> jnp.ndarray:
        """`mask`: dense (nW, N, N) additive mask (XLA path / external
        callers). `region_ids`: the STATIC (nW, N) per-token shift-region
        table (window_region_ids) — the fused kernel consumes it compactly;
        the XLA path expands it to the dense mask on device. Pass one or
        the other.

        `transposed`: x is (BW, C, Np) — tokens in lanes, Np a multiple of
        128, `n_valid` real tokens — and the result keeps that layout. The
        qkv/proj projections contract the sublane dim and the fused kernel
        consumes the (BW, 3, H, Dh, Np) reshape directly (zero relayouts).
        Param tree identical to the standard path (DenseParams mirrors
        nn.Dense)."""
        if transposed:
            from diff_unet_tpu.ops.blocks import DenseParams
            from diff_unet_tpu.ops.pallas_attention import (
                fused_window_attention_qkv,
                reference_window_attention,
            )

            bw, c, npad = x.shape
            h = self.num_heads
            head_dim = c // h
            n = n_valid if n_valid is not None else npad
            table_size = int(np.prod([2 * s - 1 for s in self.window_size]))
            bias_table = self.param(
                "relative_position_bias_table",
                nn.initializers.truncated_normal(0.02), (table_size, h),
            )
            rpi = relative_position_index(tuple(self.window_size))[:n, :n]
            rel_bias = bias_table[jnp.asarray(rpi.reshape(-1))]
            rel_bias = rel_bias.reshape(n, n, h).transpose(2, 0, 1)
            bias_p = jnp.pad(
                rel_bias, [(0, 0), (0, npad - n), (0, npad - n)])

            k_qkv, b_qkv = DenseParams(3 * c, c, use_bias=self.qkv_bias,
                                       name="qkv")()
            k_proj, b_proj = DenseParams(c, c, name="proj")()
            nw = 1 if region_ids is None else region_ids.shape[0]

            qkvt = _dense_t(x, k_qkv, b_qkv, self.dtype)
            qkvt = qkvt.reshape(bw, 3, h, head_dim, npad)   # free reshape
            use_pallas = _pallas_attention_auto(bw * h)
            if use_pallas:
                out_t = fused_window_attention_qkv(
                    qkvt, bias_p, n, region_ids, n_windows=nw)
            else:
                q = qkvt[:, 0].transpose(0, 1, 3, 2)        # (bw,h,Np,dh)
                k = qkvt[:, 1].transpose(0, 1, 3, 2)
                v = qkvt[:, 2].transpose(0, 1, 3, 2)
                from diff_unet_tpu.ops.pallas_attention import _dense_mask
                m = (_dense_mask(region_ids)
                     if region_ids is not None else None)
                out = reference_window_attention(q, k, v, bias_p, n, m,
                                                 n_windows=nw)
                out_t = out.transpose(0, 1, 3, 2)
            out_t = out_t.reshape(bw, c, npad)              # free reshape
            return _dense_t(out_t, k_proj, b_proj, self.dtype)

        b, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        table_size = int(np.prod([2 * s - 1 for s in self.window_size]))
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02), (table_size, h),
        )
        rpi = relative_position_index(tuple(self.window_size))[:n, :n]

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        rel_bias = bias_table[jnp.asarray(rpi.reshape(-1))]
        rel_bias = rel_bias.reshape(n, n, h).transpose(2, 0, 1)

        # the fused kernel needs the compact region-id table for shifted
        # windows; an externally supplied dense mask routes to the XLA path.
        # In auto mode tiny window batches (stage 4: bw=8, unshifted) are
        # grid-launch bound and measure ~0.9x vs XLA
        # (benchmarks/attention_probe.py) — route them to the einsum path;
        # an explicit use_pallas_attention() force still wins.
        use_pallas = mask is None and _pallas_attention_auto(b * h)
        if use_pallas:
            from diff_unet_tpu.ops.pallas_attention import (
                fused_window_attention_t,
            )
            n_pad = -(-n // 128) * 128
            # ONE relayout into the kernel-native (3, BW, H, Dh, N) layout
            # (tokens to lanes) with the 128-pad fused into it
            qkvt = jnp.transpose(
                qkv.reshape(b, n, 3, h, head_dim), (2, 0, 3, 4, 1))
            qkvt = jnp.pad(qkvt, [(0, 0)] * 4 + [(0, n_pad - n)])
            bias_p = jnp.pad(
                rel_bias, [(0, 0), (0, n_pad - n), (0, n_pad - n)]
            )
            nw = 1 if region_ids is None else region_ids.shape[0]
            out_t = fused_window_attention_t(
                qkvt[0], qkvt[1], qkvt[2], bias_p, n, region_ids,
                n_windows=nw,
            )
            # ONE relayout back: (BW, H, Dh, N) -> (BW, N, H*Dh)
            out = jnp.transpose(out_t[..., :n], (0, 3, 1, 2))
            out = out.reshape(b, n, c)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)
        else:
            qkv = qkv.reshape(b, n, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            if mask is None and region_ids is not None:
                ids = jnp.asarray(region_ids)
                mask = jnp.where(ids[:, None, :] != ids[:, :, None],
                                 -100.0, 0.0)
            attn = jnp.einsum(
                "bhnd,bhmd->bhnm", q * (head_dim ** -0.5), k,
                preferred_element_type=jnp.float32,
            )
            attn = attn + rel_bias[None].astype(attn.dtype)
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(b // nw, nw, h, n, n)
                attn = attn + mask[None, :, None, :, :].astype(attn.dtype)
                attn = attn.reshape(b, h, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
            out = jnp.einsum(
                "bhnm,bhmd->bhnd", attn, v,
                preferred_element_type=jnp.float32,
            ).astype(q.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinMlp(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, transposed: bool = False):
        hidden = int(self.dim * self.mlp_ratio)
        if transposed:
            from diff_unet_tpu.ops.blocks import DenseParams
            k1, b1 = DenseParams(hidden, self.dim, name="fc1")()
            k2, b2 = DenseParams(self.dim, hidden, name="fc2")()
            h = _dense_t(x, k1, b1, self.dtype)
            h = nn.gelu(h, approximate=False)
            return _dense_t(h, k2, b2, self.dtype)
        h = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        # exact (erf) GELU: the reference uses torch nn.GELU via MONAI
        # MLPBlock (transformer.py:338,378), whose default is erf, not the
        # tanh approximation flax defaults to.
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class SwinTransformerBlock(nn.Module):
    """norm1 -> (shift) window attention -> +residual -> norm2 -> MLP
    (transformer.py:319-482; drop-path/dropout rates are 0 in the live
    config and therefore omitted)."""
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    shift_size: Tuple[int, int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 window_ctx: Optional[dict] = None) -> jnp.ndarray:
        """Standard entry: x is (B, D, H, W, C) spatial. With `window_ctx`
        (the window-resident stage path, BasicLayer), x is the transposed
        window tensor (BW, C, Np) already in this block's shift layout and
        the ctx carries the static geometry:
        {region_ids, vm, n, b} — the block runs only its body and returns
        the window tensor."""
        if window_ctx is not None:
            return self._window_body(x, **window_ctx)
        b, d, h, w, c = x.shape
        ws, ss = get_window_size((d, h, w), self.window_size,
                                 self.shift_size)
        if _transposed_enabled(c):
            return self._forward_transposed(x, ws, ss)
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        pad = [(0, 0)] + [
            (0, (ws[i] - (d, h, w)[i] % ws[i]) % ws[i]) for i in range(3)
        ] + [(0, 0)]
        x = jnp.pad(x, pad)
        dp, hp, wp = x.shape[1:4]

        if any(s > 0 for s in ss):
            x = jnp.roll(x, shift=tuple(-s for s in ss), axis=(1, 2, 3))
            # static numpy (nW, N) region-id table; WindowAttention expands
            # it to the dense mask only on the XLA path
            region_ids = window_region_ids((dp, hp, wp), ws, ss)
        else:
            region_ids = None
        windows = window_partition(x, ws)
        # the bias table/index are sized by the UNCLAMPED window (reference
        # builds them in __init__ for window 7^3 and slices [:n, :n] in
        # forward, attention.py:50-105) — keeps param shapes identical to
        # the reference at stages whose dims are smaller than the window.
        attn = WindowAttention(self.dim, self.num_heads,
                               tuple(self.window_size),
                               self.qkv_bias, dtype=self.dtype,
                               name="attn")(windows, region_ids=region_ids)
        x = window_reverse(attn, ws, (b, dp, hp, wp))
        if any(s > 0 for s in ss):
            x = jnp.roll(x, shift=tuple(ss), axis=(1, 2, 3))
        x = x[:, :d, :h, :w, :]

        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return x + SwinMlp(self.dim, self.mlp_ratio, dtype=self.dtype,
                           name="mlp")(y)

    def _forward_transposed(self, x: jnp.ndarray, ws, ss) -> jnp.ndarray:
        """The whole block in the transposed window layout (BW, C, Np):
        ONE relayout in (partition_t), one out (reverse_t); LayerNorm /
        qkv / proj / MLP / residuals all run lane-packed and the fused
        attention kernel consumes its native layout with zero relayouts.
        Numerics identical to the standard path on real tokens (pad tokens
        are masked at the attention input and cropped at the exit); param
        tree identical (DenseParams/LayerNormParams mirror nn.Dense/
        nn.LayerNorm)."""
        b, d, h, w, c = x.shape
        pad = [(0, 0)] + [
            (0, (ws[i] - (d, h, w)[i] % ws[i]) % ws[i]) for i in range(3)
        ] + [(0, 0)]
        x = jnp.pad(x, pad)
        dp, hp, wp = x.shape[1:4]
        if any(s > 0 for s in ss):
            x = jnp.roll(x, shift=tuple(-s for s in ss), axis=(1, 2, 3))
            region_ids = window_region_ids((dp, hp, wp), tuple(ws),
                                           tuple(ss))
        else:
            region_ids = None

        n = ws[0] * ws[1] * ws[2]
        npad = -(-n // 128) * 128
        wt = window_partition_t(x, ws, npad)
        vm = window_valid_mask((dp, hp, wp), (d, h, w), tuple(ws),
                               tuple(ss), npad)
        wt = self._window_body(wt, region_ids, vm, n, b)

        x = window_reverse_t(wt, ws, (b, dp, hp, wp))
        if any(s > 0 for s in ss):
            x = jnp.roll(x, shift=tuple(ss), axis=(1, 2, 3))
        return x[:, :d, :h, :w, :]

    def _window_body(self, wt: jnp.ndarray, region_ids, vm, n: int,
                     b: int) -> jnp.ndarray:
        """LN1 -> mask -> attention -> +res -> LN2 -> MLP -> +res, entirely
        in the transposed window layout (BW, C, Np)."""
        from diff_unet_tpu.ops.blocks import LayerNormParams

        bw, c, npad = wt.shape
        s1, b1 = LayerNormParams(c, name="norm1")()
        h1 = _layer_norm_t(wt, s1, b1)
        if vm is not None:
            nw = vm.shape[0]
            h1 = (h1.reshape(b, nw, c, npad)
                  * jnp.asarray(vm)[None, :, None, :].astype(h1.dtype))
            h1 = h1.reshape(-1, c, npad)
        attn = WindowAttention(self.dim, self.num_heads,
                               tuple(self.window_size),
                               self.qkv_bias, dtype=self.dtype,
                               name="attn")(h1, region_ids=region_ids,
                                            transposed=True, n_valid=n)
        wt = wt + attn
        s2, b2 = LayerNormParams(c, name="norm2")()
        y = _layer_norm_t(wt, s2, b2)
        y = SwinMlp(self.dim, self.mlp_ratio, dtype=self.dtype,
                    name="mlp")(y, transposed=True)
        return wt + y


class PatchMerging(nn.Module):
    """v0.9.0 'merging': 8-slice concat -> LayerNorm -> Linear(8c -> 2c).

    Preserves the duplicated (0,1,0)/(0,0,1) slice quirk of the reference
    (patch.py:69-94) so pretrained torch weights transfer numerically.
    Set v2=True for the corrected PatchMergingV2 (patch.py:19-66).
    """
    dim: int
    v2: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, d, h, w, c = x.shape
        pad = [(0, 0), (0, d % 2), (0, h % 2), (0, w % 2), (0, 0)]
        if any(p != (0, 0) for p in pad):
            x = jnp.pad(x, pad)
        if self.v2:
            import itertools
            parts = [
                x[:, i::2, j::2, k::2, :]
                for i, j, k in itertools.product(range(2), repeat=3)
            ]
        else:
            idx = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                   (1, 0, 1), (0, 1, 0), (0, 0, 1), (1, 1, 1)]
            parts = [x[:, i::2, j::2, k::2, :] for i, j, k in idx]
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class PatchEmbed(nn.Module):
    """Non-overlapping conv patch embedding (patch_embed.py:23-64).

    `packed_groups` (a list of ops.packed.InGroup) marks the input as a
    pack-2 tensor whose packed-channel layout those groups describe; the
    stride-2 patch conv then consumes one packed column per output position
    (ops/packed.py:packed_patch_embed2) and emits the usual UNPACKED
    half-resolution embedding. Parameter tree identical either way."""
    embed_dim: int
    patch_size: Tuple[int, int, int] = (2, 2, 2)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, packed_groups=None) -> jnp.ndarray:
        if packed_groups is not None:
            from diff_unet_tpu.ops import packed as pk
            from diff_unet_tpu.ops.blocks import ConvParams
            assert tuple(self.patch_size) == (2, 2, 2), self.patch_size
            # ORIGINAL input channels (slices address the unpacked Cin
            # range; every original channel appears once per w-offset)
            cin = max(sl.stop for _, sl in packed_groups)
            k, b = ConvParams(self.embed_dim, cin,
                              kernel=tuple(self.patch_size), name="proj")()
            return pk.packed_patch_embed2(x, k, b, packed_groups,
                                          dtype=self.dtype)
        return nn.Conv(self.embed_dim, kernel_size=self.patch_size,
                       strides=self.patch_size, padding="VALID",
                       dtype=self.dtype, name="proj")(x)


class BasicLayer(nn.Module):
    """One Swin stage: `depth` blocks (alternating no-shift/shift) + merge
    (transformer.py:24-121)."""
    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int]
    downsample: bool = True
    merging_v2: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shift = tuple(s // 2 for s in self.window_size)
        if _transposed_enabled(x.shape[-1]):
            x = self._forward_window_resident(x, shift)
        else:
            for i in range(self.depth):
                x = SwinTransformerBlock(
                    dim=self.dim, num_heads=self.num_heads,
                    window_size=tuple(self.window_size),
                    shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                    dtype=self.dtype, name=f"blocks_{i}",
                )(x)
        if self.downsample:
            x = PatchMerging(self.dim, v2=self.merging_v2, dtype=self.dtype,
                             name="downsample")(x)
        return x

    def _forward_window_resident(self, x: jnp.ndarray,
                                 shift) -> jnp.ndarray:
        """The whole stage in the transposed window layout: partition ONCE,
        run every block's body on the window tensor, hop between shift
        layouts with the MXU permutation kernel (ops/pallas_shift.py — the
        XLA alternative re-materialises the spatial tensor twice per hop),
        reverse ONCE at the end."""
        from diff_unet_tpu.ops.pallas_shift import shift_windows_t

        b, d, h, w, c = x.shape
        ws, ss = get_window_size((d, h, w), self.window_size, shift)
        pad = [(0, 0)] + [
            (0, (ws[i] - (d, h, w)[i] % ws[i]) % ws[i]) for i in range(3)
        ] + [(0, 0)]
        x = jnp.pad(x, pad)
        dp, hp, wp = x.shape[1:4]
        grid_dims = (dp // ws[0], hp // ws[1], wp // ws[2])
        n = ws[0] * ws[1] * ws[2]
        npad = -(-n // 128) * 128

        wt = window_partition_t(x, ws, npad)
        cur = (0, 0, 0)
        for i in range(self.depth):
            blk = (0, 0, 0) if i % 2 == 0 else tuple(ss)
            if blk != cur:
                delta = tuple(bi - ci for bi, ci in zip(blk, cur))
                wt = shift_windows_t(wt, tuple(ws), delta, grid_dims, b,
                                     use_pallas=_pallas_attention_enabled())
                cur = blk
            region_ids = (window_region_ids((dp, hp, wp), tuple(ws), blk)
                          if any(s > 0 for s in blk) else None)
            vm = window_valid_mask((dp, hp, wp), (d, h, w), tuple(ws),
                                   blk, npad)
            wt = SwinTransformerBlock(
                dim=self.dim, num_heads=self.num_heads,
                window_size=tuple(self.window_size),
                shift_size=blk, dtype=self.dtype, name=f"blocks_{i}",
            )(wt, window_ctx={"region_ids": region_ids, "vm": vm,
                              "n": n, "b": b})

        x = window_reverse_t(wt, ws, (b, dp, hp, wp))
        if any(s > 0 for s in cur):
            x = jnp.roll(x, shift=tuple(cur), axis=(1, 2, 3))
        return x[:, :d, :h, :w, :]


def _stage_layer_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Non-affine layer norm over channels (proj_out, transformer.py:258-271)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)


class SwinTransformer(nn.Module):
    """4-stage Swin ViT returning all five stage outputs, with optional
    per-stage timestep injection (transformer.py:124-316)."""
    embed_dim: int
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (7, 7, 7)
    patch_size: Tuple[int, int, int] = (2, 2, 2)
    time_conditioned: bool = False
    normalize: bool = True
    merging_v2: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 temb: Optional[jnp.ndarray] = None,
                 packed_groups=None) -> list[jnp.ndarray]:
        from diff_unet_tpu.ops.blocks import swish

        def t_add(h, i, dim):
            if not self.time_conditioned or temb is None:
                return h
            proj = nn.Dense(dim, dtype=self.dtype,
                            name=f"t_proj_{i}")(swish(temb))
            return h + proj[:, None, None, None, :].astype(h.dtype)

        x0 = PatchEmbed(self.embed_dim, tuple(self.patch_size),
                        dtype=self.dtype, name="patch_embed")(x, packed_groups)
        x0 = t_add(x0, 0, self.embed_dim)
        outs = [_stage_layer_norm(x0) if self.normalize else x0]

        h = x0
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = int(self.embed_dim * 2 ** i)
            h = BasicLayer(
                dim=dim, depth=depth, num_heads=heads,
                window_size=tuple(self.window_size), downsample=True,
                merging_v2=self.merging_v2, dtype=self.dtype,
                name=f"layers{i + 1}",
            )(h)
            h = t_add(h, i + 1, dim * 2)
            outs.append(_stage_layer_norm(h) if self.normalize else h)
        return outs
