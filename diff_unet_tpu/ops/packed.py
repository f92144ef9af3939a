"""Channel-packed ("pack2") execution for C<128 conv levels on TPU.

Why: v5e tiles the minor dimension to 128 lanes. A channel-last activation
with C=64 wastes half of every (8,128)/(16,128) tile — measured on-chip,
XLA's 3D conv sustains ~54 TF/s at C=64@96^3 versus ~146-153 TF/s at C=128
(see BASELINE.md). Folding f adjacent W positions into the channel dimension
(a pure row-major reshape: (N,D,H,W,C) -> (N,D,H,W/f, f*C)) makes every
level-0/1 tensor 128-lane-dense, roughly halving both HBM footprint and
conv wall-clock for the two C=64 pyramid levels that hold ~82% of the
model's FLOPs.

A k-wide conv in packed space is still a conv: its packed kernel is a
block-structured assembly of the ORIGINAL weights, so parameters (and
checkpoints) are identical between packed and unpacked execution —
`assemble_packed_kernel` scatters W[kw] blocks by the relation
kw = f*q + i - o (input w-offset i, output w-offset o, packed tap q), with
unreachable (i, o, q) combinations exactly zero. Packed outputs are
bit-compatible with unpacked ones up to bf16 reduction order (adding
structural zeros is exact in floating point).

Everything here is layout math + jnp; no reference code exists for this
(the reference is plain torch Conv3d, models/basic_unet/denoiser.py:23-108).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

InGroup = Tuple[int, slice]   # (w_offset inside the packed column, Cin slice)


def pack_w(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(N, D, H, W, C) -> (N, D, H, W/f, f*C); packed channel = w_off*C + c.

    A pure row-major reshape — no transpose, no data movement in logical
    order (the physical tiled layout changes, which is the point)."""
    n, d, h, w, c = x.shape
    assert w % f == 0, (w, f)
    return x.reshape(n, d, h, w // f, f * c)


def unpack_w(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of pack_w."""
    n, d, h, wp, fc = x.shape
    assert fc % f == 0, (fc, f)
    return x.reshape(n, d, h, wp * f, fc // f)


def default_groups(cin: int, f: int) -> List[InGroup]:
    """Packed-channel layout of pack_w applied to a single tensor."""
    return [(i, slice(0, cin)) for i in range(f)]


def concat_groups(cins: Sequence[int], f: int) -> List[InGroup]:
    """Packed-channel layout of jnp.concatenate([pack_w(a), pack_w(b), ...]):
    the groups run tensor-major, w-offset-minor, and each slice addresses the
    ORIGINAL (unpacked-concat) Cin range of its tensor."""
    groups: List[InGroup] = []
    start = 0
    for c in cins:
        for i in range(f):
            groups.append((i, slice(start, start + c)))
        start += c
    return groups


def assemble_packed_kernel(
    w: jnp.ndarray,             # (kd, kh, kw, Cin, Cout) original DHWIO
    f: int,
    in_groups: Optional[List[InGroup]] = None,
) -> jnp.ndarray:
    """Original conv weights -> packed-space conv weights.

    Returns (kd, kh, KQ, Cpacked_in, f*Cout) where KQ is the packed tap
    count along W. Entry [.., q, rows(group g=(i, sl)), o*Cout:(o+1)*Cout]
    equals w[.., f*(q - q0) ... kw_offset, sl, :] for
    kw_offset = f*(q - center) + i - o within the original kernel, else 0.
    """
    kd, kh, kw_size, cin, cout = w.shape
    assert kw_size % 2 == 1
    half = kw_size // 2
    if in_groups is None:
        in_groups = default_groups(cin, f)
    # packed taps q such that some (i, o) reaches an original tap
    qmax = (half + f - 1) // f
    kq = 2 * qmax + 1

    rows = sum(sl.stop - sl.start for _, sl in in_groups)
    out = jnp.zeros((kd, kh, kq, rows, f * cout), w.dtype)
    r0 = 0
    for (i, sl) in in_groups:
        size = sl.stop - sl.start
        for o in range(f):
            for q in range(-qmax, qmax + 1):
                kw = f * q + i - o
                if -half <= kw <= half:
                    out = out.at[
                        :, :, q + qmax, r0:r0 + size,
                        o * cout:(o + 1) * cout,
                    ].set(w[:, :, kw + half, sl, :])
        r0 += size
    return out


def packed_conv(
    x_p: jnp.ndarray,           # (N, D, H, W/f, Cpacked_in)
    w: jnp.ndarray,             # ORIGINAL (kd, kh, kw, Cin, Cout)
    b: Optional[jnp.ndarray],   # (Cout,) or None
    f: int,
    in_groups: Optional[List[InGroup]] = None,
    dtype=None,
) -> jnp.ndarray:
    """SAME conv in packed space; zero-padding packed columns is exact
    because out-of-range original taps land on structurally-zero weight
    blocks."""
    if dtype is not None:
        x_p = x_p.astype(dtype)
        w = w.astype(dtype)
    k = assemble_packed_kernel(w, f, in_groups)
    kd, kh, kq = k.shape[:3]
    y = lax.conv_general_dilated(
        x_p, k, (1, 1, 1),
        padding=((kd // 2,) * 2, (kh // 2,) * 2, (kq // 2,) * 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x_p.dtype,
    )
    if b is not None:
        y = y + jnp.tile(b, f).astype(y.dtype)
    return y


def packed_instance_norm(
    x_p: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, f: int,
    epsilon: float = 1e-5, dtype=None,
) -> jnp.ndarray:
    """InstanceNorm over the ORIGINAL spatial extent: per-packed-channel
    statistics from the f w-offset blocks are averaged back to per-original-
    channel statistics (every block covers the same voxel count)."""
    c = x_p.shape[-1] // f
    axes = tuple(range(1, x_p.ndim - 1))
    sdt = jnp.promote_types(x_p.dtype, jnp.float32)
    mean_p = jnp.mean(x_p, axis=axes, keepdims=False, dtype=sdt)
    ex2_p = jnp.mean(lax.square(x_p.astype(sdt)), axis=axes)
    # (N, f*C) -> (N, f, C) -> merge blocks
    mean = jnp.mean(mean_p.reshape(-1, f, c), axis=1)
    ex2 = jnp.mean(ex2_p.reshape(-1, f, c), axis=1)
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    inv = lax.rsqrt(var + epsilon)
    a = inv * scale.astype(sdt)
    bb = bias.astype(sdt) - mean * a
    a_p = jnp.tile(a, (1, f)).astype(x_p.dtype)
    b_p = jnp.tile(bb, (1, f)).astype(x_p.dtype)
    shape = (x_p.shape[0],) + (1,) * (x_p.ndim - 2) + (x_p.shape[-1],)
    y = x_p * a_p.reshape(shape) + b_p.reshape(shape)
    return y.astype(dtype or x_p.dtype)


def packed_layer_norm(
    x_p: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, f: int,
    epsilon: float = 1e-6, dtype=None,
) -> jnp.ndarray:
    """LayerNorm over the REAL channel axis of a pack-f tensor.

    Each packed column holds f independent voxels, so per-w-offset-block
    channel statistics are exact per-voxel statistics — no cross-block
    averaging needed (unlike packed_instance_norm, whose reduction spans
    the spatial extent). The blocks are normalized as LANE SLICES of the
    packed channel axis, NOT via an (…, f, C) reshape: splitting the lane
    dimension relayouts the whole tensor twice per norm (measured 24.3 vs
    40.3 DDIM steps/s on SmoothDiffUNet sw=8 — worse than not packing at
    all), while slices stay elementwise on lane subsets and fuse.
    Mirrors nn.LayerNorm (epsilon 1e-6, f32 stats)."""
    c = x_p.shape[-1] // f
    sdt = jnp.promote_types(x_p.dtype, jnp.float32)
    out_dt = dtype or x_p.dtype
    s = scale.astype(sdt)
    b = bias.astype(sdt)
    halves = []
    for i in range(f):
        xi = x_p[..., i * c:(i + 1) * c].astype(sdt)
        mean = jnp.mean(xi, axis=-1, keepdims=True)
        var = jnp.mean(lax.square(xi - mean), axis=-1, keepdims=True)
        y = (xi - mean) * lax.rsqrt(var + epsilon)
        halves.append((y * s + b).astype(out_dt))
    return jnp.concatenate(halves, axis=-1)


def packed_maxpool2(x_p: jnp.ndarray, f: int = 2,
                    repack: bool = True) -> jnp.ndarray:
    """2x2x2 max-pool of a pack-2 tensor.

    The W-pair reduction is exactly the max over the two w-offset blocks of
    each packed column; D/H pool spatially. Returns the next level packed
    (repack=True) or unpacked (repack=False, e.g. at the boundary to an
    unpacked level)."""
    assert f == 2, "pools are implemented for pack factor 2"
    n, d, h, wp, fc = x_p.shape
    c = fc // f
    blocks = x_p.reshape(n, d, h, wp, f, c)
    m = jnp.max(blocks, axis=4)                      # (N, D, H, W/2, C)
    # -inf identity (bf16 has inf): a finite finfo.min init defeats JAX's
    # reduce_window-max gradient rule and kills reverse-mode autodiff
    m = lax.reduce_window(
        m, -jnp.inf, lax.max, (1, 2, 2, 1, 1), (1, 2, 2, 1, 1), "VALID",
    )                                                # (N, D/2, H/2, W/2, C)
    if repack:
        return pack_w(m, f)
    return m


def deconv2_enter_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose (2,2,2,Cin,Cout) -> packed-output form (2,2,1,Cin,2Cout).

    out(2i+dd, 2j+dh, 2k+dw) <- in(i, j, k): the W tap dw becomes the packed
    block, so the packed form is a (2,2,1)-kernel stride-(2,2,1) transposed
    conv with K[dd,dh,0][ci, dw*Cout+co] = w[dd,dh,dw,ci,co].
    lax.conv_transpose applies kernels mirror-imaged over SPATIAL dims;
    moving the W tap into channels loses that mirroring, so the blocks take
    the W taps in reversed order (pinned by tests/test_packed.py)."""
    assert w.shape[:3] == (2, 2, 2)
    k = jnp.concatenate([w[:, :, 1], w[:, :, 0]], axis=-1)  # (2,2,Cin,2Cout)
    return k[:, :, None]                                     # (2,2,1,..)


def deconv2_packed_kernel(w: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """ConvTranspose (2,2,2,Cin,Cout) -> packed-in/packed-out form
    (2,2,2, f*Cin, f*Cout).

    Packed-out column 2k+s draws only from input block s of packed-in
    column k, so along packed W it is a width-2 stride-2 transposed conv
    whose kernel tap s is block-diagonal in (input block == s):
    K[dd,dh,s][i*Cin+ci, dw*Cout+co] = w[dd,dh,dw,ci,co] * (i == s).
    Both the channel-folded W taps and the packed-W spatial tap are
    mirror-imaged relative to the derivation (lax.conv_transpose flips
    spatial kernel dims); pinned by tests/test_packed.py."""
    assert f == 2 and w.shape[:3] == (2, 2, 2)
    cin, cout = w.shape[3:]
    k = jnp.zeros((2, 2, 2, f * cin, f * cout), w.dtype)
    for s in range(2):          # input block feeding packed-W tap (1 - s)
        for dw in range(2):     # output block
            k = k.at[:, :, 1 - s, s * cin:(s + 1) * cin,
                     dw * cout:(dw + 1) * cout].set(w[:, :, 1 - dw])
    return k


def packed_deconv2_enter(
    x: jnp.ndarray,             # UNPACKED (N, D, H, W, Cin)
    w: jnp.ndarray,             # ORIGINAL ConvTranspose (2, 2, 2, Cin, Cout)
    b: Optional[jnp.ndarray],
    f: int = 2,
    dtype=None,
) -> jnp.ndarray:
    """k2s2 deconv whose OUTPUT lands directly in pack-2 layout
    (see deconv2_enter_kernel)."""
    assert f == 2
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    k = deconv2_enter_kernel(w)
    y = lax.conv_transpose(
        x, k, (2, 2, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        y = y + jnp.tile(b, f).astype(y.dtype)
    return y


def packed_deconv2_packed(
    x_p: jnp.ndarray,           # PACKED (N, D, H, W/2, 2*Cin)
    w: jnp.ndarray,             # ORIGINAL ConvTranspose (2, 2, 2, Cin, Cout)
    b: Optional[jnp.ndarray],
    f: int = 2,
    dtype=None,
) -> jnp.ndarray:
    """k2s2 deconv from pack-2 input to pack-2 output
    (see deconv2_packed_kernel)."""
    assert f == 2
    if dtype is not None:
        x_p = x_p.astype(dtype)
        w = w.astype(dtype)
    k = deconv2_packed_kernel(w, f)
    y = lax.conv_transpose(
        x_p, k, (2, 2, 2), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        y = y + jnp.tile(b, f).astype(y.dtype)
    return y


def patch_embed2_kernel(
    w: jnp.ndarray,             # ORIGINAL (2, 2, 2, Cin, Cout) DHWIO
    in_groups: List[InGroup],
) -> jnp.ndarray:
    """Patch-embed conv (k=2, s=2, VALID) -> packed-INPUT form.

    A stride-2 width-2 conv along W consumes exactly one pack-2 column per
    output position (original taps w=2k, 2k+1 are the two blocks of packed
    column k), so in packed space it is a width-1 stride-1 conv whose kernel
    folds the W tap into input channels: K[dd, dh, 0, rows(g=(i, sl)), :] =
    w[dd, dh, i, sl, :]. The OUTPUT is unpacked at half resolution — the
    layout the Swin stages consume (ops/swin.py PatchEmbed)."""
    assert w.shape[:3] == (2, 2, 2)
    cout = w.shape[-1]
    rows = sum(sl.stop - sl.start for _, sl in in_groups)
    k = jnp.zeros((2, 2, 1, rows, cout), w.dtype)
    r0 = 0
    for (i, sl) in in_groups:
        size = sl.stop - sl.start
        k = k.at[:, :, 0, r0:r0 + size, :].set(w[:, :, i, sl, :])
        r0 += size
    return k


def packed_patch_embed2(
    x_p: jnp.ndarray,           # PACKED (N, D, H, W/2, Cpacked_in)
    w: jnp.ndarray,             # ORIGINAL (2, 2, 2, Cin, Cout)
    b: Optional[jnp.ndarray],
    in_groups: Optional[List[InGroup]] = None,
    dtype=None,
) -> jnp.ndarray:
    """PatchEmbed (conv k2 s2 VALID) from pack-2 input to UNPACKED
    half-resolution output (see patch_embed2_kernel)."""
    if dtype is not None:
        x_p = x_p.astype(dtype)
        w = w.astype(dtype)
    if in_groups is None:
        in_groups = default_groups(w.shape[3], 2)
    k = patch_embed2_kernel(w, in_groups)
    y = lax.conv_general_dilated(
        x_p, k, (2, 2, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x_p.dtype,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def norm_affine_from_stats(
    stats: jnp.ndarray,         # (N, 2, f*C): [sum, sumsq] per packed chan
    scale: jnp.ndarray,         # (C,) InstanceNorm gamma
    bias: jnp.ndarray,          # (C,) InstanceNorm beta
    f: int,
    count: int,                 # voxels per packed block (= D*H*Wp)
    epsilon: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """InstanceNorm as a per-packed-channel affine from kernel-side moments.

    Consumes the (sum, sum-of-squares) epilogue of the Pallas packed conv
    (pallas_packed_conv.conv3x3_packed_aug_pipelined with_stats=True) and
    returns (a, b), both (N, f*C) f32, such that `x*a + b` equals
    `packed_instance_norm(x, scale, bias, f)` — the f w-offset blocks'
    moments are merged to per-original-channel statistics exactly as there.
    """
    c = stats.shape[-1] // f
    s1 = jnp.sum(stats[:, 0].reshape(-1, f, c), axis=1)
    s2 = jnp.sum(stats[:, 1].reshape(-1, f, c), axis=1)
    denom = float(f * count)
    mean = s1 / denom
    var = jnp.maximum(s2 / denom - jnp.square(mean), 0.0)
    inv = lax.rsqrt(var + epsilon)
    a = inv * scale.astype(jnp.float32)
    b = bias.astype(jnp.float32) - mean * a
    return jnp.tile(a, (1, f)), jnp.tile(b, (1, f))


# ---- W8A8 int8 variants (ops/int8.py primitives) ----


def quantize_packed_kernel(
    w: jnp.ndarray, f: int, in_groups: Optional[List[InGroup]] = None,
):
    """Assemble the packed-space kernel and quantize it (per-packed-output-
    channel scales). Structural-zero weight blocks quantize to exact zeros,
    so packed-space semantics are preserved."""
    from diff_unet_tpu.ops import int8 as q
    return q.quantize_kernel(assemble_packed_kernel(
        w.astype(jnp.float32), f, in_groups))


def packed_conv_int8(
    x_p: jnp.ndarray,           # (N, D, H, W/f, Cpacked_in) float
    w: Optional[jnp.ndarray],   # ORIGINAL (kd, kh, kw, Cin, Cout) float
    b: Optional[jnp.ndarray],   # (Cout,) or None
    f: int,
    in_groups: Optional[List[InGroup]] = None,
    out_dtype=jnp.bfloat16,
    *,
    wq=None,                    # optional precomputed (int8 kernel, scales)
    sa=None,                    # optional static activation scale
) -> jnp.ndarray:
    """W8A8 packed conv: int8 MXU path (v5e runs int8 at ~2x the bf16 rate —
    measured 299 vs 157 TOPS at the L0 shape, BASELINE.md r2).

    Weights quantize per-packed-output-channel — offline via `wq` (the
    checkpoint-load path, VERDICT r2 weak #4b) or in-graph from `w`.
    Activations quantize per-tensor — with a calibrated static `sa` (lets
    XLA fuse scale+round+cast into the preceding elementwise pass) or a
    dynamic abs-max when `sa` is None.
    """
    from diff_unet_tpu.ops import int8 as q
    if wq is None:
        wq = quantize_packed_kernel(w, f, in_groups)
    kq, sw = wq
    if sa is None:
        sa = q.act_scale(x_p)
    acc = q.conv_int8(q.quantize_act(x_p, sa), kq)
    b_p = jnp.tile(b, f) if b is not None else None
    return q.rescale(acc, sa, sw, b_p, out_dtype)


def packed_deconv2_enter_int8(
    x, w, b, f: int = 2, out_dtype=jnp.bfloat16, *, wq=None, sa=None,
):
    """int8 variant of packed_deconv2_enter."""
    from diff_unet_tpu.ops import int8 as q
    assert f == 2
    if wq is None:
        wq = q.quantize_kernel(deconv2_enter_kernel(w.astype(jnp.float32)))
    kq, sw = wq
    if sa is None:
        sa = q.act_scale(x)
    acc = q.deconv2_int8(q.quantize_act(x, sa), kq, (2, 2, 1))
    b_p = jnp.tile(b, f) if b is not None else None
    return q.rescale(acc, sa, sw, b_p, out_dtype)


def packed_deconv2_packed_int8(
    x_p, w, b, f: int = 2, out_dtype=jnp.bfloat16, *, wq=None, sa=None,
):
    """int8 variant of packed_deconv2_packed."""
    from diff_unet_tpu.ops import int8 as q
    assert f == 2
    if wq is None:
        wq = q.quantize_kernel(
            deconv2_packed_kernel(w.astype(jnp.float32), f))
    kq, sw = wq
    if sa is None:
        sa = q.act_scale(x_p)
    acc = q.deconv2_int8(q.quantize_act(x_p, sa), kq, (2, 2, 2))
    b_p = jnp.tile(b, f) if b is not None else None
    return q.rescale(acc, sa, sw, b_p, out_dtype)
