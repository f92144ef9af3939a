"""3D masked-image-modeling utilities.

Capability parity with the reference's HybridMIM support utilities
(models/basic_unet/pretrained/utils.py:6-166): patchify/unpatchify 3D,
random masking, block mask generation (`mask_func`), region mask labels, and
random patch pickers — as pure JAX functions with explicit PRNG keys
(replacing torch global RNG), channel-last.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, N, patch^3 * C) (pretrained/utils.py patchify)."""
    b, d, h, w, c = x.shape
    assert d % patch == 0 and h % patch == 0 and w % patch == 0
    x = x.reshape(b, d // patch, patch, h // patch, patch, w // patch,
                  patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, (d // patch) * (h // patch) * (w // patch),
                     patch ** 3 * c)


def unpatchify(tokens: jnp.ndarray, grid: Tuple[int, int, int],
               patch: int, channels: int = 1) -> jnp.ndarray:
    """Inverse of `patchify` given the (gd, gh, gw) patch grid."""
    b, n, _ = tokens.shape
    gd, gh, gw = grid
    assert n == gd * gh * gw
    x = tokens.reshape(b, gd, gh, gw, patch, patch, patch, channels)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, gd * patch, gh * patch, gw * patch, channels)


def random_masking(
    tokens: jnp.ndarray, rng: jax.Array, mask_ratio: float = 0.75
):
    """Per-sample random token masking (MAE-style; pretrained/utils.py
    random_masking): returns (kept_tokens, binary_mask, restore_idx)."""
    b, n, dim = tokens.shape
    len_keep = int(n * (1.0 - mask_ratio))
    noise = jax.random.uniform(rng, (b, n))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    kept = jnp.take_along_axis(tokens, ids_keep[..., None], axis=1)
    mask = jnp.ones((b, n))
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return kept, mask, ids_restore


def block_mask(
    shape: Tuple[int, int, int], rng: jax.Array, patch: int,
    mask_ratio: float = 0.5,
) -> jnp.ndarray:
    """Voxel-space block mask: random patch-grid cells zeroed
    (pretrained/utils.py mask_func semantics: masked voxels -> 0)."""
    gd, gh, gw = (s // patch for s in shape)
    n = gd * gh * gw
    noise = jax.random.uniform(rng, (n,))
    keep = (noise >= mask_ratio).astype(jnp.float32)
    grid = keep.reshape(gd, gh, gw)
    return jnp.repeat(
        jnp.repeat(jnp.repeat(grid, patch, 0), patch, 1), patch, 2
    )


def region_mask_labels(mask: jnp.ndarray, regions: int = 2) -> jnp.ndarray:
    """Per-region masked-fraction labels (pretrained/utils.py
    get_mask_labels(v2)): split the token mask into `regions`^3 blocks and
    report the masked fraction of each."""
    b, n = mask.shape
    g = round(n ** (1 / 3))
    m = mask.reshape(b, g, g, g)
    step = g // regions
    out = []
    for i in range(regions):
        for j in range(regions):
            for k in range(regions):
                blk = m[:, i * step:(i + 1) * step, j * step:(j + 1) * step,
                        k * step:(k + 1) * step]
                out.append(jnp.mean(blk, axis=(1, 2, 3)))
    return jnp.stack(out, axis=1)


def random_patch(
    volume_shape: Tuple[int, int, int], rng: jax.Array,
    patch_size: Tuple[int, int, int],
) -> Tuple[int, ...]:
    """Random crop origin (pretrained/utils.py get_random_patch(_new))."""
    maxs = [max(s - p, 0) for s, p in zip(volume_shape, patch_size)]
    keys = jax.random.split(rng, 3)
    return tuple(
        int(jax.random.randint(k, (), 0, m + 1)) for k, m in zip(keys, maxs)
    )
