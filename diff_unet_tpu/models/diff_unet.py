"""DiffUNet — flagship diffusion segmentation model.

Parity with reference `models/diff_unet.py:9-35`: a BasicUNetEncoder image
embedder (in_channels=1) plus a BasicUNetRDenoiser over
[image, x_t] -> out_channels class logits, features (64,64,128,256,512,64),
LeakyReLU(0.1).

The reference dispatches through `Diffusion.forward(pred_type=...)`
(models/diffusion/diffusion.py:49-63); here the module exposes `embed` /
`denoise` methods and the dispatch lives in the functional
`diff_unet_tpu.api.DiffusionSegmenter`, which compiles q_sample / denoise /
ddim_sample as pure jitted functions.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from diff_unet_tpu.models.basic_unet import (
    DEFAULT_FEATURES,
    BasicUNetDenoiser,
    BasicUNetDenoiserPacked,
    BasicUNetEncoder,
    BasicUNetEncoderPacked,
    pack_embeddings,
)
from diff_unet_tpu.ops import packed as pk


class DiffUNet(nn.Module):
    out_channels: int
    in_channels: int = 1
    features: Sequence[int] = DEFAULT_FEATURES
    remat: bool = False   # block-level activation rematerialisation
    pack: int = 1         # 2 = channel-packed execution (ops/packed.py)
    quantize: bool = False  # W8A8 int8 packed convs (inference-only option)
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        if self.pack > 1:
            # packed encoder: identical param tree, levels 0-1 in pack-2
            # layout (outputs feed the packed denoiser with no repack)
            self.embed_model = BasicUNetEncoderPacked(
                features=self.features, in_channels=self.in_channels,
                pack=self.pack, quantize=self.quantize, dtype=self.dtype,
            )
        else:
            self.embed_model = BasicUNetEncoder(
                features=self.features, remat=self.remat,
                quantize=self.quantize, dtype=self.dtype
            )
        if self.pack > 1:
            # parameter tree identical to the unpacked denoiser; checkpoints
            # are interchangeable (see ops/packed.py)
            self.model = BasicUNetDenoiserPacked(
                out_channels=self.out_channels, features=self.features,
                pack=self.pack, quantize=self.quantize, dtype=self.dtype,
            )
        else:
            self.model = BasicUNetDenoiser(
                out_channels=self.out_channels, features=self.features,
                remat=self.remat, quantize=self.quantize, dtype=self.dtype,
            )

    def __call__(self, image, x, t):
        """Full denoise pass (embed + denoiser); also the init target."""
        return self.denoise(image, x, t)

    def embed(self, image):
        return self.embed_model(image)

    def embed_packed(self, image_p):
        """Packed-layout embeddings for the packed DDIM loop (levels 0-1
        packed) computed by the packed encoder — the whole inference path
        then never materialises a 64-channel (half-empty-lane) tensor."""
        assert self.pack > 1
        return self.embed_model.embed_packed(image_p)

    def denoise(self, image, x, t):
        if self.pack > 1:
            f = self.pack
            image_p = pk.pack_w(image, f)
            emb_p = self.embed_model.embed_packed(image_p)
            out = self.model(pk.pack_w(x, f), t, emb_p, image_p)
            return pk.unpack_w(out, f)
        embeddings = self.embed_model(image)
        return self.model(x, t, embeddings, image)

    def denoise_with_embeddings(self, x, t, embeddings, image):
        """Denoiser only — used by the DDIM scan where the image embedding is
        computed once per window (reference diffusion.py:90-93)."""
        if self.pack > 1:
            f = self.pack
            out = self.model(
                pk.pack_w(x, f), t, pack_embeddings(embeddings, f),
                pk.pack_w(image, f),
            )
            return pk.unpack_w(out, f)
        return self.model(x, t, embeddings, image)

    def denoise_packed(self, x_p, t, embeddings_packed, image_p):
        """Fully-packed denoiser call for the packed DDIM loop: the loop
        state, the conditioning image, and the level-0/1 embeddings all stay
        in pack-2 layout across all sampling steps (no per-step repacking)."""
        assert self.pack > 1
        return self.model(x_p, t, embeddings_packed, image_p)
