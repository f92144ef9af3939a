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
    BasicUNetEncoder,
)


class DiffUNet(nn.Module):
    out_channels: int
    in_channels: int = 1
    features: Sequence[int] = DEFAULT_FEATURES
    remat: bool = False   # block-level activation rematerialisation
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.embed_model = BasicUNetEncoder(
            features=self.features, remat=self.remat, dtype=self.dtype
        )
        self.model = BasicUNetDenoiser(
            out_channels=self.out_channels, features=self.features,
            remat=self.remat, dtype=self.dtype,
        )

    def __call__(self, image, x, t):
        """Full denoise pass (embed + denoiser); also the init target."""
        return self.denoise(image, x, t)

    def embed(self, image):
        return self.embed_model(image)

    def denoise(self, image, x, t):
        embeddings = self.embed_model(image)
        return self.model(x, t, embeddings, image)

    def denoise_with_embeddings(self, x, t, embeddings, image):
        """Denoiser only — used by the DDIM scan where the image embedding is
        computed once per window (reference diffusion.py:90-93)."""
        return self.model(x, t, embeddings, image)
