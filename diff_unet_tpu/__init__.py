"""diff_unet_tpu — TPU-native diffusion-based 3D medical-image segmentation.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference `aarchiiive/diff-unet-amos` (see SURVEY.md): Diff-UNet-family
denoising-diffusion segmentation over CT volumes, with the DDPM/DDIM sampler
compiled into `lax.scan` loops, channel-last 3D conv backbones, batched
sliding-window whole-volume inference, and mesh-based data parallelism.

Layout convention: all tensors are channel-last (N, D, H, W, C) — the TPU
idiom — whereas the reference is channel-first (N, C, D, H, W).
"""

__version__ = "0.1.0"

from diff_unet_tpu.diffusion import schedule as schedule  # noqa: F401
