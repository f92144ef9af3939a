"""Model smoke-test entry point.

Capability parity with the reference's `model.py:1-14` / `test_model.py`
smoke scripts (build a model, run q_sample + denoise on synthetic input,
print shapes) — but with assertions instead of prints-only (SURVEY.md §4).

Usage: python model.py [model_name] [size]
"""
import sys

import jax
import jax.numpy as jnp

from diff_unet_tpu.api import DiffusionSegmenter
from diff_unet_tpu.models.model_hub import MODEL_NAMES, create_model


def smoke(model_name: str = "diff_unet", size: int = 32,
          num_classes: int = 3) -> None:
    print(f"building {model_name} (size={size}, classes={num_classes})")
    module = create_model(model_name, out_channels=num_classes,
                          image_size=size, spatial_size=size)
    image = jnp.ones((1, size, size, size, 1))

    if model_name == "swin_unetr":
        params = module.init(jax.random.key(0), image)
        out = module.apply(params, image)
        assert out.shape == (1, size, size, size, num_classes), out.shape
        print("forward:", out.shape, out.dtype)
        return

    seg = DiffusionSegmenter(module=module, num_classes=num_classes,
                             sample_steps=2)
    params = seg.init(jax.random.key(0), image.shape)

    x_start = jnp.zeros((1, size, size, size, num_classes)) * 2 - 1
    x_t, t, noise = seg.q_sample(x_start, jax.random.key(1))
    print("q_sample:", x_t.shape, "t =", int(t[0]))

    preds = seg.denoise(params, image, x_t, t)
    assert preds.shape == (1, size, size, size, num_classes), preds.shape
    print("denoise:", preds.shape, preds.dtype)

    logits = seg.ddim_sample(params, image, jax.random.key(2))
    assert logits.shape == (1, size, size, size, num_classes)
    print("ddim_sample:", logits.shape)
    print("ok")


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "diff_unet"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    assert name in MODEL_NAMES, f"choose from {MODEL_NAMES}"
    smoke(name, size)
