"""Full-model numeric parity: reference torch BasicUNet encoder/denoiser vs
our JAX modules, weights transplanted via utils/torch_import.py.

Catches silent norm/layout/padding/deconv-tap mismatches that would
otherwise only surface as a Dice deficit (VERDICT round-1 missing #2).
Reference modules: models/basic_unet/pretrained/basic_unet.py:419-512 and
models/basic_unet/denoiser.py:196-312, executed on torch-CPU through the
minimal MONAI shim in tests/monai_stub.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_unet_tpu.models import DiffUNet
from diff_unet_tpu.utils.torch_import import (
    map_basic_unet_denoiser,
    map_basic_unet_encoder,
)

FEATURES = (8, 8, 16, 32, 64, 8)
CLASSES = 3


def _load_ref():
    try:
        from tests.ref_import import load_reference_basic_unet
        return load_reference_basic_unet()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")


def _randomized_state_dict(module, seed):
    """Randomize every parameter (incl. norm affines) so a mis-mapped tensor
    cannot hide behind a ones/zeros initializer."""
    import torch
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    return {k: torch.randn(v.shape, generator=g) * 0.08
            for k, v in sd.items()}


def _to_jax(x_torch):  # NCDHW -> NDHWC
    return jnp.asarray(np.transpose(x_torch.numpy(), (0, 2, 3, 4, 1)))


def _from_torch(y):  # torch NCDHW output -> NDHWC numpy
    return np.transpose(y.detach().numpy(), (0, 2, 3, 4, 1))


@pytest.mark.parametrize("spatial", [(32, 32, 32), (32, 32, 22)])
def test_diff_unet_forward_parity(spatial):
    """Transplanted torch weights -> identical denoise logits (fp32, 1e-4).

    The (32,32,22) case has odd edge lengths at two pyramid levels, which
    exercises the UpCat replicate-pad path (denoiser.py:183-189)."""
    import torch
    Encoder, Denoiser = _load_ref()

    enc_t = Encoder(3, 1, 2, FEATURES)
    den_t = Denoiser(3, CLASSES + 1, CLASSES, FEATURES)
    enc_sd = _randomized_state_dict(enc_t, 0)
    den_sd = _randomized_state_dict(den_t, 1)
    enc_t.load_state_dict(enc_sd)
    den_t.load_state_dict(den_sd)
    enc_t.eval(), den_t.eval()

    d, h, w = spatial
    g = torch.Generator().manual_seed(2)
    image_t = torch.randn((2, 1, d, h, w), generator=g)
    x_t = torch.randn((2, CLASSES, d, h, w), generator=g)
    t_t = torch.tensor([5, 250])

    with torch.no_grad():
        embeddings = enc_t(image_t)
        out_t = den_t(x_t, t_t, image=image_t, embeddings=embeddings)

    module = DiffUNet(out_channels=CLASSES, features=FEATURES)
    image_j, x_j = _to_jax(image_t), _to_jax(x_t)
    t_j = jnp.asarray(t_t.numpy())
    params = module.init(jax.random.key(0), image_j, x_j, t_j)
    root = params["params"]
    root["embed_model"] = map_basic_unet_encoder(
        {k: v.numpy() for k, v in enc_sd.items()}, root["embed_model"])
    root["model"] = map_basic_unet_denoiser(
        {k: v.numpy() for k, v in den_sd.items()}, root["model"])

    # encoder feature maps match level by level
    embs_j = module.apply(params, image_j, method="embed")
    for lvl, (e_t, e_j) in enumerate(zip(embeddings, embs_j)):
        np.testing.assert_allclose(
            _from_torch(e_t), np.asarray(e_j), atol=1e-4, rtol=1e-4,
            err_msg=f"encoder level {lvl}")

    out_j = module.apply(params, image_j, x_j, t_j)
    np.testing.assert_allclose(
        _from_torch(out_t), np.asarray(out_j), atol=1e-4, rtol=1e-4)
