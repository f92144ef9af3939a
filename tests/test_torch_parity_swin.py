"""Full-model numeric parity: reference torch SwinUNETRDenoiser vs our JAX
SwinUNETRDenoiser, weights transplanted via utils/torch_import.py.

Second half of VERDICT round-1 missing #2: exercises the vendored Swin stack
(models/swin_unetr/{denoiser,transformer,attention,patch,blocks}.py) —
window attention + relative position bias, shifted-window masks, patch
merging (v0.9.0 slice quirk), per-stage t_proj injection, UNETR res blocks
with t FiLM, reverse attention, transposed-conv decoders — end to end on
torch-CPU through tests/monai_stub.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_unet_tpu.models.swin_unetr import SwinUNETRDenoiser
from diff_unet_tpu.utils.torch_import import map_swin_denoiser

FS = 12          # feature_size (must be divisible by 12, denoiser.py:127)
CLASSES = 3
SIZE = 64        # divisible by 2^5 (denoiser.py:113-115); 32 would leave
                 # the deepest stage at 1^3, which torch InstanceNorm rejects


def _load_ref():
    try:
        from tests.ref_import import load_reference_swin_denoiser
        return load_reference_swin_denoiser()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")


def _randomized_state_dict(module, seed):
    """Randomize every *parameter* (buffers — the relative_position_index
    tables — keep their structural values)."""
    import torch
    g = torch.Generator().manual_seed(seed)
    sd = {k: v.clone() for k, v in module.state_dict().items()}
    for k in dict(module.named_parameters()):
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.08
    return sd


def _to_jax(x_torch):  # NCDHW -> NDHWC
    return jnp.asarray(np.transpose(x_torch.numpy(), (0, 2, 3, 4, 1)))


def _from_torch(y):  # torch NCDHW output -> NDHWC numpy
    return np.transpose(y.detach().numpy(), (0, 2, 3, 4, 1))


def test_swin_denoiser_forward_parity():
    """Transplanted torch weights -> identical denoiser logits (fp32, 1e-4).

    Conditioning embeddings are fabricated (random) tensors in the encoder's
    output format ([hidden_states x5], enc0..enc3, denoiser.py:353-384), so
    the test isolates the denoiser stack itself."""
    import torch
    Denoiser = _load_ref()

    den_t = Denoiser((SIZE,) * 3, CLASSES + 1, CLASSES, feature_size=FS)
    den_t.eval()
    sd = _randomized_state_dict(den_t, 0)
    den_t.load_state_dict(sd)

    g = torch.Generator().manual_seed(1)
    image_t = torch.randn((2, 1, SIZE, SIZE, SIZE), generator=g)
    x_t = torch.randn((2, CLASSES, SIZE, SIZE, SIZE), generator=g)
    t_t = torch.tensor([5, 250])

    # encoder-format conditioning embeddings (random)
    def randn(*shape):
        return torch.randn(shape, generator=g) * 0.3

    hidden_t = [randn(2, FS * (2 ** i), SIZE // 2 ** (i + 1),
                      SIZE // 2 ** (i + 1), SIZE // 2 ** (i + 1))
                for i in range(5)]
    conds_t = [randn(2, FS, SIZE, SIZE, SIZE),
               randn(2, FS, SIZE // 2, SIZE // 2, SIZE // 2),
               randn(2, 2 * FS, SIZE // 4, SIZE // 4, SIZE // 4),
               randn(2, 4 * FS, SIZE // 8, SIZE // 8, SIZE // 8)]
    embeddings_t = [hidden_t] + conds_t

    with torch.no_grad():
        out_t = den_t(x_t, t_t, image=image_t, embeddings=embeddings_t)

    module = SwinUNETRDenoiser(out_channels=CLASSES, feature_size=FS)
    image_j, x_j = _to_jax(image_t), _to_jax(x_t)
    t_j = jnp.asarray(t_t.numpy())
    embeddings_j = (tuple(_to_jax(h) for h in hidden_t),
                    *[_to_jax(c) for c in conds_t])
    params = module.init(jax.random.key(0), x_j, t_j, embeddings_j, image_j)
    params = {"params": map_swin_denoiser(
        {k: v.numpy() for k, v in sd.items()}, params["params"])}

    out_j = module.apply(params, x_j, t_j, embeddings_j, image_j)
    np.testing.assert_allclose(
        _from_torch(out_t), np.asarray(out_j), atol=1e-4, rtol=1e-4)


def test_swin_unetr_quantized_correlates_with_float():
    """DiffSwinUNETR(quantize=True): W8A8 UNETR conv blocks track the float
    model (VERDICT r3 ask #9 — Swin execution-layout pass)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from diff_unet_tpu.models.swin_unetr import DiffSwinUNETR

    kw = dict(out_channels=2, image_size=(32, 32, 32), feature_size=12)
    plain = DiffSwinUNETR(**kw)
    quant = DiffSwinUNETR(quantize=True, **kw)
    image = jax.random.normal(jax.random.key(1), (1, 32, 32, 32, 1))
    x = jax.random.normal(jax.random.key(2), (1, 32, 32, 32, 2))
    t = jnp.asarray([5])
    params = plain.init(jax.random.key(0), image, x, t)
    want = np.asarray(plain.apply(params, image, x, t))
    got = np.asarray(quant.apply(params, image, x, t))
    c = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert c > 0.98, c
