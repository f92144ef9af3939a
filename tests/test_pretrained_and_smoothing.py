"""Pretrained torch-weight surgery + distance label smoothing tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diff_unet_tpu.api import DiffusionSegmenter
from diff_unet_tpu.models import DiffUNet


def _fake_encoder_state_dict(features=(4, 4, 8, 16, 32, 4)):
    """Craft a torch-style BasicUNetEncoder state_dict with correct shapes."""
    torch = pytest.importorskip("torch")
    sd = {}

    def two_conv(prefix, cin, cout):
        for j, ci in ((0, cin), (1, cout)):
            sd[f"{prefix}conv_{j}.conv.weight"] = torch.randn(cout, ci, 3, 3, 3)
            sd[f"{prefix}conv_{j}.conv.bias"] = torch.randn(cout)
            sd[f"{prefix}conv_{j}.adn.N.weight"] = torch.randn(cout)
            sd[f"{prefix}conv_{j}.adn.N.bias"] = torch.randn(cout)

    two_conv("conv_0.", 1, features[0])
    for i in range(4):
        two_conv(f"down.{i}.convs.", features[i], features[i + 1])
    return sd


def test_encoder_import_shapes_and_effect(tmp_path):
    torch = pytest.importorskip("torch")
    features = (4, 4, 8, 16, 32, 4)
    sd = _fake_encoder_state_dict(features)
    ckpt = tmp_path / "encoder.pt"
    torch.save(sd, ckpt)

    seg = DiffusionSegmenter(
        module=DiffUNet(out_channels=2, features=features), num_classes=2
    )
    params = seg.init(jax.random.key(0), (1, 16, 16, 16, 1))

    from diff_unet_tpu.utils.torch_import import load_pretrained_encoder
    new_params = load_pretrained_encoder(str(ckpt), params,
                                         model_name="diff_unet")

    old_k = params["params"]["embed_model"]["conv_0"]["conv_0"]["conv"]["kernel"]
    new_k = new_params["params"]["embed_model"]["conv_0"]["conv_0"]["conv"]["kernel"]
    assert old_k.shape == new_k.shape
    assert not np.allclose(np.asarray(old_k), np.asarray(new_k))
    # torch (out,in,k,k,k) -> flax (k,k,k,in,out) round trip check
    np.testing.assert_allclose(
        np.asarray(new_k),
        sd["conv_0.conv_0.conv.weight"].numpy().transpose(2, 3, 4, 1, 0),
    )
    # denoiser subtree untouched
    np.testing.assert_array_equal(
        np.asarray(params["params"]["model"]["conv_0"]["conv_0"]["conv"]["kernel"]),
        np.asarray(new_params["params"]["model"]["conv_0"]["conv_0"]["conv"]["kernel"]),
    )
    # model still runs with imported weights
    out = seg.denoise(new_params, jnp.zeros((1, 16, 16, 16, 1)),
                      jnp.zeros((1, 16, 16, 16, 2)), jnp.array([0]))
    assert np.isfinite(np.asarray(out)).all()


def test_smooth_labels_properties():
    from diff_unet_tpu.data.label_smoothing import (
        class_centroids,
        smooth_labels,
    )
    labels = np.zeros((12, 12, 12), np.int64)
    labels[2:5, 2:5, 2:5] = 1
    cents = class_centroids(labels, 2)
    np.testing.assert_allclose(cents[1], [3.0, 3.0, 3.0])

    sm = smooth_labels(labels, 2, alpha=0.3, order=1.0)
    assert sm.shape == (12, 12, 12, 2)
    assert (sm >= 0).all()
    # voxels at an organ's centroid keep a near-1 value for that class
    assert sm[3, 3, 3, 1] > 0.9 or sm[3, 3, 3, 1] < 0.1  # |1 - 0.3/eps| huge
    # far from centroid, decay -> labels approach the raw one-hot
    assert abs(sm[11, 11, 11, 1] - 0.0) < 0.05


def test_learnable_label_smoothing_module():
    from diff_unet_tpu.data.label_smoothing import LearnableLabelSmoothing
    mod = LearnableLabelSmoothing(num_classes=3)
    labels = jax.nn.one_hot(
        jax.random.randint(jax.random.key(0), (1, 4, 4, 4), 0, 3), 3
    )
    dist = jnp.ones((1, 4, 4, 4, 3)) * 5.0
    params = mod.init(jax.random.key(1), labels, dist)
    out = mod.apply(params, labels, dist)
    assert out.shape == labels.shape
    # gradient flows to alpha/beta
    g = jax.grad(
        lambda p: jnp.sum(mod.apply(p, labels, dist))
    )(params)
    assert float(jnp.abs(g["params"]["alpha"]).sum()) > 0


def test_label_smoothing_cache_dataset(tmp_path):
    import json
    from diff_unet_tpu.data.label_smoothing import LabelSmoothingCacheDataset
    from diff_unet_tpu.data.nifti import write_nifti

    rng = np.random.RandomState(0)
    affine = np.diag([1.5, 1.5, 2.0, 1.0])
    img = rng.randint(-175, 250, (16, 16, 16)).astype(np.int16)
    lab = np.zeros((16, 16, 16), np.int16)
    lab[4:8, 4:8, 4:8] = 1
    write_nifti(tmp_path / "i.nii.gz", img, affine)
    write_nifti(tmp_path / "l.nii.gz", lab, affine)
    ds = LabelSmoothingCacheDataset(
        [{"image": str(tmp_path / "i.nii.gz"),
          "label": str(tmp_path / "l.nii.gz")}],
        num_classes=2, num_workers=1,
    )
    item = ds[0]
    assert item["label"].ndim == 4 and item["label"].shape[-1] == 2
    assert item["label"].dtype == np.float32
    assert item["image"].min() >= 0 and item["image"].max() <= 1
