"""Minimal MONAI shim so the reference's torch modules run in this env.

The environment has no `monai` package, but full-model numeric parity tests
need to execute the reference's `BasicUNetEncoder`/`BasicUNetRDenoiser`
(/root/reference/models/basic_unet/{pretrained/basic_unet.py,denoiser.py})
on torch-CPU. Those files use exactly four MONAI symbols:

- `monai.networks.blocks.Convolution` — Conv3d(k3, padding=1, bias) followed
  by an `adn` submodule with children N (InstanceNorm3d affine) / A
  (LeakyReLU), the default "NDA" ordering with dropout=0.
- `monai.networks.blocks.UpSample` — "deconv" mode: ConvTranspose3d(k2, s2)
  wrapped in a Sequential under the name "deconv".
- `monai.networks.layers.factories.Conv` / `Pool` — indexable factories for
  Conv3d / ConvTranspose3d / MaxPool3d.
- `monai.utils.ensure_tuple_rep` (+ `deprecated_arg` decorator no-op).

Everything is backed by plain torch primitives, so the parity test compares
our JAX blocks against real torch conv/instance-norm/deconv numerics; the
shim only reproduces MONAI's wiring (module names match MONAI's state_dict
layout so `utils/torch_import.py` maps apply unchanged).

Install into sys.modules via `tests.monai_stub.install()`.
"""
import sys
import types

import torch
import torch.nn as nn


def _parse_act(act):
    if isinstance(act, tuple):
        name, kwargs = act[0], (act[1] if len(act) > 1 else {})
    else:
        name, kwargs = act, {}
    name = str(name).lower()
    if name == "leakyrelu":
        return nn.LeakyReLU(**kwargs)
    if name == "relu":
        return nn.ReLU(**{k: v for k, v in kwargs.items() if k == "inplace"})
    if name == "prelu":
        return nn.PReLU(**kwargs)
    raise NotImplementedError(f"act {act}")


def _parse_norm(norm, channels, spatial_dims):
    if isinstance(norm, tuple):
        name, kwargs = norm[0], (norm[1] if len(norm) > 1 else {})
    else:
        name, kwargs = norm, {}
    name = str(name).lower()
    if name == "instance":
        cls = {2: nn.InstanceNorm2d, 3: nn.InstanceNorm3d}[spatial_dims]
        return cls(channels, **kwargs)
    if name == "batch":
        cls = {2: nn.BatchNorm2d, 3: nn.BatchNorm3d}[spatial_dims]
        return cls(channels, **kwargs)
    raise NotImplementedError(f"norm {norm}")


class _ADN(nn.Sequential):
    """MONAI ADN block, default ordering 'NDA' with dropout disabled."""

    def __init__(self, norm_mod, act_mod):
        super().__init__()
        self.add_module("N", norm_mod)
        self.add_module("A", act_mod)


class Convolution(nn.Sequential):
    """MONAI Convolution in its reference-used configuration:
    Conv3d(k3, stride 1, padding=1, bias) -> InstanceNorm(affine) -> act."""

    def __init__(self, spatial_dims, in_channels, out_channels,
                 strides=1, kernel_size=3, act=None, norm=None,
                 dropout=None, bias=True, padding=None, **_):
        super().__init__()
        if padding is None:
            padding = (kernel_size - 1) // 2
        conv_cls = {2: nn.Conv2d, 3: nn.Conv3d}[spatial_dims]
        self.add_module("conv", conv_cls(
            in_channels, out_channels, kernel_size=kernel_size,
            stride=strides, padding=padding, bias=bias))
        self.add_module("adn", _ADN(
            _parse_norm(norm, out_channels, spatial_dims),
            _parse_act(act)))


class UpSample(nn.Sequential):
    """MONAI UpSample, 'deconv' mode only (the mode every reference model
    uses: denoiser.py:161-171, upsample='deconv')."""

    def __init__(self, spatial_dims, in_channels, out_channels, scale_factor,
                 mode="deconv", pre_conv="default", interp_mode="linear",
                 align_corners=True, **_):
        super().__init__()
        if mode != "deconv":
            raise NotImplementedError(f"UpSample mode {mode}")
        cls = {2: nn.ConvTranspose2d, 3: nn.ConvTranspose3d}[spatial_dims]
        self.add_module("deconv", cls(
            in_channels, out_channels, kernel_size=scale_factor,
            stride=scale_factor))


class _Factory:
    def __init__(self, table):
        self._table = table

    def __getitem__(self, key):
        name, dims = key
        return self._table[(str(name).lower(), dims)]


Conv = _Factory({
    ("conv", 2): nn.Conv2d, ("conv", 3): nn.Conv3d,
    ("convtrans", 2): nn.ConvTranspose2d, ("convtrans", 3): nn.ConvTranspose3d,
})
Conv.CONV = "conv"
Conv.CONVTRANS = "convtrans"

Pool = _Factory({
    ("max", 2): nn.MaxPool2d, ("max", 3): nn.MaxPool3d,
    ("avg", 2): nn.AvgPool2d, ("avg", 3): nn.AvgPool3d,
})
Pool.MAX = "max"
Pool.AVG = "avg"


def ensure_tuple_rep(val, dim):
    if isinstance(val, (list, tuple)):
        if len(val) != dim:
            raise ValueError(f"length {len(val)} != {dim}")
        return tuple(val)
    return (val,) * dim


def deprecated_arg(*args, **kwargs):
    def deco(fn):
        return fn
    return deco


def install():
    """Register the shim as `monai` in sys.modules (idempotent)."""
    if "monai" in sys.modules and not getattr(
            sys.modules["monai"], "_diff_unet_tpu_stub", False):
        return  # a real monai is present; leave it alone
    monai = types.ModuleType("monai")
    monai._diff_unet_tpu_stub = True
    networks = types.ModuleType("monai.networks")
    blocks = types.ModuleType("monai.networks.blocks")
    layers = types.ModuleType("monai.networks.layers")
    factories = types.ModuleType("monai.networks.layers.factories")
    utils = types.ModuleType("monai.utils")

    blocks.Convolution = Convolution
    blocks.UpSample = UpSample
    factories.Conv = Conv
    factories.Pool = Pool
    layers.factories = factories
    utils.ensure_tuple_rep = ensure_tuple_rep
    utils.deprecated_arg = deprecated_arg

    networks.blocks = blocks
    networks.layers = layers
    monai.networks = networks
    monai.utils = utils

    for name, mod in [
        ("monai", monai),
        ("monai.networks", networks),
        ("monai.networks.blocks", blocks),
        ("monai.networks.layers", layers),
        ("monai.networks.layers.factories", factories),
        ("monai.utils", utils),
    ]:
        sys.modules[name] = mod
