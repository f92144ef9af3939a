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


class MLPBlock(nn.Module):
    """MONAI MLPBlock as used by the vendored Swin (transformer.py:378):
    linear1 -> GELU(exact) -> drop -> linear2 -> drop, dropout 0 in the live
    config. Module names linear1/linear2 match MONAI's state_dict layout."""

    def __init__(self, hidden_size, mlp_dim, dropout_rate=0.0, act="GELU",
                 dropout_mode="vit"):
        super().__init__()
        self.linear1 = nn.Linear(hidden_size, mlp_dim)
        self.linear2 = nn.Linear(mlp_dim, hidden_size)
        if str(act).upper() != "GELU":
            raise NotImplementedError(f"act {act}")
        self.fn = nn.GELU()
        self.drop1 = nn.Dropout(dropout_rate)
        self.drop2 = nn.Dropout(dropout_rate)

    def forward(self, x):
        return self.drop2(self.linear2(self.drop1(self.fn(self.linear1(x)))))


class SwinPatchEmbed(nn.Module):
    """MONAI PatchEmbed (conv patch embedding, `proj` child) for the Swin
    transformer (transformer.py:182); pads inputs up to a patch multiple."""

    def __init__(self, patch_size=2, in_chans=1, embed_dim=48,
                 norm_layer=None, spatial_dims=3):
        super().__init__()
        import torch.nn.functional  # noqa: F401
        self.patch_size = ensure_tuple_rep(patch_size, spatial_dims)
        conv_cls = {2: nn.Conv2d, 3: nn.Conv3d}[spatial_dims]
        self.proj = conv_cls(in_chans, embed_dim, kernel_size=self.patch_size,
                             stride=self.patch_size)
        self.norm = norm_layer(embed_dim) if norm_layer is not None else None

    def forward(self, x):
        import torch.nn.functional as F
        spatial = x.shape[2:]
        pads = []
        for s, p in zip(reversed(spatial), reversed(self.patch_size)):
            pads.extend([0, (p - s % p) % p])
        if any(pads):
            x = F.pad(x, pads)
        x = self.proj(x)
        if self.norm is not None:
            shape = x.shape
            x = self.norm(x.flatten(2).transpose(1, 2))
            x = x.transpose(1, 2).view(shape)
        return x


class DropPath(nn.Module):
    """Stochastic depth; the live config uses rate 0 (identity)."""

    def __init__(self, drop_prob=0.0, **_):
        super().__init__()
        if drop_prob:
            raise NotImplementedError("drop_path > 0 not stubbed")

    def forward(self, x):
        return x


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return torch.nn.init.trunc_normal_(tensor, mean, std, a, b)


def look_up_option(name, table):
    if isinstance(name, str):
        return table[name]
    return name


def optional_import(module, version="", ops="", name=""):
    import importlib
    try:
        mod = importlib.import_module(module)
        obj = getattr(mod, name) if name else mod
        return obj, True
    except Exception:
        return None, False


def _norm_with_affine_default(norm):
    """MONAI get_norm_layer defaults affine=True for norms that take it."""
    if isinstance(norm, tuple):
        name, kwargs = norm[0], dict(norm[1] if len(norm) > 1 else {})
    else:
        name, kwargs = norm, {}
    kwargs.setdefault("affine", True)
    return (name, kwargs)


def get_norm_layer(name, spatial_dims=1, channels=1):
    return _parse_norm(_norm_with_affine_default(name), channels,
                       spatial_dims)


def get_act_layer(name):
    return _parse_act(name)


def _same_padding(kernel, stride):
    """MONAI dynunet get_padding: (k - s + 1) // 2 per dim."""
    return tuple((k - s + 1) // 2
                 for k, s in zip(kernel, stride))


def get_conv_layer(spatial_dims, in_channels, out_channels, kernel_size=3,
                   stride=1, act=None, norm=None, dropout=None, bias=False,
                   conv_only=True, is_transposed=False):
    """MONAI dynunet_block.get_conv_layer in the configurations the
    reference's UNETR blocks use (blocks.py:57,182,250,324): a Sequential
    with a `conv` child (act/norm are always None there), bias default
    False, 'same' padding, transposed output_padding for exact 2x."""
    if act is not None or norm is not None:
        raise NotImplementedError("act/norm inside get_conv_layer")
    kernel = ensure_tuple_rep(kernel_size, spatial_dims)
    strides = ensure_tuple_rep(stride, spatial_dims)
    padding = _same_padding(kernel, strides)
    seq = nn.Sequential()
    if is_transposed:
        out_pad = tuple(2 * p + s - k
                        for p, s, k in zip(padding, strides, kernel))
        cls = {2: nn.ConvTranspose2d, 3: nn.ConvTranspose3d}[spatial_dims]
        seq.add_module("conv", cls(
            in_channels, out_channels, kernel_size=kernel, stride=strides,
            padding=padding, output_padding=out_pad, bias=bias))
    else:
        cls = {2: nn.Conv2d, 3: nn.Conv3d}[spatial_dims]
        seq.add_module("conv", cls(
            in_channels, out_channels, kernel_size=kernel, stride=strides,
            padding=padding, bias=bias))
    return seq


class _Unstubbed(nn.Module):
    """Placeholder for MONAI blocks that are imported but never constructed
    on the reference's live path (e.g. monai UnetrBasicBlock, only built
    when use_v2=True, transformer.py:235)."""

    def __init__(self, *a, **k):
        raise NotImplementedError(
            f"{type(self).__name__} is not stubbed (unused in live path)")


class UnetrBasicBlock(_Unstubbed):
    pass


class UnetrUpBlock(_Unstubbed):
    pass


class UnetOutBlock(_Unstubbed):
    pass


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

    dynunet = types.ModuleType("monai.networks.blocks.dynunet_block")
    layers_utils = types.ModuleType("monai.networks.layers.utils")

    blocks.Convolution = Convolution
    blocks.UpSample = UpSample
    blocks.MLPBlock = MLPBlock
    blocks.PatchEmbed = SwinPatchEmbed
    blocks.UnetrBasicBlock = UnetrBasicBlock
    blocks.UnetrUpBlock = UnetrUpBlock
    blocks.UnetOutBlock = UnetOutBlock
    dynunet.get_conv_layer = get_conv_layer
    blocks.dynunet_block = dynunet
    factories.Conv = Conv
    factories.Pool = Pool
    layers.factories = factories
    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    layers_utils.get_act_layer = get_act_layer
    layers_utils.get_norm_layer = get_norm_layer
    layers.utils = layers_utils
    utils.ensure_tuple_rep = ensure_tuple_rep
    utils.deprecated_arg = deprecated_arg
    utils.look_up_option = look_up_option
    utils.optional_import = optional_import

    networks.blocks = blocks
    networks.layers = layers
    monai.networks = networks
    monai.utils = utils

    for name, mod in [
        ("monai", monai),
        ("monai.networks", networks),
        ("monai.networks.blocks", blocks),
        ("monai.networks.blocks.dynunet_block", dynunet),
        ("monai.networks.layers", layers),
        ("monai.networks.layers.utils", layers_utils),
        ("monai.networks.layers.factories", factories),
        ("monai.utils", utils),
    ]:
        sys.modules[name] = mod

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv_utils = types.ModuleType("torchvision.utils")
            tv_utils.save_image = lambda *a, **k: None
            tv.utils = tv_utils
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.utils"] = tv_utils
