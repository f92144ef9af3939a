"""Pretrained torch checkpoint -> JAX params surgery.

Capability parity with the reference's pretrained-weight loading
(train.py:166-176): `encoder.pt` (HybridMIM BasicUNetEncoder state_dict)
loads into the whole image encoder; `swinvit.pt` loads into the Swin ViT
subtree only, following the name map of swin_unetr/denoiser.py:410-457 and
transformer.py:437-469.

Weight layout conversions (torch -> flax):
- Conv3d   (out, in, kd, kh, kw) -> (kd, kh, kw, in, out)
- Linear   (out, in)             -> (in, out)
- InstanceNorm / LayerNorm weight/bias -> scale/bias
"""
from __future__ import annotations

import copy
from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch  # torch-cpu available in the environment
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in obj.items() if hasattr(v, "detach")}


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _lin_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    old = node[parts[-1]]
    assert tuple(old.shape) == tuple(value.shape), (
        f"{path}: {old.shape} vs {value.shape}"
    )
    node[parts[-1]] = value.astype(np.float32)


def _strip_module(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def map_two_conv(sd: Dict, prefix: str, tree: Dict, name: str) -> None:
    """torch TwoConv (MONAI Convolution pairs) -> our TwoConv params."""
    for j in (0, 1):
        tp = f"{prefix}conv_{j}."
        _set(tree, f"{name}/conv_{j}/conv/kernel", _conv_w(sd[tp + "conv.weight"]))
        _set(tree, f"{name}/conv_{j}/conv/bias", sd[tp + "conv.bias"])
        # MONAI ADN norm submodule is named adn.N
        nw, nb = tp + "adn.N.weight", tp + "adn.N.bias"
        if nw in sd:
            _set(tree, f"{name}/conv_{j}/norm/scale", sd[nw])
            _set(tree, f"{name}/conv_{j}/norm/bias", sd[nb])


def map_basic_unet_encoder(sd: Dict[str, np.ndarray],
                           enc_params: Dict) -> Dict:
    """HybridMIM BasicUNetEncoder state_dict -> our BasicUNetEncoder params.

    torch layout (models/basic_unet/pretrained/basic_unet.py:491-494):
    conv_0.{conv_0,conv_1}.*, down.{0..3}.convs.{conv_0,conv_1}.*
    """
    sd = _strip_module(sd)
    out = copy.deepcopy(enc_params)
    map_two_conv(sd, "conv_0.", out, "conv_0")
    for i in range(4):
        map_two_conv(sd, f"down.{i}.convs.", out, f"down_{i + 1}/convs")
    return out


def _deconv_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d weight (in, out, kd, kh, kw) -> flax
    nn.ConvTranspose kernel (kd, kh, kw, in, out).

    flax ConvTranspose (transpose_kernel=False) applies the kernel as a
    regular conv over the input-dilated signal, whereas torch's is the
    gradient-of-conv formulation; for the same numerics the spatial taps
    must be flipped (verified by tests/test_torch_parity.py).
    """
    w = np.transpose(w, (2, 3, 4, 0, 1))
    return w[::-1, ::-1, ::-1].copy()


def map_two_conv_temb(sd: Dict, prefix: str, tree: Dict, name: str) -> None:
    """Time-conditioned TwoConv (denoiser.py:50-67): conv pair + temb_proj."""
    map_two_conv(sd, prefix, tree, name)
    _set(tree, f"{name}/temb_proj/kernel", _lin_w(sd[prefix + "temb_proj.weight"]))
    _set(tree, f"{name}/temb_proj/bias", sd[prefix + "temb_proj.bias"])


def map_basic_unet_denoiser(sd: Dict[str, np.ndarray],
                            den_params: Dict) -> Dict:
    """Reference BasicUNetRDenoiser state_dict
    (models/basic_unet/denoiser.py:196-312) -> our BasicUNetDenoiser params.

    torch layout: temb.dense.{0,1}, conv_0.*, down_{1..4}.convs.*,
    upcat_{4..1}.{upsample.deconv,convs}.*, final_conv.
    """
    sd = _strip_module(sd)
    out = copy.deepcopy(den_params)
    for j in (0, 1):
        _set(out, f"temb/dense_{j}/kernel", _lin_w(sd[f"temb.dense.{j}.weight"]))
        _set(out, f"temb/dense_{j}/bias", sd[f"temb.dense.{j}.bias"])
    map_two_conv_temb(sd, "conv_0.", out, "conv_0")
    for i in range(1, 5):
        map_two_conv_temb(sd, f"down_{i}.convs.", out, f"down_{i}/convs")
    for i in range(1, 5):
        _set(out, f"upcat_{i}/upsample/kernel",
             _deconv_w(sd[f"upcat_{i}.upsample.deconv.weight"]))
        _set(out, f"upcat_{i}/upsample/bias",
             sd[f"upcat_{i}.upsample.deconv.bias"])
        map_two_conv_temb(sd, f"upcat_{i}.convs.", out, f"upcat_{i}/convs")
    _set(out, "final_conv/kernel", _conv_w(sd["final_conv.weight"]))
    _set(out, "final_conv/bias", sd["final_conv.bias"])
    return out


def map_swin_vit(sd: Dict[str, np.ndarray], swin_params: Dict) -> Dict:
    """swinvit.pt state_dict -> our ops.swin.SwinTransformer params
    (name map of swin_unetr/denoiser.py:410-457)."""
    sd = _strip_module(sd)
    out = copy.deepcopy(swin_params)
    _set(out, "patch_embed/proj/kernel", _conv_w(sd["patch_embed.proj.weight"]))
    _set(out, "patch_embed/proj/bias", sd["patch_embed.proj.bias"])
    for i in range(1, 5):
        layer = f"layers{i}"
        n = 0
        while f"{layer}.0.blocks.{n}.norm1.weight" in sd:
            tb = f"{layer}.0.blocks.{n}."
            blk = f"{layer}/blocks_{n}"
            _set(out, f"{blk}/norm1/scale", sd[tb + "norm1.weight"])
            _set(out, f"{blk}/norm1/bias", sd[tb + "norm1.bias"])
            _set(out, f"{blk}/attn/relative_position_bias_table",
                 sd[tb + "attn.relative_position_bias_table"])
            _set(out, f"{blk}/attn/qkv/kernel", _lin_w(sd[tb + "attn.qkv.weight"]))
            if tb + "attn.qkv.bias" in sd:
                _set(out, f"{blk}/attn/qkv/bias", sd[tb + "attn.qkv.bias"])
            _set(out, f"{blk}/attn/proj/kernel",
                 _lin_w(sd[tb + "attn.proj.weight"]))
            _set(out, f"{blk}/attn/proj/bias", sd[tb + "attn.proj.bias"])
            _set(out, f"{blk}/norm2/scale", sd[tb + "norm2.weight"])
            _set(out, f"{blk}/norm2/bias", sd[tb + "norm2.bias"])
            for tname, oname in (("fc1", "fc1"), ("linear1", "fc1"),
                                 ("fc2", "fc2"), ("linear2", "fc2")):
                if tb + f"mlp.{tname}.weight" in sd:
                    _set(out, f"{blk}/mlp/{oname}/kernel",
                         _lin_w(sd[tb + f"mlp.{tname}.weight"]))
                    _set(out, f"{blk}/mlp/{oname}/bias",
                         sd[tb + f"mlp.{tname}.bias"])
            n += 1
        dp = f"{layer}.0.downsample."
        if dp + "reduction.weight" in sd:
            _set(out, f"{layer}/downsample/reduction/kernel",
                 _lin_w(sd[dp + "reduction.weight"]))
            _set(out, f"{layer}/downsample/norm/scale", sd[dp + "norm.weight"])
            _set(out, f"{layer}/downsample/norm/bias", sd[dp + "norm.bias"])
    return out


def map_unet_res_block(sd: Dict, prefix: str, tree: Dict,
                       name: str) -> None:
    """Reference UnetResBlock (swin_unetr/blocks.py:185-316): conv1/conv2
    (+conv3 shortcut when present), instance norms, optional t_proj FiLM.
    dynunet convs carry no bias (MONAI get_conv_layer bias=False); our flax
    conv biases stay at their zero init."""
    _set(tree, f"{name}/conv1/kernel", _conv_w(sd[prefix + "conv1.conv.weight"]))
    _set(tree, f"{name}/conv2/kernel", _conv_w(sd[prefix + "conv2.conv.weight"]))
    for norm in ("norm1", "norm2"):
        _set(tree, f"{name}/{norm}/scale", sd[f"{prefix}{norm}.weight"])
        _set(tree, f"{name}/{norm}/bias", sd[f"{prefix}{norm}.bias"])
    if prefix + "conv3.conv.weight" in sd:
        _set(tree, f"{name}/conv3/kernel",
             _conv_w(sd[prefix + "conv3.conv.weight"]))
        _set(tree, f"{name}/norm3/scale", sd[prefix + "norm3.weight"])
        _set(tree, f"{name}/norm3/bias", sd[prefix + "norm3.bias"])
    if prefix + "t_proj.weight" in sd:
        _set(tree, f"{name}/t_proj/kernel", _lin_w(sd[prefix + "t_proj.weight"]))
        _set(tree, f"{name}/t_proj/bias", sd[prefix + "t_proj.bias"])


def map_swin_denoiser(sd: Dict[str, np.ndarray], den_params: Dict) -> Dict:
    """Reference SwinUNETRDenoiser state_dict
    (models/swin_unetr/denoiser.py:36-408) -> our SwinUNETRDenoiser params.

    torch layout: t_embedder.dense.{0,1}, swinViT.{patch_embed,layersN,
    t_proj.N}, encoder{1,2,3,4,10}.layer.*, decoder{5..1}.{transp_conv,
    conv_block}.*, out.conv.conv.*"""
    sd = _strip_module(sd)
    out = copy.deepcopy(den_params)
    for j in (0, 1):
        _set(out, f"t_embedder/dense_{j}/kernel",
             _lin_w(sd[f"t_embedder.dense.{j}.weight"]))
        _set(out, f"t_embedder/dense_{j}/bias", sd[f"t_embedder.dense.{j}.bias"])

    vit_sd = {k[len("swinViT."):]: v for k, v in sd.items()
              if k.startswith("swinViT.")}
    out["swinViT"] = map_swin_vit(vit_sd, out["swinViT"])
    i = 0
    while f"swinViT.t_proj.{i}.weight" in sd:
        _set(out, f"swinViT/t_proj_{i}/kernel",
             _lin_w(sd[f"swinViT.t_proj.{i}.weight"]))
        _set(out, f"swinViT/t_proj_{i}/bias", sd[f"swinViT.t_proj.{i}.bias"])
        i += 1

    for enc in ("encoder1", "encoder2", "encoder3", "encoder4", "encoder10"):
        map_unet_res_block(sd, f"{enc}.layer.", out, f"{enc}/layer")
    for dec in ("decoder1", "decoder2", "decoder3", "decoder4", "decoder5"):
        _set(out, f"{dec}/transp_conv/kernel",
             _deconv_w(sd[f"{dec}.transp_conv.conv.weight"]))
        map_unet_res_block(sd, f"{dec}.conv_block.", out, f"{dec}/conv_block")
    _set(out, "out/kernel", _conv_w(sd["out.conv.conv.weight"]))
    _set(out, "out/bias", sd["out.conv.conv.bias"])
    return out


def load_pretrained_encoder(path: str, params: Any,
                            model_name: str = "diff_unet") -> Any:
    """Graft pretrained torch weights into `params` following the
    reference's dispatch (train.py:166-176)."""
    sd = load_torch_state_dict(path)
    params = copy.deepcopy(
        {k: v for k, v in params.items()}
    )
    root = params["params"]
    if str(path).endswith("swinvit.pt"):
        root["embed_model"]["swinViT"] = map_swin_vit(
            sd, root["embed_model"]["swinViT"]
        )
    elif model_name in ("diff_unet", "smooth_diff_unet"):
        root["embed_model"] = map_basic_unet_encoder(
            sd, root["embed_model"]
        )
    else:
        raise NotImplementedError(
            f"pretrained import for {model_name} from {path}"
        )
    return params
