"""Import reference torch modules (/root/reference) without running their
package __init__ chains.

`models/__init__.py` in the reference imports every model family (incl.
Swin files with MONAI symbols the stub doesn't cover), so parity tests load
only the leaf modules they need: synthetic parent packages with the right
`__path__` are registered first, which makes `importlib` resolve the leaves
and their relative imports while skipping the real `__init__.py` bodies.
"""
import importlib
import sys
import types

REF = "/root/reference"


def _pkg(fullname: str, path: str) -> types.ModuleType:
    if fullname in sys.modules:
        return sys.modules[fullname]
    mod = types.ModuleType(fullname)
    mod.__path__ = [path]
    mod.__package__ = fullname
    sys.modules[fullname] = mod
    return mod


def load_reference_basic_unet():
    """Return (BasicUNetEncoder, BasicUNetRDenoiser) torch classes from
    models/basic_unet/{pretrained/basic_unet.py, denoiser.py}."""
    from tests import monai_stub
    monai_stub.install()
    if REF not in sys.path:
        sys.path.insert(0, REF)  # for `import guided_diffusion`

    base = REF + "/models"
    _pkg("refm", base)
    diff_pkg = _pkg("refm.diffusion", base + "/diffusion")
    utils = importlib.import_module("refm.diffusion.utils")
    for sym in ("get_timestep_embedding", "nonlinearity", "TimeStepEmbedder"):
        setattr(diff_pkg, sym, getattr(utils, sym))
    _pkg("refm.basic_unet", base + "/basic_unet")
    _pkg("refm.basic_unet.pretrained", base + "/basic_unet/pretrained")
    denoiser = importlib.import_module("refm.basic_unet.denoiser")
    encoder = importlib.import_module("refm.basic_unet.pretrained.basic_unet")
    return encoder.BasicUNetEncoder, denoiser.BasicUNetRDenoiser


def load_reference_swin_denoiser():
    """Return the SwinUNETRDenoiser torch class from
    models/swin_unetr/denoiser.py (vendored Swin stack; MONAI symbols
    resolved by tests/monai_stub)."""
    from tests import monai_stub
    monai_stub.install()
    if REF not in sys.path:
        sys.path.insert(0, REF)

    base = REF + "/models"
    _pkg("refm", base)
    diff_pkg = _pkg("refm.diffusion", base + "/diffusion")
    utils = importlib.import_module("refm.diffusion.utils")
    for sym in ("get_timestep_embedding", "nonlinearity", "TimeStepEmbedder"):
        setattr(diff_pkg, sym, getattr(utils, sym))
    _pkg("refm.swin_unetr", base + "/swin_unetr")
    denoiser = importlib.import_module("refm.swin_unetr.denoiser")
    return denoiser.SwinUNETRDenoiser
