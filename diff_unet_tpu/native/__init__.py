"""Native (C++) host-side kernels, loaded via ctypes.

The shared library is built on demand from edt.cpp with g++ (cached next to
the source); every entry point has a scipy fallback so the framework works
without a compiler. See edt.cpp for what is implemented and why.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libdiffunet_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC",
             "-o", str(_LIB_PATH), str(_HERE / "edt.cpp")],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _LIB_PATH.exists() and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None
        for name in ("edt3d", "signed_edt3d"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ]
        _lib = lib
        return _lib


def _call(name: str, mask: np.ndarray, sampling) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    assert mask.ndim == 3, "native EDT expects a 3D volume"
    out = np.empty(mask.shape, np.float32)
    if sampling is None:
        sx = sy = sz = 1.0
    else:
        sx, sy, sz = (float(s) for s in sampling)
    getattr(lib, name)(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.shape[0], mask.shape[1], mask.shape[2],
        sx, sy, sz,
    )
    return out


def distance_transform_edt(mask: np.ndarray,
                           sampling=None) -> Optional[np.ndarray]:
    """Exact EDT (scipy semantics); None if the native lib is unavailable."""
    return _call("edt3d", mask, sampling)


def signed_distance(mask: np.ndarray, sampling=None) -> Optional[np.ndarray]:
    """Signed distance map (boundary-loss convention)."""
    return _call("signed_edt3d", mask, sampling)
