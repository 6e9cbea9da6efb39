"""ctypes bindings for the native host-pipeline kernels (_native/transform.cpp).

Builds the shared library on first use with g++ (cached beside the source);
falls back cleanly to the numpy paths if no compiler is available.  The numpy
and native paths are equivalence-tested in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "_native" / "transform.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    so = _SRC.with_suffix(".so")
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC),
           "-o", str(so)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        if os.environ.get("COLDDIFF_NO_NATIVE"):
            return None
        so = _build()
        if so is not None:
            lib = ctypes.CDLL(str(so))
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.crop_flip_normalize.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
            ]
            lib.batch_crop_flip_normalize.argtypes = [
                ctypes.POINTER(u8p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, i32p, ctypes.c_int, f32p,
            ]
            lib.pad4_crop_flip_normalize.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, f32p,
            ]
            _LIB = lib
    return _LIB


def crop_flip_normalize(img: np.ndarray, y0: int, x0: int, size: int,
                        flip: bool) -> np.ndarray:
    """Fused crop + flip + uint8->[-1,1] float32 (native when available)."""
    assert img.dtype == np.uint8 and img.ndim == 3
    lib = get_lib()
    h, w, c = img.shape
    if lib is not None:
        img = np.ascontiguousarray(img)
        out = np.empty((size, size, c), dtype=np.float32)
        lib.crop_flip_normalize(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
            y0, x0, size, int(flip),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    crop = img[y0 : y0 + size, x0 : x0 + size]
    if flip:
        crop = crop[:, ::-1]
    return crop.astype(np.float32) / 255.0 * 2.0 - 1.0


def pad4_crop_flip_normalize(img: np.ndarray, y0: int, x0: int,
                             flip: bool) -> np.ndarray:
    """Fused CIFAR aug: zero-pad 4, crop at (y0, x0), flip, normalize."""
    assert img.dtype == np.uint8 and img.ndim == 3
    lib = get_lib()
    h, w, c = img.shape
    if lib is not None:
        img = np.ascontiguousarray(img)
        out = np.empty((h, w, c), dtype=np.float32)
        lib.pad4_crop_flip_normalize(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
            y0, x0, int(flip),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    p = np.pad(img, ((4, 4), (4, 4), (0, 0)), mode="constant")
    crop = p[y0 : y0 + h, x0 : x0 + w]
    if flip:
        crop = crop[:, ::-1]
    return crop.astype(np.float32) / 255.0 * 2.0 - 1.0
