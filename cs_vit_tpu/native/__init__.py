"""Native host-pipeline ops: C fast-crop with transparent numpy fallback.

Compiled on first import with the system C compiler (cc/gcc/clang) into a
cached shared object; loaded via ctypes (no pybind11 dependency). The C code
implements the exact same sampling arithmetic as the numpy path in
``ops/resample.py`` — results match to float rounding — at ~20-50x the speed,
which is what keeps a single host core able to feed the TPU (the bilinear
crop dominated the per-item cost; see BASELINE.md).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = osp.join(osp.dirname(__file__), "fastcrop.c")
_LIB_NAME = "libfastcrop.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_lib() -> Optional[str]:
    cache_dir = os.environ.get(
        "CSVIT_NATIVE_CACHE", osp.join(tempfile.gettempdir(), "cs_vit_tpu_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = osp.join(cache_dir, _LIB_NAME)
    if osp.exists(lib_path) and osp.getmtime(lib_path) >= osp.getmtime(_SRC):
        return lib_path
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-march=native", "-shared", "-fPIC", "-o", lib_path, _SRC, "-lm"],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return lib_path
        except (FileNotFoundError, subprocess.CalledProcessError, subprocess.TimeoutExpired):
            continue
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("CSVIT_DISABLE_NATIVE"):
        return None
    path = _build_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64 = ctypes.c_int64
    fp = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.crop_affine_bilinear_batch.argtypes = [
        fp, i64, i64, i64, i64, fp, fp, i64, i64,
    ]
    lib.crop_affine_bilinear_batch.restype = None
    lib.crop_affine_bilinear_u8_batch.argtypes = [
        u8p, i64, i64, i64, i64, fp, fp, i64, i64,
    ]
    lib.crop_affine_bilinear_u8_batch.restype = None
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def crop_affine_bilinear_batch(
    images: np.ndarray,   # [N, H, W, C] float32 in [0,1] OR uint8 in [0,255]
    corners: np.ndarray,  # [N, 4, 2] float32 (tl, tr, br, bl)
    out_h: int,
    out_w: int,
) -> Optional[np.ndarray]:
    """C fast path; returns None if the native library is unavailable.

    Output is always float32: [0,1]-scaled for uint8 sources (the u8 kernel
    folds the 1/255 into the interpolation, so decoded frames skip the
    full-frame float conversion entirely).
    """
    lib = _load()
    if lib is None:
        return None
    corners = np.ascontiguousarray(corners, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    if images.dtype == np.uint8:
        images = np.ascontiguousarray(images)
        N, H, W, C = images.shape
        out = np.empty((N, out_h, out_w, C), np.float32)
        lib.crop_affine_bilinear_u8_batch(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), N, H, W, C,
            corners.ctypes.data_as(fp),
            out.ctypes.data_as(fp), out_h, out_w,
        )
        return out
    images = np.ascontiguousarray(images, np.float32)
    N, H, W, C = images.shape
    out = np.empty((N, out_h, out_w, C), np.float32)
    lib.crop_affine_bilinear_batch(
        images.ctypes.data_as(fp), N, H, W, C,
        corners.ctypes.data_as(fp),
        out.ctypes.data_as(fp), out_h, out_w,
    )
    return out
