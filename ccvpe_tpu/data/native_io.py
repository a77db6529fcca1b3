"""ctypes bindings for the native decode/resize/normalize library
(native/io.cc). Falls back to the PIL path transparently when the shared
library has not been built (`make -C native`)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

from ccvpe_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_native", "libccvpe_io.so")
_lib = None
_tried = False


def _build() -> bool:
    native_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ccvpe_decode_resize.restype = ctypes.c_int
    lib.ccvpe_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    try:  # v2 symbol: uint8 ingest (rebuild the .so if missing)
        lib.ccvpe_decode_resize_u8.restype = ctypes.c_int
        lib.ccvpe_decode_resize_u8.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int]
    except AttributeError:
        pass
    lib.ccvpe_load_batch.restype = ctypes.c_int
    lib.ccvpe_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_image_native(path: str, size_hw) -> Optional[np.ndarray]:
    """Decode+resize+normalize one image to [H, W, 3] f32, or None on
    failure (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    h, w = size_hw
    out = np.empty((h, w, 3), np.float32)
    rc = lib.ccvpe_decode_resize(
        path.encode(), _fptr(out), h, w,
        _fptr(np.ascontiguousarray(IMAGENET_MEAN)),
        _fptr(np.ascontiguousarray(IMAGENET_STD)))
    return out if rc == 0 else None


def load_image_raw_native(path: str, size_hw) -> Optional[np.ndarray]:
    """Decode+resize one image to uint8 [H, W, 3] (no normalization), or
    None on failure / v1 library without the symbol."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ccvpe_decode_resize_u8"):
        return None
    h, w = size_hw
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.ccvpe_decode_resize_u8(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w)
    return out if rc == 0 else None


def load_batch_native(paths: Sequence[str], size_hw,
                      num_threads: int = 8) -> Optional[np.ndarray]:
    """Decode a batch into [N, H, W, 3] f32 with the native thread pool."""
    lib = get_lib()
    if lib is None:
        return None
    h, w = size_hw
    n = len(paths)
    out = np.empty((n, h, w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.ccvpe_load_batch(
        arr, n, _fptr(out), h, w,
        _fptr(np.ascontiguousarray(IMAGENET_MEAN)),
        _fptr(np.ascontiguousarray(IMAGENET_STD)), num_threads)
    return out if rc == 0 else None
