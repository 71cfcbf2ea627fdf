"""ctypes bindings for the native image-IO core (native/image_io.cpp).

Builds the shared library on first use with g++ (cached in
`native/build/`), loads it via ctypes, and degrades gracefully to None if
no toolchain/libjpeg is available — callers keep the PIL path as fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["load_library", "decode_resize_jpeg", "resize_normalize", "available"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "image_io.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libskt_image_io.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        _SRC, "-o", _LIB_PATH, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.skt_decode_resize_jpeg.restype = ctypes.c_int
        lib.skt_decode_resize_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.skt_resize_normalize.restype = ctypes.c_int
        lib.skt_resize_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def decode_resize_jpeg(data: bytes, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """JPEG bytes -> [out_h, out_w, 3] float32 in [0, 1], or None on failure."""
    lib = load_library()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), np.float32)
    rc = lib.skt_decode_resize_jpeg(
        data, len(data), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def resize_normalize(rgb: np.ndarray, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """uint8 [H, W, 3] -> float32 [out_h, out_w, 3] in [0, 1], torch bilinear
    (align_corners=False, no antialias) semantics."""
    lib = load_library()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    out = np.empty((out_h, out_w, 3), np.float32)
    rc = lib.skt_resize_normalize(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rgb.shape[0], rgb.shape[1], out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None
