"""ctypes bindings for the native image-IO core (native/image_io.cpp).

Builds the shared library on first use with g++ (cached next to the source
when writable, else under ~/.cache/stablekeypoints_tpu), loads it via
ctypes, and degrades gracefully to None if no toolchain/libjpeg is
available — callers keep the PIL path as fallback.

Source resolution order (first hit wins):
  1. $SKT_NATIVE_SRC (explicit override)
  2. repo checkout: <repo>/native/image_io.cpp (editable installs / in-repo)
  3. installed wheel: stablekeypoints_tpu/_native_src/image_io.cpp
     (staged there by setup.py's build_py hook)

Eager build (the documented install-time step; otherwise built lazily on
first image load):  python -m stablekeypoints_tpu.utils.native --build
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["load_library", "decode_resize_jpeg", "resize_normalize", "available"]

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REPO_ROOT = os.path.dirname(_PKG_DIR)


def _find_src() -> Optional[str]:
    candidates = [
        os.environ.get("SKT_NATIVE_SRC"),
        os.path.join(_REPO_ROOT, "native", "image_io.cpp"),
        os.path.join(_PKG_DIR, "_native_src", "image_io.cpp"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def _build_dirs(src: str):
    env = os.environ.get("SKT_NATIVE_BUILD_DIR")
    if env:
        return [env]
    return [
        os.path.join(os.path.dirname(src), "build"),
        os.path.join(os.path.expanduser("~"), ".cache", "stablekeypoints_tpu"),
    ]


_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build(src: str) -> Optional[str]:
    """Compile src -> libskt_image_io.so; returns the lib path or None."""
    for build_dir in _build_dirs(src):
        lib_path = os.path.join(build_dir, "libskt_image_io.so")
        if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(src):
            return lib_path
        try:
            os.makedirs(build_dir, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 src, "-o", lib_path, "-ljpeg"],
                check=True, capture_output=True, timeout=120,
            )
            return lib_path
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            continue  # unwritable dir / missing toolchain: try next location
    return None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = _find_src()
        if src is None:
            return None
        lib_path = _build(src)
        if lib_path is None:
            return None
        try:
            lib = ctypes.CDLL(lib_path)
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


if __name__ == "__main__":  # python -m stablekeypoints_tpu.utils.native --build
    import argparse

    ap = argparse.ArgumentParser(description="Build/check the native IO core.")
    ap.add_argument("--build", action="store_true", help="build eagerly now")
    ap.parse_args()  # --build is implied; kept for self-documenting CLIs
    src = _find_src()
    if src is None:
        raise SystemExit("native source not found (checked $SKT_NATIVE_SRC, "
                         "repo native/, packaged _native_src/)")
    lib_path = _build(src)
    if lib_path is None:
        raise SystemExit(f"build failed (g++/libjpeg missing?) for {src}")
    print(f"built {lib_path} from {src}; loadable={load_library() is not None}")
