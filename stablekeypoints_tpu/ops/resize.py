"""Image resizing as matrix multiplication (MXU-friendly).

Separable bilinear/bicubic resampling with PyTorch `F.interpolate(...,
align_corners=False)` semantics (the reference relies on torch bicubic for
query upsampling, ptp_utils.py:521-526, and torch bilinear for map
upsampling, optimize.py:63-69). Because all source/target sizes are static
under jit, each 1-D resampling is a constant (out, in) weight matrix and the
2-D resize becomes two matmuls — this maps directly onto the TPU MXU instead
of the gather-based path a naive translation would produce.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_matrix",
    "resize_hw",
    "resize_nhwc",
    "upsample_bicubic",
    "upsample_bilinear",
]


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel; a=-0.75 matches torch bicubic."""
    t = np.abs(t)
    out = np.zeros_like(t)
    m1 = t <= 1.0
    m2 = (t > 1.0) & (t < 2.0)
    out[m1] = ((a + 2.0) * t[m1] - (a + 3.0)) * t[m1] * t[m1] + 1.0
    out[m2] = a * (t[m2] * (t[m2] * (t[m2] - 5.0) + 8.0) - 4.0)
    return out


@functools.lru_cache(maxsize=None)
def _resize_matrix_np(in_size: int, out_size: int, method: str) -> np.ndarray:
    """(out_size, in_size) resampling matrix, torch align_corners=False."""
    scale = in_size / out_size
    # half-pixel source coordinates of each output center
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0  # fractional offset in [0, 1)

    w = np.zeros((out_size, in_size), dtype=np.float64)
    if method == "bilinear":
        taps = [(0, 1.0 - t), (1, t)]
    elif method == "bicubic":
        taps = [(k, _cubic_kernel(t - k)) for k in (-1, 0, 1, 2)]
    else:
        raise ValueError(f"unknown resize method: {method}")

    rows = np.arange(out_size)
    for offset, weight in taps:
        # torch clamps tap indices to the valid range (edge replication)
        cols = np.clip(i0 + offset, 0, in_size - 1)
        np.add.at(w, (rows, cols), weight)
    return w.astype(np.float32)


def resize_matrix(in_size: int, out_size: int, method: str) -> jnp.ndarray:
    return jnp.asarray(_resize_matrix_np(in_size, out_size, method))


def resize_hw(x: jnp.ndarray, out_h: int, out_w: int, method: str) -> jnp.ndarray:
    """Resize [..., H, W] -> [..., out_h, out_w] (channels-first style maps)."""
    h, w = x.shape[-2], x.shape[-1]
    wh = resize_matrix(h, out_h, method).astype(x.dtype)
    ww = resize_matrix(w, out_w, method).astype(x.dtype)
    x = jnp.einsum("oh,...hw->...ow", wh, x)
    x = jnp.einsum("pw,...ow->...op", ww, x)
    return x


def resize_nhwc(x: jnp.ndarray, out_h: int, out_w: int, method: str) -> jnp.ndarray:
    """Resize [..., H, W, C] -> [..., out_h, out_w, C]."""
    h, w = x.shape[-3], x.shape[-2]
    wh = resize_matrix(h, out_h, method).astype(x.dtype)
    ww = resize_matrix(w, out_w, method).astype(x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", wh, x)
    x = jnp.einsum("pw,...owc->...opc", ww, x)
    return x


def upsample_bicubic(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    return resize_nhwc(x, out_h, out_w, "bicubic")


def upsample_bicubic_headmajor(x5: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """[b, y, x, k, d] -> [b, k, out_h*out_w, d] bicubic over (y, x).

    Same taps/weights/contraction order as `upsample_bicubic` (row pass then
    column pass), but the output is emitted head-major so the capture kernel
    consumes it directly — the resize matmuls absorb what would otherwise be
    a strided [B, N, H, D] -> [B, H, N, D] relayout of the upsampled queries
    (d=40-element chunks, the slowest transpose shape on TPU).
    """
    b, h, w, k, d = x5.shape
    wh = resize_matrix(h, out_h, "bicubic").astype(x5.dtype)
    ww = resize_matrix(w, out_w, "bicubic").astype(x5.dtype)
    t = jnp.einsum("Oy,byxkd->bkOxd", wh, x5)
    t = jnp.einsum("Px,bkOxd->bkOPd", ww, t)
    return t.reshape(b, k, out_h * out_w, d)


def upsample_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    return resize_nhwc(x, out_h, out_w, "bilinear")
