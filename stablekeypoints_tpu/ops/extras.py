"""Alternative/legacy ops from the reference kept for API completeness.

These exist in the reference but are not on its default path (SURVEY.md
§2.1 "dead/legacy utils"); several are genuinely useful alternatives
(variance regularizer, fully differentiable soft-argmax, cross-image
correspondence scoring), so they're provided as first-class jit-compatible
ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stablekeypoints_tpu.ops.resize import resize_hw, resize_nhwc

__all__ = [
    "gaussian_kernel_2d",
    "gaussian_loss",
    "variance_loss",
    "differentiable_argmax",
    "find_corresponding_points",
    "mask_attn",
    "find_pos_from_index",
]


def gaussian_kernel_2d(size: int, sigma: float) -> jnp.ndarray:
    """Normalized 2-D Gaussian kernel (optimize.py:82-103). size odd."""
    center = size // 2
    coords = jnp.arange(size, dtype=jnp.float32) - center
    x, y = jnp.meshgrid(coords, coords)
    k = jnp.exp(-(x**2 + y**2) / (2.0 * sigma**2))
    return k / jnp.sum(k)


def gaussian_loss(
    attn_map: jnp.ndarray, kernel_size: int = 5, sigma: float = 1.0, temperature: float = 1e-4
) -> jnp.ndarray:
    """MSE between the map and its own detached softmax(map/T) peaks.

    Matches the reference's EXECUTED semantics (optimize.py:106-135): it
    also builds a Gaussian-blurred target there, but that target is never
    used — the returned loss is `F.mse_loss(attn_map, attn_probs)` with the
    probs detached. A/B-tested against the reference code in
    tests/test_reference_ab.py. kernel_size/sigma kept for signature parity
    (they only affect the reference's dead target computation).
    """
    del kernel_size, sigma  # only used by the reference's dead code path
    t, h, w = attn_map.shape
    p = jax.nn.softmax(attn_map.reshape(t, -1) / temperature, axis=-1).reshape(t, h, w)
    p = jax.lax.stop_gradient(p)
    return jnp.mean((attn_map - p) ** 2)


def variance_loss(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Mean spatial standard deviation of normalized heatmaps
    (optimize.py:209-241)."""
    b, m, n = heatmaps.shape
    total = jnp.sum(heatmaps, axis=(1, 2), keepdims=True)
    p = heatmaps / (total + 1e-6)
    ys = jnp.arange(m, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(n, dtype=jnp.float32)[None, None, :]
    y_avg = jnp.sum(ys * p, axis=(1, 2), keepdims=True)
    x_avg = jnp.sum(xs * p, axis=(1, 2), keepdims=True)
    var = jnp.sum(p * ((ys - y_avg) ** 2 + (xs - x_avg) ** 2), axis=(1, 2))
    return jnp.mean(jnp.sqrt(var))


def differentiable_argmax(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmax over the full map: expected (y, x) coordinate
    (optimize.py:244-266). Fully differentiable."""
    b, m, n = heatmaps.shape
    total = jnp.sum(heatmaps, axis=(1, 2), keepdims=True)
    p = heatmaps / (total + 1e-6)
    ys = jnp.arange(m, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(n, dtype=jnp.float32)[None, None, :]
    y = jnp.sum(ys * p, axis=(1, 2))
    x = jnp.sum(xs * p, axis=(1, 2))
    return jnp.stack([y, x], axis=-1)


def find_corresponding_points(
    maps_a: jnp.ndarray, maps_b: jnp.ndarray, num_points: int = 10
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rank tokens by cross-image argmax-value product and return the
    argmax locations in both images for the best `num_points` tokens
    (semantics of eval.py:159-195's correspondence scoring)."""
    from stablekeypoints_tpu.ops.keypoints import find_max_pixel

    t = maps_a.shape[0]
    score = jnp.max(maps_a.reshape(t, -1), axis=-1) * jnp.max(
        maps_b.reshape(t, -1), axis=-1
    )
    order = jnp.argsort(-score)[:num_points]
    pts_a = find_max_pixel(maps_a[order])
    pts_b = find_max_pixel(maps_b[order])
    return order, pts_a, pts_b


def mask_attn(image: jnp.ndarray, attn_map: jnp.ndarray) -> jnp.ndarray:
    """Zero attention where the (downsampled, gray) image is zero
    (ptp_utils.py:275-286) — used with background-masked datasets."""
    c, h, w = attn_map.shape
    down = resize_nhwc(image[None], h, w, "bilinear")[0].mean(axis=-1)
    return attn_map * (down != 0).astype(attn_map.dtype)


def find_pos_from_index(attn_map: jnp.ndarray) -> jnp.ndarray:
    """Argmax as normalized (x, y) in [0, 1] (optimize.py:138-154 layout:
    column-major stack [x, y] normalized by (dim-1))."""
    t, h, w = attn_map.shape
    idx = jnp.argmax(attn_map.reshape(t, -1), axis=-1)
    rows = (idx // w).astype(jnp.float32) / (h - 1)
    cols = (idx % w).astype(jnp.float32) / (w - 1)
    return jnp.stack([cols, rows], axis=1)
