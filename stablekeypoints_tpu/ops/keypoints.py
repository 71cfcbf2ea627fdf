"""Keypoint extraction from attention heatmaps (argmax family).

Jit-compatible counterparts of the reference ops in eval.py:39-155:
  * `find_max_pixel`      — argmax with half-pixel centering,
  * `find_k_max_pixels`   — iterative argmax with radius masking,
  * `mask_radius`         — zero out a disc around a point,
  * `pixel_from_weighted_avg` — soft-argmax restricted to a disc around the
    argmax.

All loops are fixed-trip-count (`lax.fori_loop` / `lax.scan`), all shapes
static. Coordinates are (y, x) = (row, col), matching the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "find_max_pixel",
    "find_k_max_pixels",
    "mask_radius",
    "pixel_from_weighted_avg",
]


def find_max_pixel(maps: jnp.ndarray) -> jnp.ndarray:
    """Argmax location of each map, offset to the pixel center.

    maps: [B, H, W] -> [B, 2] of (row + 0.5, col + 0.5). First maximum wins
    on ties, like torch.argmax (eval.py:39-60).
    """
    b, h, w = maps.shape
    flat_idx = jnp.argmax(maps.reshape(b, -1), axis=-1)
    rows = flat_idx // w
    cols = flat_idx % w
    return jnp.stack([rows, cols], axis=-1).astype(jnp.float32) + 0.5


def mask_radius(maps: jnp.ndarray, coords: jnp.ndarray, radius: float) -> jnp.ndarray:
    """Zero all pixels with squared distance <= radius^2 from coords.

    maps: [B, H, W]; coords: [B, 2] in (y, x) pixel units. Pixels strictly
    outside the radius are kept (eval.py:83-111 keeps `squared_dist >
    radius**2`).
    """
    b, h, w = maps.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    dist_sq = (xs - coords[:, 1, None, None]) ** 2 + (ys - coords[:, 0, None, None]) ** 2
    keep = dist_sq > radius**2
    return maps * keep.astype(maps.dtype)


def find_k_max_pixels(maps: jnp.ndarray, num: int) -> jnp.ndarray:
    """Iterative argmax: take the max, mask a disc of radius 0.05*H, repeat.

    maps: [B, H, W] -> [num, B, 2] (eval.py:62-81).
    """
    h = maps.shape[1]
    radius = 0.05 * h

    def step(carry, _):
        m = carry
        point = find_max_pixel(m)
        return mask_radius(m, point, radius), point

    _, points = jax.lax.scan(step, maps, None, length=num)
    return points


def pixel_from_weighted_avg(maps: jnp.ndarray, distance: float = 5.0) -> jnp.ndarray:
    """Soft-argmax within `distance` pixels of the hard argmax.

    maps: [B, H, W] -> [B, 2] of (y, x) + 0.5. Matches eval.py:113-155:
    pixels farther than `distance` (Euclidean, from the *floored* argmax
    center) are zeroed, the rest normalized into a distribution whose mean
    coordinate is returned. Pass distance=-1 to skip masking.
    """
    b, m, n = maps.shape
    if distance != -1:
        # reference floors the (argmax + 0.5) coords via .long()
        max_px = jnp.floor(find_max_pixel(maps)).astype(jnp.float32)
        ys = jnp.arange(m, dtype=jnp.float32)[None, :, None]
        xs = jnp.arange(n, dtype=jnp.float32)[None, None, :]
        dist = jnp.sqrt(
            (ys - max_px[:, 0, None, None]) ** 2 + (xs - max_px[:, 1, None, None]) ** 2
        )
        maps = jnp.where(dist > distance, 0.0, maps)

    total = jnp.sum(maps, axis=(1, 2), keepdims=True)
    norm = maps / (total + 1e-6)
    ys = jnp.arange(m, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(n, dtype=jnp.float32)[None, None, :]
    y_avg = jnp.sum(ys * norm, axis=(1, 2))
    x_avg = jnp.sum(xs * norm, axis=(1, 2))
    return jnp.stack([y_avg, x_avg], axis=-1) + 0.5
