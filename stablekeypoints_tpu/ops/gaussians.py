"""Gaussian bump targets for the sharpening loss.

Semantics of the reference's `gaussian_circle` / `gaussian_circles`
(optimize_token.py:203-240): an unnormalized Gaussian centered at a
normalized (y, x) position, evaluated on a grid of half-pixel centers; for
multiple subjects the per-subject bumps are averaged. Vectorized here (the
reference loops in Python over the subject axis).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["gaussian_circle", "gaussian_circles"]


def gaussian_circle(pos: jnp.ndarray, size: int, sigma: float) -> jnp.ndarray:
    """Gaussian bumps at normalized positions.

    pos: [..., 2] in (y, x) order, values in [0, 1].
    Returns [..., size, size] with exp(-d^2 / (2 sigma^2)) evaluated at
    half-pixel grid centers (grid + 0.5), unnormalized peak 1.
    """
    p = pos * size  # pixel coordinates
    coords = jnp.arange(size, dtype=jnp.float32) + 0.5
    dy = coords - p[..., 0:1]  # [..., size]
    dx = coords - p[..., 1:2]
    dist_sq = dy[..., :, None] ** 2 + dx[..., None, :] ** 2  # [..., size, size]
    return jnp.exp(-dist_sq / (2.0 * sigma**2))


def gaussian_circles(pos: jnp.ndarray, size: int, sigma: float) -> jnp.ndarray:
    """Average of per-subject Gaussians.

    pos: [num_subjects, batch, 2] normalized (y, x) — the output layout of
    `find_k_max_pixels`. Returns [batch, size, size], the mean over the
    subject axis (optimize_token.py:226-240).
    """
    return gaussian_circle(pos, size, sigma).mean(axis=0)
