"""Invertible affine augmentation (JAX, differentiable, device-resident).

Functional counterpart of the reference's `RandomAffineWithInverse`
(invertable_transform.py:6-92): a random rotation/scale/translation is drawn
per batch element, applied via an affine sampling grid + bilinear resample
with zero padding (torch `affine_grid`/`grid_sample`, align_corners=False
semantics), and the exact inverse warp is available from the same theta.

Unlike the reference (CPU-side torch), everything here runs on device inside
jit and thetas are explicit values (no hidden `last_params` state), so the
forward and inverse warps compose freely inside a compiled training step.
Arrays are NHWC.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "AffineParams",
    "make_theta",
    "sample_thetas",
    "invert_theta",
    "affine_grid",
    "grid_sample_bilinear",
    "warp_affine",
    "apply_affine",
    "apply_inverse_affine",
]


class AffineParams(NamedTuple):
    """Ranges for random affine sampling (reference defaults main.py:159-179)."""

    degrees: float = 15.0
    scale: tuple[float, float] = (0.8, 1.0)
    translate: tuple[float, float] = (0.25, 0.25)


def make_theta(angle_deg, scale, tx, ty) -> jnp.ndarray:
    """Build the 2x3 affine matrix the reference builds.

    Matches invertable_transform.py:22-36: theta = [[cos, sin, tx],
    [-sin, cos, ty]] with the rotation part scaled by `scale`. Accepts
    scalars or [B]-vectors; returns [..., 2, 3].
    """
    angle = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    c = jnp.cos(angle) * scale
    s = jnp.sin(angle) * scale
    row0 = jnp.stack([c, s, jnp.asarray(tx, jnp.float32) * jnp.ones_like(c)], axis=-1)
    row1 = jnp.stack([-s, c, jnp.asarray(ty, jnp.float32) * jnp.ones_like(c)], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def sample_thetas(key: jax.Array, batch: int, params: AffineParams) -> jnp.ndarray:
    """Draw [B, 2, 3] random affine thetas (distribution of invertable_transform.py:41-57)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    angle = jax.random.uniform(
        k1, (batch,), minval=-params.degrees, maxval=params.degrees
    )
    scale = jax.random.uniform(
        k2, (batch,), minval=params.scale[0], maxval=params.scale[1]
    )
    tx = jax.random.uniform(
        k3, (batch,), minval=-params.translate[0], maxval=params.translate[0]
    )
    ty = jax.random.uniform(
        k4, (batch,), minval=-params.translate[1], maxval=params.translate[1]
    )
    return make_theta(angle, scale, tx, ty)


def invert_theta(theta: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of a [..., 2, 3] affine matrix (3x3 augment + inverse).

    Semantics of invertable_transform.py:72-92. Closed form (the 3x3 inverse
    of [[A, t], [0, 1]] is [[A^-1, -A^-1 t], [0, 1]]), avoiding a generic
    linear solve on device.
    """
    a, b, tx = theta[..., 0, 0], theta[..., 0, 1], theta[..., 0, 2]
    c, d, ty = theta[..., 1, 0], theta[..., 1, 1], theta[..., 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def affine_grid(theta: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Sampling grid of torch `F.affine_grid(theta, size, align_corners=False)`.

    theta: [B, 2, 3]. Returns [B, H, W, 2] of (x, y) source coordinates in
    normalized [-1, 1] space with half-pixel centers.
    """
    xs = (2.0 * jnp.arange(width, dtype=jnp.float32) + 1.0) / width - 1.0
    ys = (2.0 * jnp.arange(height, dtype=jnp.float32) + 1.0) / height - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W] each
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # [H, W, 3]
    # grid[b, i, j, :] = theta[b] @ [x, y, 1]
    return jnp.einsum("hwk,bok->bhwo", base, theta)


def grid_sample_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with zero padding, align_corners=False.

    img: [B, H, W, C]; grid: [B, Ho, Wo, 2] of normalized (x, y) coords.
    Returns [B, Ho, Wo, C]. Differentiable in both img and grid.
    """
    b, h, w, c = img.shape
    # unnormalize: half-pixel convention
    ix = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    iy = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    tx = ix - x0
    ty = iy - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        # [B, Ho, Wo, C] gather per batch element
        vals = jax.vmap(lambda im, y, x: im[y, x])(img, yc, xc)
        return vals * valid[..., None].astype(img.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    tx = tx[..., None].astype(img.dtype)
    ty = ty[..., None].astype(img.dtype)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def warp_affine(img: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Apply an affine warp to NHWC images: grid_sample(img, affine_grid(theta))."""
    grid = affine_grid(theta, img.shape[1], img.shape[2])
    return grid_sample_bilinear(img, grid)


def apply_affine(img: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Forward transform (reference `RandomAffineWithInverse.__call__`)."""
    return warp_affine(img, theta)


def apply_inverse_affine(img: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Inverse transform (reference `RandomAffineWithInverse.inverse`)."""
    return warp_affine(img, invert_theta(theta))
