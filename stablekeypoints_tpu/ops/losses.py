"""Training losses: sharpening and equivariance.

Semantics of the reference losses (optimize.py:157-206):
  * sharpening — each selected attention map should look like a Gaussian
    bump at its own (iteratively masked) argmax;
  * equivariance — the maps of an affine-transformed image, inverse-warped,
    should match the maps of the original image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stablekeypoints_tpu.ops.gaussians import gaussian_circles
from stablekeypoints_tpu.ops.keypoints import find_k_max_pixels
from stablekeypoints_tpu.ops.transforms import apply_inverse_affine

__all__ = ["sharpening_loss", "equivariance_loss"]


def sharpening_loss(
    maps: jnp.ndarray, sigma: float = 1.0, num_subjects: int = 1
) -> jnp.ndarray:
    """MSE between maps and Gaussians at their own argmaxes.

    maps: [K, H, W] (selected token maps). The argmax positions carry no
    gradient (integer argmax in the reference, optimize.py:166-179).
    """
    h = maps.shape[-1]
    pos = find_k_max_pixels(jax.lax.stop_gradient(maps), num=num_subjects) / h
    target = gaussian_circles(pos, size=h, sigma=sigma)
    return jnp.mean((maps - target) ** 2)


def equivariance_loss(
    maps: jnp.ndarray, maps_transformed: jnp.ndarray, theta: jnp.ndarray, params=None
) -> jnp.ndarray:
    """MSE(maps, inverse-warp(maps_transformed)).

    maps, maps_transformed: [K, H, W]; theta: [2, 3], the affine that
    produced the transformed image (optimize.py:157-163). The K selected
    maps ride the warp as channels of one image. `params` (the static
    AffineParams the theta was drawn from) routes the warp onto the MXU
    fast path.
    """
    warped = apply_inverse_affine(
        maps_transformed.transpose(1, 2, 0)[None], theta[None], params=params
    )[0].transpose(2, 0, 1)
    return jnp.mean((maps - warped) ** 2)
