"""Loss semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.ops import losses
from stablekeypoints_tpu.ops.gaussians import gaussian_circle
from stablekeypoints_tpu.ops import transforms as T


def test_sharpening_loss_zero_for_perfect_gaussians():
    pos = jnp.asarray([[0.3, 0.6], [0.7, 0.2]])
    maps = gaussian_circle(pos, size=64, sigma=1.0)
    loss = losses.sharpening_loss(maps, sigma=1.0, num_subjects=1)
    assert float(loss) < 1e-4


def test_sharpening_loss_positive_for_flat_maps():
    maps = jnp.ones((3, 32, 32)) * 0.5
    loss = losses.sharpening_loss(maps, sigma=2.0)
    assert float(loss) > 0.01


def test_sharpening_loss_has_gradient():
    maps = jnp.ones((2, 16, 16)) * 0.3
    g = jax.grad(lambda m: losses.sharpening_loss(m, sigma=2.0))(maps)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_equivariance_loss_zero_for_identity():
    rng = np.random.default_rng(0)
    maps = jnp.asarray(rng.standard_normal((4, 32, 32)).astype(np.float32))
    theta = T.make_theta(jnp.array([0.0]), jnp.array([1.0]), jnp.array([0.0]), jnp.array([0.0]))[0]
    loss = losses.equivariance_loss(maps, maps, theta)
    assert float(loss) < 1e-8


def test_equivariance_loss_consistent_under_transform():
    # maps_T = warp(maps) -> inverse-warp(maps_T) ~= maps on interior
    pos = jnp.asarray([[0.5, 0.5]])
    maps = gaussian_circle(pos, size=64, sigma=6.0)  # smooth map
    theta = T.make_theta(jnp.array([8.0]), jnp.array([0.9]), jnp.array([0.05]), jnp.array([-0.05]))
    maps_t = T.apply_affine(maps.transpose(1, 2, 0)[None], theta)[0].transpose(2, 0, 1)
    loss = losses.equivariance_loss(maps, maps_t, theta[0])
    assert float(loss) < 5e-4

    # and a wrong theta should be worse
    theta_bad = T.make_theta(jnp.array([-20.0]), jnp.array([1.0]), jnp.array([-0.2]), jnp.array([0.2]))
    loss_bad = losses.equivariance_loss(maps, maps_t, theta_bad[0])
    assert float(loss_bad) > 10 * float(loss)
