"""Tests for the alternative/legacy ops."""

import jax
import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.ops import extras
from stablekeypoints_tpu.ops.gaussians import gaussian_circle


def test_gaussian_kernel_sums_to_one():
    k = np.asarray(extras.gaussian_kernel_2d(5, 1.0))
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[2, 2] == k.max()


def test_variance_loss_prefers_peaked():
    peaked = np.asarray(gaussian_circle(jnp.asarray([[0.5, 0.5]]), 32, 1.0))
    broad = np.asarray(gaussian_circle(jnp.asarray([[0.5, 0.5]]), 32, 8.0))
    lv_p = float(extras.variance_loss(jnp.asarray(peaked)))
    lv_b = float(extras.variance_loss(jnp.asarray(broad)))
    assert lv_p < lv_b


def test_differentiable_argmax_matches_peak_and_grads():
    maps = gaussian_circle(jnp.asarray([[0.25, 0.75]]), 64, 2.0)
    pos = np.asarray(extras.differentiable_argmax(maps))
    # gaussian_circle centers mass at half-pixel grid points: expectation
    # sits at pos*size - 0.5 in index space
    np.testing.assert_allclose(pos, [[0.25 * 64 - 0.5, 0.75 * 64 - 0.5]], atol=0.05)
    g = jax.grad(lambda m: extras.differentiable_argmax(m)[0, 0])(maps)
    assert np.abs(np.asarray(g)).max() > 0


def test_gaussian_loss_finite_and_differentiable():
    flat = jnp.ones((2, 16, 16))
    assert np.isfinite(float(extras.gaussian_loss(flat, temperature=1.0)))
    m = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16)).astype(np.float32))
    g = jax.grad(lambda x: extras.gaussian_loss(x, temperature=1.0))(m)
    assert np.isfinite(np.asarray(g)).all()


def test_find_corresponding_points():
    a = np.zeros((5, 16, 16), np.float32)
    b = np.zeros((5, 16, 16), np.float32)
    a[2, 4, 4] = 5.0
    b[2, 10, 12] = 5.0
    a[0, 1, 1] = 0.1
    b[0, 1, 1] = 0.1
    order, pa, pb = extras.find_corresponding_points(jnp.asarray(a), jnp.asarray(b), 2)
    assert int(order[0]) == 2
    np.testing.assert_allclose(np.asarray(pa[0]), [4.5, 4.5])
    np.testing.assert_allclose(np.asarray(pb[0]), [10.5, 12.5])


def test_mask_attn_zeroes_background():
    img = np.ones((32, 32, 3), np.float32)
    img[:16] = 0.0  # top half black
    attn = jnp.ones((2, 16, 16))
    out = np.asarray(extras.mask_attn(jnp.asarray(img), attn))
    assert out[:, :7].max() == 0.0
    assert out[:, 9:].min() > 0.0


def test_find_pos_from_index():
    m = np.zeros((1, 9, 9), np.float32)
    m[0, 2, 6] = 1.0
    pos = np.asarray(extras.find_pos_from_index(jnp.asarray(m)))
    np.testing.assert_allclose(pos, [[6 / 8, 2 / 8]])
