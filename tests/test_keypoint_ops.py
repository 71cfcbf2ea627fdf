"""Unit tests for argmax-family ops and Gaussian targets against naive numpy."""

import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.ops import gaussians, keypoints


def test_find_max_pixel_simple():
    m = np.zeros((2, 8, 8), dtype=np.float32)
    m[0, 3, 5] = 1.0
    m[1, 7, 0] = 2.0
    out = np.asarray(keypoints.find_max_pixel(jnp.asarray(m)))
    np.testing.assert_allclose(out, [[3.5, 5.5], [7.5, 0.5]])


def test_find_max_pixel_tie_first_wins():
    m = np.zeros((1, 4, 4), dtype=np.float32)
    m[0, 1, 2] = 1.0
    m[0, 2, 1] = 1.0  # later in row-major order
    out = np.asarray(keypoints.find_max_pixel(jnp.asarray(m)))
    np.testing.assert_allclose(out, [[1.5, 2.5]])


def test_mask_radius_keeps_strictly_outside():
    m = np.ones((1, 16, 16), dtype=np.float32)
    out = np.asarray(keypoints.mask_radius(jnp.asarray(m), jnp.asarray([[8.0, 8.0]]), 3.0))
    ys, xs = np.mgrid[0:16, 0:16]
    expected = ((xs - 8.0) ** 2 + (ys - 8.0) ** 2 > 9.0).astype(np.float32)
    np.testing.assert_allclose(out[0], expected)


def test_find_k_max_pixels_masks_between_iterations():
    m = np.zeros((1, 40, 40), dtype=np.float32)
    m[0, 10, 10] = 3.0
    m[0, 11, 11] = 2.5  # inside 0.05*40=2 radius of first max -> masked
    m[0, 30, 5] = 2.0
    pts = np.asarray(keypoints.find_k_max_pixels(jnp.asarray(m), num=2))
    np.testing.assert_allclose(pts[0], [[10.5, 10.5]])
    np.testing.assert_allclose(pts[1], [[30.5, 5.5]])


def test_pixel_from_weighted_avg_peak():
    m = np.zeros((1, 32, 32), dtype=np.float32)
    m[0, 10, 20] = 1.0
    out = np.asarray(keypoints.pixel_from_weighted_avg(jnp.asarray(m), distance=5.0))
    np.testing.assert_allclose(out, [[10.5, 20.5]], atol=1e-4)


def test_pixel_from_weighted_avg_masks_far_mass():
    m = np.zeros((1, 32, 32), dtype=np.float32)
    m[0, 10, 10] = 1.0
    m[0, 30, 30] = 0.9  # outside distance-5 disc: ignored
    out = np.asarray(keypoints.pixel_from_weighted_avg(jnp.asarray(m), distance=5.0))
    np.testing.assert_allclose(out, [[10.5, 10.5]], atol=1e-4)


def test_gaussian_circle_peak_and_decay():
    pos = jnp.asarray([[0.5, 0.25]])  # (y, x) normalized
    g = np.asarray(gaussians.gaussian_circle(pos, size=64, sigma=2.0))[0]
    # peak at pixel whose center (i+0.5, j+0.5) is closest to (32, 16)
    idx = np.unravel_index(np.argmax(g), g.shape)
    assert idx in ((31, 15), (32, 16), (31, 16), (32, 15))
    assert g.max() <= 1.0 + 1e-6
    # value matches closed form at a nearby pixel (far pixels are denormal)
    y, x = 30, 20
    d2 = ((y + 0.5) - 32.0) ** 2 + ((x + 0.5) - 16.0) ** 2
    np.testing.assert_allclose(g[y, x], np.exp(-d2 / (2 * 4.0)), rtol=1e-5)


def test_gaussian_circles_averages_subjects():
    pos = jnp.asarray([[[0.25, 0.25]], [[0.75, 0.75]]])  # [2 subjects, 1 map, 2]
    g = np.asarray(gaussians.gaussian_circles(pos, size=32, sigma=1.0))
    g0 = np.asarray(gaussians.gaussian_circle(jnp.asarray([[0.25, 0.25]]), 32, 1.0))[0]
    g1 = np.asarray(gaussians.gaussian_circle(jnp.asarray([[0.75, 0.75]]), 32, 1.0))[0]
    np.testing.assert_allclose(g[0], (g0 + g1) / 2, rtol=1e-5, atol=1e-7)
