"""Parity of affine warp vs torch affine_grid/grid_sample, and exact inverses."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from stablekeypoints_tpu.ops import transforms as T


def _torch_warp(x_nhwc, theta):
    img = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)
    th = torch.from_numpy(np.asarray(theta))
    grid = F.affine_grid(th, img.size(), align_corners=False)
    out = F.grid_sample(img, grid, align_corners=False)
    return out.permute(0, 2, 3, 1).numpy()


def _random_thetas(key, batch):
    return T.sample_thetas(
        key, batch, T.AffineParams(degrees=15.0, scale=(0.8, 1.0), translate=(0.25, 0.25))
    )


def test_affine_grid_matches_torch():
    theta = np.asarray(_random_thetas(jax.random.PRNGKey(0), 3))
    ours = np.asarray(T.affine_grid(jnp.asarray(theta), 20, 24))
    ref = F.affine_grid(torch.from_numpy(theta), (3, 1, 20, 24), align_corners=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_warp_matches_torch_grid_sample():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 32, 32, 4), dtype=np.float32)
    theta = np.asarray(_random_thetas(jax.random.PRNGKey(1), 3))
    ours = np.asarray(T.apply_affine(jnp.asarray(x), jnp.asarray(theta)))
    ref = _torch_warp(x, theta)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_inverse_warp_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 16, 16, 2), dtype=np.float32)
    theta = np.asarray(_random_thetas(jax.random.PRNGKey(2), 2))
    ours = np.asarray(T.apply_inverse_affine(jnp.asarray(x), jnp.asarray(theta)))

    th = torch.from_numpy(theta)
    aug = torch.cat([th, torch.tensor([[[0.0, 0.0, 1.0]]]).expand(2, -1, -1)], dim=1)
    th_inv = torch.inverse(aug)[:, :2, :].numpy()
    ref = _torch_warp(x, th_inv)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_invert_theta_is_exact_inverse():
    theta = np.asarray(_random_thetas(jax.random.PRNGKey(4), 5))
    inv = np.asarray(T.invert_theta(jnp.asarray(theta)))
    for t, ti in zip(theta, inv):
        a = np.vstack([t, [0, 0, 1]])
        b = np.vstack([ti, [0, 0, 1]])
        np.testing.assert_allclose(a @ b, np.eye(3), atol=1e-5)


def test_forward_then_inverse_is_identity_interior():
    # a mild transform on a smooth image: interior pixels survive the round trip
    ys_, xs_ = np.mgrid[0:64, 0:64].astype(np.float32)
    smooth = np.sin(ys_ / 9.0) * np.cos(xs_ / 7.0) + 0.5 * np.sin((xs_ + ys_) / 11.0)
    xs = jnp.asarray(smooth[None, :, :, None])
    theta = T.make_theta(jnp.array([5.0]), jnp.array([0.95]), jnp.array([0.02]), jnp.array([-0.03]))
    y = T.apply_inverse_affine(T.apply_affine(xs, theta), theta)
    interior = (slice(None), slice(12, 52), slice(12, 52), slice(None))
    np.testing.assert_allclose(np.asarray(y[interior]), np.asarray(xs[interior]), atol=0.05)


def test_sample_thetas_ranges():
    thetas = _random_thetas(jax.random.PRNGKey(5), 256)
    # translation column within bounds
    assert np.all(np.abs(np.asarray(thetas[:, :, 2])) <= 0.25 + 1e-6)
    # scale = sqrt(det) within [0.8, 1.0]
    det = np.asarray(
        thetas[:, 0, 0] * thetas[:, 1, 1] - thetas[:, 0, 1] * thetas[:, 1, 0]
    )
    s = np.sqrt(det)
    assert np.all(s >= 0.8 - 1e-5) and np.all(s <= 1.0 + 1e-5)


def test_warp_affine_mxu_matches_gather_path():
    """The tiled-matmul warp must reproduce the per-pixel-gather warp
    exactly (same bilinear taps/weights/zero padding; fp-order only)."""
    import jax as _jax
    from stablekeypoints_tpu.ops.transforms import (
        AffineParams,
        invert_theta,
        sample_thetas,
        warp_affine,
        warp_affine_mxu,
    )

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (3, 256, 256, 11)).astype(np.float32))
    thetas = sample_thetas(_jax.random.PRNGKey(1), 3, AffineParams())
    for th in (thetas, invert_theta(thetas)):
        a = np.asarray(warp_affine(img, th))
        b = np.asarray(warp_affine_mxu(img, th))
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_warp_affine_static_dispatch():
    """apply_affine with params routes to the MXU path only when the static
    source-stride bound fits the window; extreme ranges fall back to the
    gather path and stay correct."""
    import jax as _jax
    from stablekeypoints_tpu.ops.transforms import (
        AffineParams,
        apply_affine,
        sample_thetas,
        warp_affine,
    )

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32))
    # big scale-down (inverse scale 5x): bound exceeds the window
    wild = AffineParams(degrees=40.0, scale=(0.2, 0.3), translate=(0.4, 0.4))
    thetas = sample_thetas(_jax.random.PRNGKey(3), 2, wild)
    got = np.asarray(apply_affine(img, thetas, params=wild))
    want = np.asarray(warp_affine(img, thetas))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert wild.max_row_sum(inverse=True) * 63 + 4 > 128  # would not fit
    assert AffineParams().max_row_sum(inverse=True) * 63 + 4 <= 128  # fits
