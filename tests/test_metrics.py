"""Metric definitions (eval.py:459-494 semantics)."""

import numpy as np

from stablekeypoints_tpu.pipeline.metrics import (
    apply_regressor,
    compute_metric,
    swap_points,
)


def test_inter_eye_distance():
    gt = np.array([[0.3, 0.3], [0.3, 0.5], [0.5, 0.4], [0.6, 0.3], [0.6, 0.5]])
    est = gt.copy()
    est[2] += [0.0, 0.1]  # one keypoint off by 0.1
    val = compute_metric("inter_eye_distance", est, gt)
    eye = 0.2
    np.testing.assert_allclose(val, (0.1 / eye) / 5, rtol=1e-6)


def test_visible_masks_invisible():
    gt = np.zeros((4, 2))
    est = np.ones((4, 2)) * 0.1
    vis = np.array([1.0, 1.0, 0.0, 0.0])
    val = compute_metric("visible", est, gt, vis)
    np.testing.assert_allclose(val, np.sqrt(2 * 0.01), rtol=1e-6)


def test_mae_256_scaling():
    gt = np.zeros((3, 2))
    est = np.full((3, 2), 0.1)
    val = compute_metric("mean_average_error", est, gt, np.ones(3))
    np.testing.assert_allclose(val, 3 * np.sqrt(2) * 0.1 * 256, rtol=1e-6)


def test_pck_threshold():
    gt = np.zeros((4, 2))
    est = np.zeros((4, 2))
    est[0] = [0.01, 0.0]  # 2.56px < 6 ok
    est[1] = [0.05, 0.0]  # 12.8px > 6 fail
    val = compute_metric("pck", est, gt)
    np.testing.assert_allclose(val, 0.75)


def test_orientation_invariant_takes_min():
    gt = np.random.default_rng(0).uniform(0, 1, (32, 2))
    # exchange one clean L/R pair (1, 6) in the estimate: the swapped
    # branch restores it exactly, so the min is 0. (The full table is not
    # an involution: the reference's duplicated (21, 28) entry after
    # (20, 28) makes swap(swap(x)) != x at rows 20/21/28.)
    est = swap_points(gt[None])[0]
    val = compute_metric("orientation_invariant", est, gt)
    # swap(swap(gt)) differs from gt only at row 20 (perm[20]=28 but
    # perm[28]=21 from the later duplicate), so the swapped branch leaves
    # exactly one residual term:
    expected_swapped = np.linalg.norm(gt[21] - gt[20]) / 32 * 128
    direct = np.linalg.norm(est - gt, axis=-1).mean() * 128
    np.testing.assert_allclose(val, min(direct, expected_swapped), rtol=1e-9)
    assert val < direct  # the min actually picked the swapped branch


def test_swap_points_involution_except_dup():
    pts = np.arange(64, dtype=np.float64).reshape(1, 32, 2)
    out = swap_points(pts)
    assert out.shape == pts.shape
    # pairs actually swapped
    np.testing.assert_array_equal(out[0, 1], pts[0, 6])
    np.testing.assert_array_equal(out[0, 6], pts[0, 1])


def test_apply_regressor_centering():
    w = np.eye(8)
    found = np.random.default_rng(1).uniform(0, 1, (4, 2))
    est = apply_regressor(found, w)
    np.testing.assert_allclose(est, found, atol=1e-12)
