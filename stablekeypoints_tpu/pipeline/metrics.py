"""Evaluation metrics (the five protocols of eval.py:374-523).

All pure numpy on host — the per-image math is tiny; the device work is the
augmented-map inference that precedes it.
"""

from __future__ import annotations

import numpy as np

__all__ = ["swap_points", "apply_regressor", "compute_metric", "HUMAN36M_SWAPS"]

# eval.py:360-371 — left/right correspondences for Human3.6M (32 kpts)
HUMAN36M_SWAPS = [
    (1, 6), (2, 7), (3, 8), (4, 9), (5, 10),
    (17, 25), (18, 26), (19, 27), (20, 28), (21, 28), (22, 30), (23, 31),
]


def swap_points(points: np.ndarray) -> np.ndarray:
    """Swap L/R keypoints; points: [..., N, D] (eval.py:360-371).

    Note the reference builds the permutation by sequential assignment, so
    the duplicated entry (21, 28) after (20, 28) leaves perm[28] = 21 from
    the earlier pair being overwritten — we replicate the exact loop.
    """
    n = points.shape[-2]
    perm = list(range(n))
    for a, b in HUMAN36M_SWAPS:
        perm[a] = b
        perm[b] = a
    return points[..., perm, :]


def apply_regressor(found: np.ndarray, regressor: np.ndarray) -> np.ndarray:
    """((x - 0.5) @ W) + 0.5, flattened coords (eval.py:453)."""
    flat = found.reshape(1, -1) - 0.5
    est = flat @ regressor + 0.5
    return est.reshape(-1, 2)


def compute_metric(
    method: str,
    estimated: np.ndarray,  # [K, 2] normalized (y, x)
    gt: np.ndarray,  # [K, 2]
    visible=None,
) -> float:
    """One image's scalar metric (eval.py:459-494)."""
    est, g = estimated.astype(np.float64), gt.astype(np.float64)
    if method in ("mean_average_error", "pck"):
        est = est * 256.0
        g = g * 256.0
    l2 = np.linalg.norm(est - g, axis=-1)

    if method == "inter_eye_distance":
        eye = np.linalg.norm(g[0] - g[1])
        return float(np.mean(l2 / eye))
    if method in ("visible", "mean_average_error"):
        vis = np.ones_like(l2) if visible is None else np.asarray(visible, np.float64)
        val = float((l2 * vis).sum())
        if method == "visible":
            val /= float(vis.sum())
        return val
    if method == "pck":
        return float((l2 < 6.0).mean())
    if method == "orientation_invariant":
        mean = l2.mean()
        swapped = swap_points(est[None])[0]
        swapped_mean = np.linalg.norm(swapped - g, axis=-1).mean()
        return float(min(mean, swapped_mean) * 128.0)
    raise NotImplementedError(f"unknown evaluation method: {method}")
