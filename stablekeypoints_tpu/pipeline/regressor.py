"""Stages 3+4: precompute keypoints and fit the closed-form regressor.

Stage 3 (keypoint_regressor.py:111-198): for up to `max_num_points`
training-regression images, run the augmented-ensemble inference, take the
per-token argmax (or soft-argmax) normalized by image size as the source
keypoints; collect GT keypoints + visibility.

Stage 4 (keypoint_regressor.py:201-273): closed-form least squares from
centered flattened source coords to centered GT coords — plain pinv,
per-column visibility-filtered pinv, and the Human3.6M variant that
iteratively relabels left/right-swapped GT rows while more than 10 samples
prefer the swap.
"""

from __future__ import annotations

import jax
import numpy as np

from stablekeypoints_tpu.ops.keypoints import find_max_pixel, pixel_from_weighted_avg
from stablekeypoints_tpu.pipeline.ensemble_loop import ensemble_chunks
from stablekeypoints_tpu.pipeline.metrics import swap_points
from stablekeypoints_tpu.pipeline.runtime import Runtime

__all__ = [
    "precompute_all_keypoints",
    "return_regressor",
    "return_regressor_visible",
    "return_regressor_human36m",
    "fit_regressor",
    "extract_keypoints",
]


def extract_keypoints(maps, strategy: str = "argmax") -> np.ndarray:
    """[k, S, S] maps -> [k, 2] normalized (y, x) keypoints."""
    size = maps.shape[-1]
    if strategy == "argmax":
        pts = find_max_pixel(maps)
    else:
        pts = pixel_from_weighted_avg(maps)
    return np.asarray(pts) / size


def precompute_all_keypoints(runtime: Runtime, dataset, context, indices, logger=None):
    cfg = runtime.cfg
    n = min(len(dataset), cfg.max_num_points)
    key = jax.random.PRNGKey(cfg.seed + 4)
    order = np.random.default_rng(cfg.seed + 4).permutation(len(dataset))[:n]

    source, target, visibility = [], [], []
    idx_arr = np.asarray(indices, np.int32)
    m = max(1, cfg.eval_batch_images)
    for ci, (samples, pts) in enumerate(
        ensemble_chunks(runtime, dataset, order, context, idx_arr, key, m)
    ):
        for s, p in zip(samples, pts):
            source.append(p)
            target.append(np.asarray(s["kpts"], np.float32))
            if "visibility" in s:
                visibility.append(np.asarray(s["visibility"], np.float32))
        if logger is not None and ci % 50 == 0:
            logger.log({"stage": 3, "precomputed": len(source), "total": n})

    vis = np.stack(visibility) if visibility else None
    return np.stack(source), np.stack(target), vis


def return_regressor(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Plain least squares on centered coords (keypoint_regressor.py:229-239)."""
    x = x.astype(np.float64) - 0.5
    y = y.astype(np.float64) - 0.5
    return np.linalg.pinv(x.T @ x) @ x.T @ y


def return_regressor_visible(x: np.ndarray, y: np.ndarray, visible: np.ndarray) -> np.ndarray:
    """Per-output-column LS over rows where that keypoint is visible
    (keypoint_regressor.py:201-226)."""
    x = x.astype(np.float64) - 0.5
    y = y.astype(np.float64) - 0.5
    w = np.zeros((x.shape[1], y.shape[1]))
    for j in range(y.shape[1]):
        rows = np.where(visible[:, j] == 1)[0]
        xf, yf = x[rows], y[rows, j]
        w[:, j] = np.linalg.pinv(xf.T @ xf) @ xf.T @ yf
    return w


def return_regressor_human36m(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """LS with iterative left/right GT relabeling (keypoint_regressor.py:242-273)."""
    x = x.astype(np.float64) - 0.5
    y = y.astype(np.float64) - 0.5
    xtxxt = np.linalg.inv(x.T @ x) @ x.T
    while True:
        w = xtxxt @ y
        pred = x @ w
        dist = np.linalg.norm((pred - y).reshape(x.shape[0], -1, 2), axis=2).mean(axis=1)
        swapped = swap_points(y.reshape(y.shape[0], -1, 2)).reshape(y.shape[0], -1)
        swapped_dist = np.linalg.norm(
            (pred - swapped).reshape(x.shape[0], -1, 2), axis=2
        ).mean(axis=1)
        should_swap = dist > swapped_dist
        if should_swap.sum() > 10:
            y[should_swap] = swapped[should_swap]
        else:
            break
    return w


def fit_regressor(cfg, source: np.ndarray, target: np.ndarray, visible) -> np.ndarray:
    """Dispatch by evaluation method (main.py:265-291)."""
    x = source.reshape(source.shape[0], -1)
    y = target.reshape(target.shape[0], -1)
    if cfg.evaluation_method in ("visible", "mean_average_error"):
        if visible is None:
            vis2 = np.ones_like(y)
        else:
            vis2 = np.repeat(visible, 2, axis=1)
        return return_regressor_visible(x, y, vis2).astype(np.float32)
    if cfg.evaluation_method == "orientation_invariant":
        return return_regressor_human36m(x, y).astype(np.float32)
    return return_regressor(x, y).astype(np.float32)
