"""Stage 5: evaluate regressed keypoints on the test set (eval.py:374-523)."""

from __future__ import annotations

import jax
import numpy as np

from stablekeypoints_tpu.pipeline.metrics import apply_regressor, compute_metric
from stablekeypoints_tpu.pipeline.regressor import extract_keypoints
from stablekeypoints_tpu.pipeline.runtime import Runtime
from stablekeypoints_tpu.utils.artifacts import save_artifact

__all__ = ["evaluate"]


def evaluate(runtime: Runtime, dataset, context, indices, regressor, logger=None):
    cfg = runtime.cfg
    key = jax.random.PRNGKey(cfg.seed + 5)
    idx_arr = np.asarray(indices, np.int32)
    reg = np.asarray(regressor, np.float32)

    order = np.random.default_rng(cfg.seed + 5).permutation(len(dataset))
    all_values = []
    for count, di in enumerate(order):
        sample = dataset[int(di)]
        key, sub = jax.random.split(key)
        maps = runtime.augmented_maps_fn(context, sample["img"], idx_arr, sub)
        found = extract_keypoints(maps, cfg.max_loc_strategy)
        est = apply_regressor(found, reg)
        val = compute_metric(
            cfg.evaluation_method, est, np.asarray(sample["kpts"]), sample.get("visibility")
        )
        all_values.append(val)
        if logger is not None and (count % 100 == 0 or count == len(order) - 1):
            logger.log(
                {
                    "stage": 5,
                    "evaluated": count + 1,
                    "mean_distance": float(np.mean(all_values)),
                }
            )

    mean_distance = float(np.mean(all_values))
    save_artifact(cfg.save_folder, "all_errors", np.asarray(all_values, np.float32))
    if logger is not None:
        logger.log({"stage": 5, "event": "done", "mean_distance": mean_distance})
    return mean_distance, np.asarray(all_values)
