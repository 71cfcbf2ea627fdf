"""Stage 5: evaluate regressed keypoints on the test set (eval.py:374-523)."""

from __future__ import annotations

import jax
import numpy as np

from stablekeypoints_tpu.pipeline.ensemble_loop import ensemble_chunks
from stablekeypoints_tpu.pipeline.metrics import apply_regressor, compute_metric
from stablekeypoints_tpu.pipeline.runtime import Runtime
from stablekeypoints_tpu.utils.artifacts import save_artifact

__all__ = ["evaluate"]


def evaluate(runtime: Runtime, dataset, context, indices, regressor, logger=None):
    cfg = runtime.cfg
    key = jax.random.PRNGKey(cfg.seed + 5)
    idx_arr = np.asarray(indices, np.int32)
    reg = np.asarray(regressor, np.float32)

    order = np.random.default_rng(cfg.seed + 5).permutation(len(dataset))
    if cfg.visualize and len(order):
        # reference saves an `augmentation.png` debug panel of the test-time
        # ensemble for the first evaluated image (eval.py:268-353, call site
        # eval.py:443-444)
        import os

        from stablekeypoints_tpu.pipeline.visualize import save_augmentation_panel

        first = dataset[int(order[0])]
        save_augmentation_panel(
            runtime,
            np.asarray(first["img"], np.float32),
            context,
            indices,
            os.path.join(cfg.save_folder, "augmentation.png"),
        )
    all_values = []
    m = max(1, cfg.eval_batch_images)
    n_chunks = -(-len(order) // m) if len(order) else 0
    for ci, (samples, pts) in enumerate(
        ensemble_chunks(runtime, dataset, order, context, idx_arr, key, m)
    ):
        for s, found in zip(samples, pts):
            est = apply_regressor(found, reg)
            val = compute_metric(
                cfg.evaluation_method, est, np.asarray(s["kpts"]), s.get("visibility")
            )
            all_values.append(val)
        if logger is not None and (ci % 100 == 0 or ci + 1 == n_chunks):
            logger.log(
                {
                    "stage": 5,
                    "evaluated": len(all_values),
                    "mean_distance": float(np.mean(all_values)),
                }
            )

    mean_distance = float(np.mean(all_values))
    save_artifact(cfg.save_folder, "all_errors", np.asarray(all_values, np.float32))
    if logger is not None:
        logger.log({"stage": 5, "event": "done", "mean_distance": mean_distance})
    return mean_distance, np.asarray(all_values)
