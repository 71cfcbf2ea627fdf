"""Stage 2: vote for the most consistently selected token indices.

Semantics of find_best_indices (keypoint_regressor.py:16-108): over
`num_indices` training images, rerun token selection (ranking + FPS) per
image and keep the `top_k` most frequently chosen token indices. Selection
is vmapped/batched on device; vote counting happens on host with a stable
sort (torch's unique+argsort tie order is unspecified; ours is
deterministic).
"""

from __future__ import annotations

import jax
import numpy as np

from stablekeypoints_tpu.data.base import Loader
from stablekeypoints_tpu.parallel import mesh as pmesh
from stablekeypoints_tpu.pipeline.runtime import Runtime

__all__ = ["find_best_indices"]


def find_best_indices(runtime: Runtime, dataset, context, logger=None) -> np.ndarray:
    cfg = runtime.cfg
    loader = Loader(
        dataset, batch_size=cfg.batch_size, shuffle=True, seed=cfg.seed + 2, infinite=True
    )
    it = iter(loader)
    key = jax.random.PRNGKey(cfg.seed + 3)

    votes = np.zeros((cfg.num_tokens,), np.int64)
    seen = 0
    while seen < cfg.num_indices:
        batch = next(it)
        images = pmesh.shard_batch(runtime.mesh, batch["img"])
        key, sub = jax.random.split(key)
        selected = np.asarray(runtime.select_indices_fn(context, images, sub))
        take = min(selected.shape[0], cfg.num_indices - seen)
        np.add.at(votes, selected[:take].reshape(-1), 1)
        seen += take
        if logger is not None:
            logger.log({"stage": 2, "images_voted": seen})

    order = np.argsort(-votes, kind="stable")
    return order[: cfg.top_k].astype(np.int32)
