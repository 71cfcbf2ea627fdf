"""High-level Python API: learn keypoints on a folder/dataset, detect on images.

The reference exposes its capability through a CLI and a Colab notebook
(StableKeypoints.ipynb: optimize -> find indices -> visualize on a custom
image folder). This module packages the same flow as two calls:

    model = learn_keypoints("/data/my_images", num_steps=500)
    kpts = model.detect(image)           # [top_k, 2] normalized (y, x)
    model.save("outputs") / KeypointModel.load("outputs", cfg)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import numpy as np

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.data.registry import build_dataset
from stablekeypoints_tpu.pipeline.indices import find_best_indices
from stablekeypoints_tpu.pipeline.optimize import optimize_embedding
from stablekeypoints_tpu.pipeline.runtime import Runtime
from stablekeypoints_tpu.utils.artifacts import load_artifact, save_artifact

__all__ = ["KeypointModel", "learn_keypoints"]


@dataclasses.dataclass
class KeypointModel:
    """A learned embedding + selected token indices bound to a runtime."""

    runtime: Runtime
    context: np.ndarray  # [1, T, d]
    indices: np.ndarray  # [top_k]

    def detect(self, image: np.ndarray, key: Optional[jax.Array] = None) -> np.ndarray:
        """image: [H, W, 3] float in [0, 1] -> [top_k, 2] normalized (y, x).

        Uses the augmented test-time ensemble (eval.py:197-355 semantics).
        """
        return self.detect_batch(image[None], key)[0]

    def detect_batch(self, images: np.ndarray, key: Optional[jax.Array] = None) -> np.ndarray:
        key = key if key is not None else jax.random.PRNGKey(self.runtime.cfg.seed + 9)
        return np.asarray(
            self.runtime.augmented_keypoints_fn(
                self.context, np.asarray(images, np.float32),
                np.asarray(self.indices, np.int32), key,
            )
        )

    def heatmaps(self, image: np.ndarray, key: Optional[jax.Array] = None) -> np.ndarray:
        """[top_k, H, W] ensembled attention maps for one image."""
        key = key if key is not None else jax.random.PRNGKey(self.runtime.cfg.seed + 9)
        return np.asarray(
            self.runtime.augmented_maps_fn(
                self.context, np.asarray(image, np.float32),
                np.asarray(self.indices, np.int32), key,
            )
        )

    def save(self, save_folder: str):
        save_artifact(save_folder, "embedding", self.context)
        save_artifact(save_folder, "indices", self.indices)

    @staticmethod
    def load(save_folder: str, cfg: Optional[Config] = None, runtime: Optional[Runtime] = None):
        cfg = cfg if cfg is not None else Config()
        runtime = runtime if runtime is not None else Runtime.create(cfg)
        return KeypointModel(
            runtime,
            load_artifact(save_folder, "embedding"),
            load_artifact(save_folder, "indices").astype(np.int32),
        )


def learn_keypoints(
    data: Union[str, object],
    cfg: Optional[Config] = None,
    runtime: Optional[Runtime] = None,
    logger=None,
    **overrides,
) -> KeypointModel:
    """Run stages 1+2 on an image folder (or any dataset object)."""
    if cfg is None:
        cfg = Config(dataset_name="custom", **overrides)
    elif overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    if isinstance(data, str):
        cfg = dataclasses.replace(cfg, dataset_loc=data)
        dataset = build_dataset(cfg, "train")
    else:
        dataset = data
    runtime = runtime if runtime is not None else Runtime.create(cfg)
    context = optimize_embedding(runtime, dataset, logger)
    indices = find_best_indices(runtime, dataset, context, logger)
    return KeypointModel(runtime, np.asarray(context), np.asarray(indices))
