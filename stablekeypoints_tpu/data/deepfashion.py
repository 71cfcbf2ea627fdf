"""DeepFashion (AutoLink format: data_{train,test}.csv + .json keypoints).

Semantics of datasets/deepfashion.py:17-87: image list from the csv's
second column, 8 keypoints / 256 rolled to (y, x). The reference normalizes
images to mean/std 0.5 (i.e. feeds the VAE values already in [-1, 1] — the
only dataset to do so, and image2latent then maps them to [-3, 1]); we
reproduce that by storing (x/255 normalized to [0,1] after the 0.5/0.5
transform == x/255*2-1 ... ) — concretely: the pipeline multiplies 'img' by
2 and subtracts 1 before the VAE, so to match the reference's double
normalization we pre-apply the same 0.5/0.5 normalize here, keeping 'img'
in [-1, 1]. Keypoint math is unaffected.
"""

from __future__ import annotations

import json
import os

import numpy as np

from stablekeypoints_tpu.data.base import load_image_rgb

__all__ = ["DeepFashion"]


class DeepFashion:
    def __init__(self, data_root: str, split: str = "train", image_size: int = 512):
        self.data_root = os.path.expanduser(data_root)
        self.image_size = image_size
        tag = "test" if split == "test" else "train"
        with open(os.path.join(self.data_root, f"data_{tag}.csv")) as f:
            lines = f.readlines()[1:]
        self.files = [l.split(",")[1].strip() for l in lines]
        self.kpts = None
        if split in ("train_reg", "test"):
            with open(os.path.join(self.data_root, f"data_{tag}.json")) as f:
                kp = json.load(f)
            kp = np.asarray([k["keypoints"] for k in kp], np.float32)
            self.kpts = np.roll(kp, shift=1, axis=-1) / 256.0  # (x,y) -> (y,x), /256

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> dict:
        img = load_image_rgb(
            os.path.join(self.data_root, "img", self.files[idx]), self.image_size
        )
        img = img * 2.0 - 1.0  # reference's Normalize(0.5, 0.5) (deepfashion.py:26)
        k = self.kpts[idx] if self.kpts is not None else np.zeros((8, 2), np.float32)
        return {
            "img": img,
            "kpts": k,
            "visibility": np.ones((k.shape[0],), np.float32),
        }
