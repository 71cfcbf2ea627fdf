"""Stage artifacts on disk.

The reference torch.saves `embedding.pt`, `indices.pt`,
`source_keypoints.pt`, `target_keypoints.pt`, `visible.pt`, `regressor.pt`,
`all_errors.pt` between stages (main.py:218-292, eval.py:523). We write the
same artifact set, as `.npy` (native) plus `.pt` (torch-compatible export
for parity checking against the reference), and can load either.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["save_artifact", "load_artifact"]


def save_artifact(save_folder: str, name: str, array) -> str:
    os.makedirs(save_folder, exist_ok=True)
    arr = np.asarray(array)
    npy_path = os.path.join(save_folder, f"{name}.npy")
    np.save(npy_path, arr)
    try:
        import torch

        torch.save(torch.from_numpy(arr.copy()), os.path.join(save_folder, f"{name}.pt"))
    except ImportError:
        pass
    return npy_path


def load_artifact(save_folder: str, name: str) -> np.ndarray:
    npy_path = os.path.join(save_folder, f"{name}.npy")
    if os.path.exists(npy_path):
        return np.load(npy_path)
    pt_path = os.path.join(save_folder, f"{name}.pt")
    if os.path.exists(pt_path):
        import torch

        t = torch.load(pt_path, map_location="cpu", weights_only=True)
        if isinstance(t, torch.Tensor):
            # the reference torch.saves the LEAF embedding (requires_grad=True,
            # reference main.py:218) — e.g. its published precomputed learned
            # tokens — so detach before the numpy view
            return t.detach().numpy()
        arr = np.asarray(t)
        if arr.dtype == object:  # a dict / full checkpoint, not a bare array
            raise TypeError(
                f"{pt_path} does not contain a tensor/array (got "
                f"{type(t).__name__}); the reference's stage artifacts are "
                "bare tensors — extract the right entry before loading"
            )
        return arr
    raise FileNotFoundError(f"artifact {name} not found in {save_folder}")
