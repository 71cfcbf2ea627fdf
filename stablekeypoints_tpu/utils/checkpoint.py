"""Mid-stage training checkpoints with step numbers (Orbax).

The reference has no mid-stage checkpointing — a crash loses the stage and
"resume" means manually editing main.py around the stage-artifact
torch.saves (SURVEY.md §5, main.py:218-292). Here: the stage-1 (context,
opt_state, step) triple is checkpointed every `checkpoint_every` steps via
Orbax, and `main.run(resume=True)` resumes both mid-stage (from the latest
checkpoint) and stage-level (from stage artifacts on disk).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["TrainCheckpointer"]


class TrainCheckpointer:
    def __init__(self, save_folder: str):
        self.dir = os.path.join(os.path.abspath(save_folder), "checkpoints")
        os.makedirs(self.dir, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ckpt = ocp.PyTreeCheckpointer()

    def save(self, step: int, context, opt_state) -> None:
        path = os.path.join(self.dir, f"step_{step:08d}")
        state = {
            "step": np.asarray(step),
            "context": np.asarray(context),
            "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
        }
        self._ckpt.save(path, state, force=True)

    def latest_step(self) -> Optional[int]:
        steps = [
            int(d.split("_")[1])
            for d in os.listdir(self.dir)
            if d.startswith("step_") and os.path.isdir(os.path.join(self.dir, d))
        ]
        return max(steps) if steps else None

    def restore(self, step: Optional[int] = None) -> Optional[dict[str, Any]]:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        path = os.path.join(self.dir, f"step_{step:08d}")
        return self._ckpt.restore(path)
