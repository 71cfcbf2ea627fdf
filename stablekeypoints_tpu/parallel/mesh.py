"""Device mesh and sharding layout.

The reference's only parallelism is single-process `nn.DataParallel`
(optimize_token.py:41-56) with explicit per-device attention stores and a
`.to('cuda:0')` loss gather (optimize.py:405-406). Here parallelism is a
`jax.sharding.Mesh` with a `data` axis: batches are sharded over it, the
learned context and frozen weights are replicated, and XLA inserts the
gradient all-reduce over ICI. A `model` axis is kept for optional tensor
sharding of larger backbones (SDXL); SD-1.5 fits per chip, so the default
mesh is (data, 1).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch"]


def make_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data == -1:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of [B, ...] arrays with B sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
