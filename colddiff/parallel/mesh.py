"""Device mesh + data-parallel sharding helpers.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(celebA_128.py:102; SURVEY.md section 2.7).  The TPU-native equivalent is SPMD
over a 1-D ``Mesh(('data',))``: the batch is sharded across chips, params and
EMA are replicated, and XLA inserts the gradient all-reduce over ICI from the
sharding annotations.  Multi-host extends the same mesh via
``jax.distributed.initialize`` (call before :func:`make_mesh`).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding", "replicated_sharding"]


def make_mesh(devices: Optional[list] = None, axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data", batch_dim: int = 0) -> NamedSharding:
    """Sharding that splits dimension ``batch_dim`` across the mesh."""
    spec = [None] * batch_dim + [axis_name]
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data", batch_dim: int = 0):
    """Place a host batch onto the mesh, sharded along ``batch_dim``."""
    return jax.device_put(batch, data_sharding(mesh, axis_name, batch_dim))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / EMA / opt state) across the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))
