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

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding",
           "replicated_sharding", "fsdp_sharding", "shard_state"]


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


def fsdp_sharding(tree, mesh: Mesh, axis_name: str = "data",
                  min_size: int = 2 ** 14):
    """ZeRO-3-style sharding tree: each large leaf split over the mesh.

    Beyond the reference's DataParallel (SURVEY.md section 2.7): params, EMA
    and Adam moments are *sharded* across the data axis instead of
    replicated, cutting per-chip state memory ~N_devices-fold.  XLA's SPMD
    partitioner inserts the all-gather at each weight's use site and
    reduce-scatters its gradient, both riding ICI -- exactly the
    "annotate shardings, let XLA insert collectives" recipe; the optimizer
    and EMA updates stay fully local (elementwise over identically-sharded
    trees, zero communication).

    Each leaf is sharded on its largest axis divisible by the mesh size
    (ties prefer the trailing feature axis of NHWC kernels); leaves smaller
    than ``min_size`` elements (norm scales, biases) stay replicated --
    sharding them buys nothing and costs a collective each.
    """
    n = mesh.shape[axis_name]

    def leaf(a):
        if not hasattr(a, "shape") or a.ndim == 0 or a.size < min_size:
            return NamedSharding(mesh, P())
        best = None
        for dim in range(a.ndim):
            if a.shape[dim] % n == 0 and (
                best is None or a.shape[dim] >= a.shape[best]
            ):
                best = dim
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * a.ndim
        spec[best] = axis_name
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(leaf, tree)


def shard_state(tree, mesh: Mesh, mode: str = "replicated",
                axis_name: str = "data", min_size: int = 2 ** 14):
    """Place a train-state pytree on the mesh per ``mode``.

    ``replicated``: every leaf on every chip (the reference-parity default).
    ``fsdp``: large leaves sharded via :func:`fsdp_sharding`.
    Returns ``(tree_on_device, sharding_tree)``; pass the sharding tree to
    later ``jax.device_put`` calls (e.g. checkpoint restore) so placement
    stays consistent.
    """
    if mode == "replicated":
        sh = jax.tree_util.tree_map(lambda _: replicated_sharding(mesh), tree)
    elif mode == "fsdp":
        sh = fsdp_sharding(tree, mesh, axis_name, min_size)
    else:
        raise ValueError(f"unknown param_sharding mode: {mode!r}")
    return jax.device_put(tree, sh), sh
