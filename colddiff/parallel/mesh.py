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

__all__ = ["make_mesh", "make_mesh_2d", "shard_batch", "replicate",
           "data_sharding", "replicated_sharding", "fsdp_sharding",
           "shard_state", "put_like", "image_sharding", "shard_images"]


def make_mesh(devices: Optional[list] = None, axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(data: int, space: int, devices: Optional[list] = None,
                 axis_names=("data", "space")) -> Mesh:
    """2-D ``Mesh(('data', 'space'))`` for batch x spatial sharding.

    Beyond the reference's DataParallel: the ``space`` axis shards image
    *rows* (NHWC dim 1) so a latency-critical low-batch sampling run can use
    more chips than it has images (see :func:`image_sharding`).
    """
    if devices is None:
        devices = jax.devices()
    if data * space != len(devices):
        raise ValueError(
            f"mesh {data}x{space} needs {data * space} devices, "
            f"have {len(devices)}"
        )
    return Mesh(np.asarray(devices).reshape(data, space), axis_names)


def image_sharding(mesh: Mesh, data_axis: str = "data",
                   space_axis: str = "space") -> NamedSharding:
    """NHWC sharding ``P('data', 'space')``: batch over chips AND image rows
    over chips.

    With this placement on a :func:`make_mesh_2d` mesh and replicated params,
    ``jax.jit`` of the sampler partitions the whole UNet spatially: XLA
    inserts halo exchanges for the convolutions and collectives for the
    global contractions (attention softmax over tokens, the [H, H]
    degradation matmuls) -- all riding ICI.  This is the scaling axis for
    serving latency at batch sizes smaller than the chip count, where pure
    data parallelism runs out of images to shard.

    The Pallas ConvNeXt front participates natively: its partition rule
    detects the sharded row axis and halo-exchanges the 3 boundary rows via
    collective-permute around an XLA front on the local block (no
    all-gather, no env var; tests/test_pallas.py pins it) -- see
    colddiff/ops/pallas/convnext_front.py.
    """
    return NamedSharding(mesh, P(data_axis, space_axis))


def shard_images(batch, mesh: Mesh, data_axis: str = "data",
                 space_axis: str = "space"):
    """Place an NHWC host batch onto a 2-D mesh, batch+rows sharded."""
    return jax.device_put(batch, image_sharding(mesh, data_axis, space_axis))


def data_sharding(mesh: Mesh, axis_name: str = "data", batch_dim: int = 0) -> NamedSharding:
    """Sharding that splits dimension ``batch_dim`` across the mesh."""
    spec = [None] * batch_dim + [axis_name]
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data", batch_dim: int = 0):
    """Place a host batch onto the mesh, sharded along ``batch_dim``.

    Single-process: a plain ``device_put``.  Multi-process (after
    ``jax.distributed.initialize`` -- see :mod:`colddiff.parallel.distributed`):
    ``batch`` is this process's *local* slice of the global batch (the slice
    covering its addressable shards, i.e. contiguous along ``batch_dim`` in
    process order) and the returned global array spans all hosts.
    """
    sharding = data_sharding(mesh, axis_name, batch_dim)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
        batch,
    )


def _put_from_full(value, sharding):
    """Place a host value every process holds in full onto a (possibly
    multi-host) sharding: each process contributes the shards it owns."""
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    import jax.numpy as jnp

    if jnp.issubdtype(getattr(value, "dtype", None), jax.dtypes.prng_key):
        # typed PRNG keys: place the raw key data, re-wrap globally
        impl = jax.random.key_impl(value)
        data = np.asarray(jax.random.key_data(value))
        placed = jax.make_array_from_callback(
            data.shape, sharding, lambda idx: data[idx]
        )
        return jax.random.wrap_key_data(placed, impl=impl)
    value = np.asarray(value)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx]
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / EMA / opt state) across the mesh.

    Works across processes: every process must hold the same full values
    (e.g. params initialized from the same seed).
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, replicated_sharding(mesh))
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: _put_from_full(a, sh), tree)


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
    return put_like(tree, sh), sh


def put_like(tree, sharding_tree):
    """Place a host-local pytree onto a sharding tree, multi-host aware.

    Single-process: plain ``device_put``.  Multi-host: every process must
    hold the full values (same init seed / same restored checkpoint) and
    contributes the shards it owns (:func:`_put_from_full`).
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding_tree)
    return jax.tree_util.tree_map(_put_from_full, tree, sharding_tree)
