"""Multi-host initialization: one SPMD mesh spanning hosts.

The reference has no distributed backend at all (single-process
``torch.nn.DataParallel`` only -- SURVEY.md section 2.7).  The TPU-native
replacement is JAX's coordination service: every host calls
:func:`init_multihost` first, after which ``jax.devices()`` returns the
*global* device list, ``colddiff.parallel.make_mesh()`` builds a mesh that
spans hosts, and the same jitted train step runs SPMD with XLA collectives
riding ICI within a slice and DCN across slices.

Per-host responsibilities under multi-host:
  - data: give each process its own shard of the dataset
    (``DataLoader(..., process_index=jax.process_index(),
    process_count=jax.process_count())``) and build batches as the process's
    contiguous slice of the global batch (``shard_batch`` assembles the
    global array from the local slices);
  - state: every process initializes params from the same seed;
    ``shard_state``/``replicate`` then place them globally;
  - checkpoints: Orbax saves must be entered by *all* processes (the default
    Trainer does this -- do not guard ``save()`` by process index);
  - periodic sample-grid snapshots device_get global arrays and are not
    multi-host-safe; set ``save_and_sample_every`` large and eval offline.

Verified end-to-end by tests/test_multihost.py: two CPU processes x four
virtual devices form one 8-device mesh and the global training step matches
the single-process 8-device run exactly.
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["init_multihost"]


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Join this process into a multi-host JAX cluster.

    Thin wrapper over ``jax.distributed.initialize`` (must run before first
    device use).  With no arguments, cluster autodetection applies (TPU pods
    populate the environment); pass explicit values for manual clusters:
    ``init_multihost("10.0.0.1:8476", num_processes=4, process_id=rank)``.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
