"""Mesh + sharding rules.

The reference has no distributed layer at all: single-GPU training with an
optional 2-GPU ``multicuda`` activation hop (``src/networks/unet.py:180-192``)
— there is no DataParallel/DDP/NCCL anywhere (SURVEY.md §2.6). On TPU both
are subsumed by a 1-D **data mesh**: parameters are replicated, batches are
sharded over the ``data`` axis, and XLA's GSPMD partitioner turns the batch
reductions inside losses and BatchNorm into ``psum``s over ICI — so
multi-chip training computes *global-batch* statistics and gradients,
keeping exact single-device semantics while scaling.

The model is 13.5M parameters; tensor/pipeline/sequence/expert parallelism
are unnecessary at this scale. The mesh axes are named so a ``model`` axis
could be appended later without restructuring (axis names are the public
contract), but only ``data`` is used.

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh`` and
the same code runs over DCN+ICI; single-host v5e is the tested target.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(num_devices: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh over the first ``num_devices`` devices (0 = all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch (pytree of arrays with a leading batch dim) onto
    the mesh, sharded over ``data``. The batch size must divide evenly by
    the mesh size (the pipeline pads the last batch if needed)."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (train state / params) across the mesh."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
