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


def pad_batch(batch: dict, multiple: int, target: int = 0) -> dict:
    """Pad the leading (batch) dim of a dict-of-arrays to ``target`` (or the
    next multiple of ``multiple``), attaching a ``"sample_mask"`` of 1s for
    real samples and 0s for the pad.

    Pad rows wrap around the batch's own samples (``x[i % n]``) so train-mode
    BatchNorm sees plausible values; every loss/metric reduction in the step
    functions excludes the pad via the mask (``losses.masked_mean``),
    preserving the reference's short-tail-batch means
    (``src/data_generator_mscmrseg.py:281-291``).
    """
    arrays = {k: np.asarray(v) for k, v in batch.items()}
    n = next(iter(arrays.values())).shape[0]
    t = max(target, -(-n // multiple) * multiple)
    if n == t:
        return batch
    idx = np.arange(t) % n
    out = {k: v[idx] for k, v in arrays.items()}
    base = arrays.get("sample_mask", np.ones(n, np.float32))
    out["sample_mask"] = np.where(np.arange(t) < n, base[idx], 0.0).astype(np.float32)
    return out


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch (pytree of arrays with a leading batch dim) onto
    the mesh, sharded over ``data``. Any batch size is accepted: a dict
    batch whose leading dim does not divide the mesh is wrap-padded to the
    next multiple via :func:`pad_batch` (consumers must honour the attached
    ``"sample_mask"`` — both repo step functions do); a non-dict pytree with
    an indivisible leading dim raises."""
    n_dev = int(mesh.devices.size)
    leaves = jax.tree.leaves(batch)
    if leaves and leaves[0].shape[0] % n_dev != 0:
        if isinstance(batch, dict):
            batch = pad_batch(batch, n_dev)
        else:
            raise ValueError(
                f"leading dim {leaves[0].shape[0]} does not divide the "
                f"{n_dev}-device mesh; pass a dict batch (auto-padded with a "
                f"sample_mask) or pad it yourself (parallel.pad_batch)"
            )
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (train state / params) across the mesh."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
