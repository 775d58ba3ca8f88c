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
the same code runs over DCN+ICI. Every process runs the SAME sampler stream
(same seeds, same ring cursors — resume snapshots stay consistent) but
assembles only the global-batch rows its own devices hold
(:func:`process_row_slice`); :func:`shard_batch` then builds the global
array from each process's local slice, and :func:`replicate` materialises
replicated state across non-addressable devices. The global batch is
therefore IDENTICAL to the single-process run by construction — multi-host
changes where rows are decoded, never what is trained on (asserted by
tests/test_multihost_trainer.py and the driver's gloo dryrun).
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


def init_distributed() -> None:
    """``jax.distributed.initialize`` for the train CLIs' ``-dist`` flag.

    Prefers explicit ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` environment (manual launches; local multi-process
    CPU drives) and falls back to jax's cluster auto-detection (TPU pod
    metadata, Slurm, K8s, OMPI) when they are unset."""
    import os

    kw = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kw = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kw)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def mesh_is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices of more than one jax process."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def process_row_slice(mesh: Mesh, global_rows: int) -> tuple:
    """(lo, hi): the contiguous global-batch row range owned by THIS
    process's devices under :func:`batch_sharding`.

    Multi-host loaders decode only these rows of each global index batch
    (``data.loader.shard_index_batch``); :func:`shard_batch` reassembles the
    global array. Raises if the rows are not contiguous (would indicate a
    non-standard device order) or indivisible.
    """
    n_dev = int(mesh.devices.size)
    if global_rows % n_dev:
        raise ValueError(
            f"global batch {global_rows} must divide the {n_dev}-device mesh "
            "for multi-process training (tail batches are wrap-padded to the "
            "static stream batch size upstream)"
        )
    s = batch_sharding(mesh)
    spans = [m[0] for d, m in s.devices_indices_map((global_rows,)).items()
             if d.process_index == jax.process_index()]
    lo = min(sp.start or 0 for sp in spans)
    hi = max(global_rows if sp.stop is None else sp.stop for sp in spans)
    per = global_rows // n_dev
    if hi - lo != per * len(spans):
        raise ValueError(
            f"process rows are not contiguous under this mesh: {spans}"
        )
    return lo, hi


def trainer_row_shard(mesh: Mesh, batch_size: int):
    """Loader ``row_shard`` tuple for :class:`~...train.loop.UDATrainer`.

    ``None`` on a single-process mesh (the loader decodes full global
    batches). On a multi-process mesh: ``(lo, hi, target)`` — every process
    runs identical samplers, wrap-pads each global index batch to the static
    ``target`` (``batch_size`` rounded up to the mesh size), and decodes only
    its own rows ``lo:hi`` (``data.loader.shard_index_batch``).
    """
    if not mesh_is_multiprocess(mesh):
        return None
    n_dev = int(mesh.devices.size)
    target = -(-batch_size // n_dev) * n_dev
    lo, hi = process_row_slice(mesh, target)
    return lo, hi, target


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
    an indivisible leading dim raises.

    On a multi-process mesh the input is this process's LOCAL row slice
    (``process_row_slice``-sized, already wrap-padded + masked by the
    loader's ``shard_index_batch``) and the global array is assembled from
    the per-process slices — ``device_put`` cannot target non-addressable
    devices."""
    n_dev = int(mesh.devices.size)
    if mesh_is_multiprocess(mesh):
        n_proc = len({d.process_index for d in mesh.devices.flat})
        s = batch_sharding(mesh)

        def put(x):
            x = np.asarray(x)
            gshape = (x.shape[0] * n_proc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(s, x, gshape)

        return jax.tree.map(put, batch)
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
    """Replicate a pytree (train state / params) across the mesh.

    Multi-process meshes use ``make_array_from_callback`` (each process
    serves its addressable replicas from its local copy; copies are
    identical by construction — same seed on every process)."""
    r = replicated(mesh)
    if mesh_is_multiprocess(mesh):
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, r, lambda idx, x=x: x[idx])

        return jax.tree.map(put, tree)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
