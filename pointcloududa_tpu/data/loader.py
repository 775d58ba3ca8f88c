"""Paired source/target loader with worker-pool decode and device prefetch.

Replaces the reference's synchronous ``for ... in zip(trainA, trainB)`` host
loop with per-step H2D copies (``src/train_mscmrseg.py:183,201,219`` — the
documented hot-loop bottleneck, SURVEY.md §3.1):

  sampler (ring indices) -> worker pool (decode + optional host aug +
  cloud regen) -> assembled numpy batch -> background prefetch thread ->
  ``jax.device_put`` (sharded over the data mesh) one batch ahead of compute.

Device-side augmentation (ops/augment.py) is the default fast path: the
loader then ships raw uint8/f32 arrays and the warp/noise runs fused on TPU
inside the step's dispatch window.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional

import numpy as np

from pointcloududa_tpu.data.pointcloud import mask_to_point_cloud
from pointcloududa_tpu.data.sampler import RingSampler


class BatchAssembler:
    """Decodes a list of indices into one batch dict via a thread pool
    (cv2/np.load release the GIL)."""

    def __init__(self, adapter, workers: int = 4, host_augment: Optional[Callable] = None,
                 regen_vertices: bool = False):
        self._adapter = adapter
        self._pool = ThreadPoolExecutor(max_workers=workers) if workers > 0 else None
        self._host_augment = host_augment
        self._regen = regen_vertices

    def __call__(self, indices, rng: Optional[np.random.Generator] = None) -> Dict[str, np.ndarray]:
        if self._pool is not None:
            records = list(self._pool.map(self._adapter, indices))
        else:
            records = [self._adapter(i) for i in indices]
        imgs = np.stack([r[0] for r in records])
        masks = np.stack([r[1] for r in records])
        verts = None
        if records[0][2] is not None:
            verts = np.stack([r[2] for r in records])
        if self._host_augment is not None:
            imgs, masks = self._host_augment(imgs, masks, rng)
            if self._regen:
                # MM-WHS parity: clouds regenerated from the warped masks
                # (data_generator_mmwhs.py:256-264)
                verts = np.stack([mask_to_point_cloud(m) for m in masks]).astype(np.float32)
        out = {"img": imgs, "mask": masks}
        if verts is not None:
            out["vert"] = verts
        return out


def shard_index_batch(idx, lo: int, hi: int, target: int):
    """Multi-host row sharding of one GLOBAL index batch.

    Wrap-pads the batch to the static ``target`` size (same semantics as
    ``parallel.pad_batch``: pad rows repeat real samples and carry mask 0),
    then keeps only rows ``lo:hi`` — the slice this process's devices hold
    under the mesh's batch sharding (``parallel.process_row_slice``). Every
    process runs the same sampler stream, so the concatenation of the
    per-process slices is EXACTLY the single-process global batch.

    Returns ``(local_indices, local_sample_mask)``.
    """
    idx = np.asarray(idx)
    n = len(idx)
    full = idx[np.arange(target) % n]
    mask = (np.arange(target) < n).astype(np.float32)
    return full[lo:hi], mask[lo:hi]


class PairedIterator:
    """One UDA epoch: zip of source and target streams (the reference's
    ``zip(trainA_iterator, trainB_iterator)``, which stops at the shorter —
    both samplers draw the same n_samples so lengths match).

    ``row_shard=(lo, hi, target)`` enables multi-host operation: the global
    index batches are wrap-padded to ``target`` and only rows ``lo:hi`` are
    decoded on this process (see :func:`shard_index_batch`)."""

    def __init__(
        self,
        src_sampler: RingSampler,
        tgt_sampler: RingSampler,
        src_assemble: BatchAssembler,
        tgt_assemble: BatchAssembler,
        seed: int = 0,
        row_shard=None,
    ):
        self._src_sampler = src_sampler
        self._tgt_sampler = tgt_sampler
        self._src = src_assemble
        self._tgt = tgt_assemble
        self._rng = np.random.default_rng(seed)
        self._row_shard = row_shard
        self.steps_per_epoch = min(src_sampler.steps_per_epoch, tgt_sampler.steps_per_epoch)

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        for src_idx, tgt_idx in zip(self._src_sampler.epoch(), self._tgt_sampler.epoch()):
            if len(src_idx) != len(tgt_idx):  # truncated tail: drop, like zip of uneven tails
                break
            mask = None
            if self._row_shard is not None:
                lo, hi, target = self._row_shard
                src_idx, mask = shard_index_batch(src_idx, lo, hi, target)
                tgt_idx, _ = shard_index_batch(tgt_idx, lo, hi, target)
            a = self._src(src_idx, self._rng)
            b = self._tgt(tgt_idx, self._rng)
            batch = {"img_s": a["img"], "mask_s": a["mask"], "img_t": b["img"]}
            if mask is not None:
                batch["sample_mask"] = mask
            # the target mask never reaches the loss (unlabelled domain) but
            # rides along for device-side cloud regeneration after warping
            # (the reference's generators decode it for the same reason)
            if "mask" in b:
                batch["mask_t"] = b["mask"]
            if "vert" in a:
                batch["vert_s"] = a["vert"]
            if "vert" in b:
                batch["vert_t"] = b["vert"]
            yield batch


class BatchPadder:
    """Pads raw host batches to a static, mesh-divisible leading dim.

    Remembers the largest (rounded-up) batch size seen on its stream and
    pads every smaller batch up to it, so one stream compiles exactly one
    step shape — the ``ns % bs`` / ``len(val) % bs`` tail batch
    (``src/data_generator_mscmrseg.py:281-291``) no longer triggers a
    recompile nor breaks mesh divisibility. Pad semantics (wrap + mask):
    :func:`pointcloududa_tpu.parallel.pad_batch`.
    """

    def __init__(self, multiple: int = 1):
        self._multiple = max(1, int(multiple))
        self._target = 0

    def __call__(self, raw: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        from pointcloududa_tpu.parallel import pad_batch

        n = next(iter(raw.values())).shape[0]
        self._target = max(self._target, -(-n // self._multiple) * self._multiple)
        return pad_batch(raw, self._multiple, self._target)


class DevicePrefetcher:
    """Runs an iterator in a background thread, placing batches on device
    (optionally sharded over a mesh) ``depth`` batches ahead."""

    _END = object()

    def __init__(self, place: Callable, depth: int = 2):
        self._place = place
        self._depth = depth

    def __call__(self, it: Iterator) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        err = []

        def feed():
            try:
                for item in it:
                    q.put(self._place(item))
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(self._END)

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._END:
                if err:
                    raise err[0]
                return
            yield item
