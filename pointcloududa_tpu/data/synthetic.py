"""Synthetic data for tests and benchmarks.

SURVEY.md §4 requires the full train step to run without the datasets
(the reference's BASELINE config 1 is "CPU-runnable"); this module fabricates
batches with the exact shapes/dtypes/value-ranges of the real adapters:
images in [0,1], one-hot masks, point clouds in [0,1] (vertices are /255-
normalised voxel coords in the reference, ``data_generator_mscmrseg.py:317``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from pointcloududa_tpu.config import UDAConfig


def synthetic_batch(cfg: UDAConfig, batch_size: int, seed: int = 0) -> Dict[str, np.ndarray]:
    """One UDA train batch: source image/mask/cloud + target image/cloud."""
    rng = np.random.default_rng(seed)
    hw = cfg.crop_size
    img_s = rng.uniform(size=(batch_size, hw, hw, cfg.in_channels)).astype(np.float32)
    img_t = rng.uniform(size=(batch_size, hw, hw, cfg.in_channels)).astype(np.float32)
    labels = rng.integers(0, cfg.n_class, size=(batch_size, hw, hw))
    mask_s = np.eye(cfg.n_class, dtype=np.float32)[labels]
    batch = {"img_s": img_s, "mask_s": mask_s, "img_t": img_t}
    if cfg.point_head:
        batch["vert_s"] = rng.uniform(size=(batch_size, 300, 3)).astype(np.float32)
        batch["vert_t"] = rng.uniform(size=(batch_size, 300, 3)).astype(np.float32)
    return batch


def synthetic_eval_batch(cfg: UDAConfig, batch_size: int, seed: int = 1) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    hw = cfg.crop_size
    img = rng.uniform(size=(batch_size, hw, hw, cfg.in_channels)).astype(np.float32)
    labels = rng.integers(0, cfg.n_class, size=(batch_size, hw, hw))
    mask = np.eye(cfg.n_class, dtype=np.float32)[labels]
    batch = {"img": img, "mask": mask}
    if cfg.point_head:
        batch["vert"] = rng.uniform(size=(batch_size, 300, 3)).astype(np.float32)
    return batch
