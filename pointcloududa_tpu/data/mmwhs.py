"""MM-WHS dataset adapter (MR source -> CT target, PnP-AdaNet release).

Decoding parity with reference ``src/data_generator_mmwhs.py:140-274``:
``.npy`` slices (256x256x3 float, pre-normalised volumes), integer masks,
optional histogram matching of every image to a fixed CT reference slice
(``:174-176,236-237``), 5-class one-hot downstream, vertices /255.

When augmentation is on and the point head is enabled, vertex clouds are
regenerated from the *warped* masks (``:256-264``) — handled by the loader,
which calls ``data.pointcloud.mask_to_point_cloud`` in its worker pool
(native FPS) instead of the reference's per-sample mcubes+Python-FPS chain.

Directory contract:
  <data_dir>/PnpAda_release_data/{mr,ct}_{train,val}/{img,mask,vertices}/<id>.npy
"""

from __future__ import annotations

import os
from dataclasses import dataclass


import numpy as np


def match_histograms_single(image: np.ndarray, reference: np.ndarray) -> np.ndarray:
    """Per-channel histogram matching (skimage ``match_histograms``
    equivalent, which the reference imports at
    ``data_generator_mmwhs.py:9``): maps each channel's empirical CDF onto
    the reference channel's quantiles."""
    out = np.empty_like(image, dtype=np.float64)
    for c in range(image.shape[-1]):
        src = image[..., c].ravel()
        ref = reference[..., c].ravel()
        src_sorted_idx = np.argsort(src, kind="stable")
        ref_sorted = np.sort(ref)
        # quantile positions of each source pixel
        q = (np.arange(len(src)) + 0.5) / len(src)
        ref_q = np.interp(q, (np.arange(len(ref)) + 0.5) / len(ref), ref_sorted)
        matched = np.empty_like(src, dtype=np.float64)
        matched[src_sorted_idx] = ref_q
        out[..., c] = matched.reshape(image.shape[:-1])
    return out


@dataclass
class MMWHSAdapter:
    """Decodes one (img f32 256x256x3, mask int 256x256, vertex f32|None)."""

    data_dir: str
    ids: list
    source: str = "source"  # "source" (MR) | "target" (CT)
    phase: str = "train"
    load_vertices: bool = False
    match_hist: bool = False
    reference_slice: str = "ct_train/img/ct_train_slice0.tfrecords.npy"

    def __post_init__(self):
        assert self.source in ("source", "target")
        assert self.phase in ("train", "valid")
        modality = "mr" if self.source == "source" else "ct"
        split = "train" if self.phase == "train" else "val"
        base = os.path.join(self.data_dir, "PnpAda_release_data", f"{modality}_{split}")
        self._img_dir = os.path.join(base, "img")
        self._mask_dir = os.path.join(base, "mask")
        self._vert_dir = os.path.join(base, "vertices")
        self._ref_img = None
        if self.match_hist:
            self._ref_img = np.load(
                os.path.join(self.data_dir, "PnpAda_release_data", self.reference_slice)
            )

    def __len__(self):
        return len(self.ids)

    def __call__(self, index: int):
        _id = self.ids[index]
        img = np.load(os.path.join(self._img_dir, f"{_id}.npy")).astype(np.float32)
        mask = np.load(os.path.join(self._mask_dir, f"{_id}.npy")).astype(np.int32)
        if mask.ndim == 3:
            mask = mask[..., 0]
        if self._ref_img is not None:
            img = match_histograms_single(img, self._ref_img).astype(np.float32)
        vert = None
        if self.load_vertices:
            vert = np.load(os.path.join(self._vert_dir, f"{_id}.npy")).astype(np.float32)
        return img, mask, vert
