"""Host-side (numpy/cv2) augmentation — the slow-path twin of
``ops/augment.py``.

Exists for one reason (SURVEY.md §7 "hard parts"): the MM-WHS point-cloud
path regenerates vertex ground truth from the *warped* masks
(``src/data_generator_mmwhs.py:256-264``), which needs the warped mask on
the host before batch assembly. The loader runs this in its worker pool,
overlapped with device compute; every other configuration uses the fused
device pipeline.

Geometry matches the reference's ``light_aug``/``simple_aug`` family
(flips + affine with the same ranges, ``data_generator_mmwhs.py:87-122``);
``heavy=True`` adds the dominant intensity ops (blur/noise/multiply/add)
from the heavy pipeline's ranges.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _affine_mat(rng, h, w, scale, translate, rotate, shear):
    import cv2

    sy, sx = rng.uniform(*scale), rng.uniform(*scale)
    ty, tx = rng.uniform(*translate) * h, rng.uniform(*translate) * w
    theta = np.deg2rad(rng.uniform(*rotate))
    sh = np.deg2rad(rng.uniform(*shear))
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    shr = np.array([[1.0, 0.0], [np.tan(sh), 1.0]])
    scl = np.array([[sy, 0.0], [0.0, sx]])
    a = rot @ shr @ scl
    center = np.array([(h - 1) / 2.0, (w - 1) / 2.0])
    offset = center + np.array([ty, tx]) - a @ center
    # cv2 uses (x, y) order
    m = np.zeros((2, 3))
    m[0, 0], m[0, 1], m[0, 2] = a[1, 1], a[1, 0], offset[1]
    m[1, 0], m[1, 1], m[1, 2] = a[0, 1], a[0, 0], offset[0]
    return m


def augment_batch(
    images: np.ndarray,
    masks: Optional[np.ndarray],
    rng: Optional[np.random.Generator] = None,
    heavy: bool = False,
    fliplr: float = 0.2,
    flipud: float = 0.2,
    affine_prob: float = 0.3,
    scale: Tuple[float, float] = (0.8, 1.2),
    translate: Tuple[float, float] = (-0.1, 0.1),
    rotate: Tuple[float, float] = (-10, 10),
    shear: Tuple[float, float] = (-12, 12),
):
    """(B, H, W, C) images + (B, H, W) int masks -> augmented pair.

    Float images are min-max mapped to the 0..255 uint8 range around the
    warp and mapped back, reproducing the MM-WHS round-trip
    (``data_generator_mmwhs.py:245-254``).
    """
    import cv2

    rng = rng or np.random.default_rng()
    images = np.asarray(images)
    is_float = images.dtype != np.uint8
    lo, hi = float(images.min()), float(images.max())
    if is_float:
        work = (images - lo) * 255.0 / (hi - lo + 1e-12)
    else:
        work = images.astype(np.float64)
    out_i = np.empty_like(work)
    out_m = None if masks is None else np.empty_like(masks)
    h, w = images.shape[1:3]
    for b in range(len(images)):
        img = work[b]
        msk = None if masks is None else masks[b]
        if rng.uniform() < fliplr:
            img = img[:, ::-1]
            msk = None if msk is None else msk[:, ::-1]
        if rng.uniform() < flipud:
            img = img[::-1]
            msk = None if msk is None else msk[::-1]
        if rng.uniform() < affine_prob:
            m = _affine_mat(rng, h, w, scale, translate, rotate, shear)
            order = cv2.INTER_NEAREST if rng.uniform() < 0.5 else cv2.INTER_LINEAR
            cval = float(rng.uniform(0, 255))
            img = cv2.warpAffine(img, m, (w, h), flags=order, borderValue=(cval,) * 3)
            if img.ndim == 2:
                img = img[..., None]
            if msk is not None:
                msk = cv2.warpAffine(
                    msk.astype(np.float32), m, (w, h), flags=cv2.INTER_NEAREST, borderValue=0
                ).astype(masks.dtype)
        if heavy:
            if rng.uniform() < 0.2:
                sigma = rng.uniform(0.0, 3.0)
                if sigma > 0.1:
                    img = cv2.GaussianBlur(img, (0, 0), sigma)
                    if img.ndim == 2:
                        img = img[..., None]
            if rng.uniform() < 0.2:
                img = img + rng.normal(0, rng.uniform(0, 0.05 * 255), size=img.shape)
            if rng.uniform() < 0.2:
                img = img * rng.uniform(0.5, 1.5)
            if rng.uniform() < 0.2:
                img = img + rng.uniform(-10, 10)
            img = np.clip(img, 0, 255)
        out_i[b] = img
        if out_m is not None:
            out_m[b] = msk
    if is_float:
        out_i = lo + out_i.astype(np.float32) * (hi - lo + 1e-12) / 255.0
    else:
        out_i = np.clip(out_i, 0, 255).astype(np.float64)
    return out_i.astype(images.dtype if not is_float else np.float32), out_m


def make_host_augment(aug: str):
    """Loader hook: (images, masks, rng) -> (images, masks)."""
    if aug == "heavy":
        return lambda i, m, rng: augment_batch(
            i, m, rng, heavy=True, fliplr=0.5, flipud=0.2, affine_prob=0.5,
            translate=(-0.2, 0.2), rotate=(-45, 45), shear=(-16, 16),
        )
    if aug in ("light", "aug2"):
        return lambda i, m, rng: augment_batch(i, m, rng, heavy=False)
    return None
