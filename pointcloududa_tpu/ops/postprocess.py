"""Host-side (numpy) post-processing utilities.

Equivalents of reference ``src/utils/utils.py`` — kept on host on purpose:
the evaluation chain (argmax → keep-largest-connected-components → relabel →
metric) must match the reference bit-for-bit, and these ops are cheap,
irregular, and not on the training hot path.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def to_categorical(mask: np.ndarray, num_classes: int, channel: str = "channel_last") -> np.ndarray:
    """Integer mask → one-hot (uint8).

    Mirrors reference ``src/utils/utils.py:7-29`` including its validation
    and the squeeze of a singleton channel axis at position 1 or -1.
    Default layout is channel_last (TPU-native NHWC); pass
    ``channel='channel_first'`` for the reference's NCHW contract.
    """
    if channel not in ("channel_first", "channel_last"):
        raise ValueError("channel should be either 'channel_first' or 'channel_last'")
    if num_classes <= 1:
        raise ValueError("num_classes should be greater than 1")
    mask = np.asarray(mask)
    unique = np.unique(mask)
    if len(unique) > num_classes:
        raise ValueError("number of unique values should be <= num_classes")
    if unique.max() >= num_classes:
        raise ValueError("maximum value in the mask should be < num_classes")
    if mask.ndim > 1 and mask.shape[1] == 1:
        mask = np.squeeze(mask, axis=1)
    if mask.ndim > 1 and mask.shape[-1] == 1:
        mask = np.squeeze(mask, axis=-1)
    eye = np.eye(num_classes, dtype="uint8")
    out = eye[mask.astype(np.int64)]
    if channel == "channel_first":
        out = np.moveaxis(out, -1, 1)
    return out


def soft_to_hard_pred(pred: np.ndarray, channel_axis: int = -1) -> np.ndarray:
    """Per-pixel one-hot of the max class (reference ``utils.py:32-40``).

    Note the reference semantics: *every* channel equal to the max gets a 1
    (ties produce multi-hot rows), via equality against the max — reproduced
    exactly because the train-time Dice depends on it.
    """
    pred = np.asarray(pred)
    max_value = np.max(pred, axis=channel_axis, keepdims=True)
    return np.where(pred == max_value, 1, 0)


def keep_largest_connected_components(mask: np.ndarray, num_classes: int | None = None) -> np.ndarray:
    """Keep only the largest 3-D connected component of each foreground label.

    Equivalent of reference ``src/utils/utils.py:43-65`` (which uses
    ``skimage.measure.label(connectivity=1)``): here scipy's 6-connected
    3-D labeling — the same connectivity-1 structure. The reference derives
    the number of structures from ``mask.shape[1]`` (a latent bug when slices
    are square); we default to ``mask.max()`` which is the intended set of
    labels, or accept an explicit ``num_classes`` (number of foreground ids).
    """
    mask = np.asarray(mask)
    out_img = np.zeros(mask.shape, dtype=np.uint8)
    n = int(num_classes) if num_classes is not None else int(mask.max())
    structure = ndimage.generate_binary_structure(mask.ndim, 1)
    for struc_id in range(1, n + 1):
        binary_img = mask == struc_id
        blobs, n_blobs = ndimage.label(binary_img, structure=structure)
        if n_blobs == 0:
            continue
        areas = np.bincount(blobs.ravel())[1:]  # skip background count
        largest = int(np.argmax(areas)) + 1
        out_img[blobs == largest] = struc_id
    return out_img


def resize_volume(img_volume: np.ndarray, w: int = 256, h: int = 256) -> np.ndarray:
    """Per-slice cv2 INTER_AREA resize (reference ``utils.py:83-92``).

    Kept on host with OpenCV so the evaluation path matches the reference
    within fp tolerance (INTER_AREA has no XLA equivalent).
    """
    import cv2

    return np.array([cv2.resize(im, dsize=(w, h), interpolation=cv2.INTER_AREA) for im in img_volume])


def crop_volume(vol: np.ndarray, crop_size: int = 112) -> np.ndarray:
    """Center crop of a (N, H, W, ...) volume to 2*crop_size.

    Reference ``src/data_generator_mscmrseg.py:179-183``.
    """
    h0 = int(vol.shape[1] / 2)
    w0 = int(vol.shape[2] / 2)
    return np.array(vol[:, h0 - crop_size : h0 + crop_size, w0 - crop_size : w0 + crop_size])


def reconstruct_volume(vol: np.ndarray, crop_size: int = 112, origin_size: int = 256) -> np.ndarray:
    """Reverse of :func:`crop_volume` — zero-pad back to the original canvas.

    Reference ``src/evaluate_mscmrseg.py:30-44`` (channel-last in/out).
    """
    num_class = vol.shape[-1]
    recon = np.zeros((len(vol), origin_size, origin_size, num_class), dtype=np.float32)
    c0 = origin_size // 2
    recon[:, c0 - crop_size : c0 + crop_size, c0 - crop_size : c0 + crop_size, :] = vol
    return recon
