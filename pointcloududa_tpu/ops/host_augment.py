"""Host-side (numpy/cv2) augmentation — the slow-path twin of
``ops/augment.py``.

Exists for one reason (SURVEY.md §7 "hard parts"): the MM-WHS point-cloud
path regenerates vertex ground truth from the *warped* masks
(``src/data_generator_mmwhs.py:256-264``), which needs the warped mask on
the host before batch assembly. The loader runs this in its worker pool,
overlapped with device compute; every other configuration uses the fused
device pipeline.

Since r2 this is a FULL twin: it implements the same 15-entry SomeOf
family as the device pipeline, reading its gates and parameter ranges from
the same :class:`~pointcloududa_tpu.ops.augment.AugmentConfig`, so the two
paths cannot drift. The heavy ops map onto cv2 (the backend imgaug itself
wraps): medianBlur/blur/GaussianBlur, filter2D sharpen/emboss/edge,
cvtColor hue/saturation, warpAffine/warpPerspective/remap geometry;
superpixels reuse the same downscaled k-means SLIC as the device kernel.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from pointcloududa_tpu.ops import augment as augment_cfg


def _affine_mat(rng, h, w, cfg: "augment_cfg.AugmentConfig"):
    """Forward cv2 2x3 matrix for the crop&pad + affine family (same
    composition as the device `_affine_inverse`, forward form)."""
    gate_aff = rng.uniform() < cfg.affine_prob
    gate_cp = rng.uniform() < cfg.croppad_prob
    sy = rng.uniform(*cfg.scale) if gate_aff else 1.0
    sx = rng.uniform(*cfg.scale) if gate_aff else 1.0
    cp = rng.uniform(*cfg.croppad) if gate_cp else 0.0
    sy, sx = sy / (1.0 + cp), sx / (1.0 + cp)
    theta = np.deg2rad(rng.uniform(*cfg.rotate)) if gate_aff else 0.0
    sh = np.deg2rad(rng.uniform(*cfg.shear)) if gate_aff else 0.0
    t = rng.uniform(*cfg.translate, size=2) if gate_aff else np.zeros(2)
    ty, tx = t[0] * h, t[1] * w
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    shr = np.array([[1.0, 0.0], [np.tan(sh), 1.0]])
    scl = np.array([[sy, 0.0], [0.0, sx]])
    a = rot @ shr @ scl
    center = np.array([(h - 1) / 2.0, (w - 1) / 2.0])
    offset = center + np.array([ty, tx]) - a @ center
    m = np.zeros((2, 3))
    m[0, 0], m[0, 1], m[0, 2] = a[1, 1], a[1, 0], offset[1]  # cv2 (x, y)
    m[1, 0], m[1, 1], m[1, 2] = a[0, 1], a[0, 0], offset[0]
    return m, (gate_aff or gate_cp)


def _kernel3(alpha, eff):
    ident = np.zeros((3, 3), np.float32)
    ident[1, 1] = 1.0
    return (1.0 - alpha) * ident + alpha * eff


def _superpixels_np(rng, img, cfg):
    """Downscaled k-means SLIC — numpy twin of the device kernel."""
    import cv2

    h, w, c = img.shape
    factor = max(1, -(-max(h, w) // 128))
    small = cv2.resize(img, (w // factor, h // factor)) if factor > 1 else img
    if small.ndim == 2:
        small = small[..., None]
    hs, ws = small.shape[:2]
    n = int(rng.integers(cfg.superpixels_segments[0], cfg.superpixels_segments[1] + 1))
    ys = rng.integers(0, hs, n)
    xs = rng.integers(0, ws, n)
    sw = 10.0 / math.sqrt(hs * ws / n)
    yy, xx = np.mgrid[0:hs, 0:ws].astype(np.float32)
    feats = np.concatenate(
        [small.reshape(-1, c) / 255.0, (yy.reshape(-1, 1) * sw), (xx.reshape(-1, 1) * sw)], 1
    )
    centers = np.concatenate(
        [small[ys, xs] / 255.0, ys[:, None] * sw, xs[:, None] * sw], 1
    ).astype(np.float32)
    for _ in range(3):
        d = ((feats[:, None, :] - centers[None]) ** 2).sum(-1)
        seg = d.argmin(1)
        for k in range(n):
            sel = seg == k
            if sel.any():
                centers[k] = feats[sel].mean(0)
    means = np.stack(
        [small.reshape(-1, c)[seg == k].mean(0) if (seg == k).any() else np.zeros(c) for k in range(n)]
    )
    p_rep = rng.uniform(*cfg.superpixels_replace)
    rep = rng.uniform(size=n) < p_rep
    seg_img = seg.reshape(hs, ws)
    if factor > 1:
        seg_img = cv2.resize(seg_img.astype(np.float32), (w, h), interpolation=cv2.INTER_NEAREST).astype(int)
    out = img.copy()
    mask = rep[seg_img]
    out[mask] = means[seg_img[mask]]
    return out


def _intensity_np(rng, img, cfg):
    """The SomeOf family on one (H, W, C) float image in [0, 255] —
    op-for-op twin of the device `_intensity_ops` (independent gates)."""
    import cv2

    h, w, c = img.shape
    g = cfg.intensity_gate

    def as3(x):
        return x[..., None] if x.ndim == 2 else x

    if cfg.superpixels_prob > 0 and rng.uniform() < cfg.superpixels_prob:
        img = _superpixels_np(rng, img, cfg)
    if g <= 0:
        return np.clip(img, 0, 255)
    # blur OneOf
    if rng.uniform() < g:
        choice = rng.integers(0, 3)
        if choice == 0:
            sigma = rng.uniform(*cfg.blur_sigma)
            if sigma > 1e-3:
                img = as3(cv2.GaussianBlur(img, (0, 0), sigma))
        elif choice == 1:
            k = int(rng.integers(cfg.avg_blur_k[0], cfg.avg_blur_k[1] + 1))
            if k > 1:
                img = as3(cv2.blur(img, (k, k)))
        else:
            k = 2 * int(rng.integers(cfg.median_blur_k[0] // 2, cfg.median_blur_k[1] // 2 + 1)) + 1
            if k > 1:
                img = as3(cv2.medianBlur(np.clip(img, 0, 255).astype(np.uint8), k).astype(np.float64))
    # sharpen
    if rng.uniform() < g:
        a = rng.uniform(*cfg.sharpen_alpha)
        light = rng.uniform(*cfg.sharpen_lightness)
        eff = np.array([[-1, -1, -1], [-1, 8 + light, -1], [-1, -1, -1]], np.float32)
        img = as3(cv2.filter2D(img, -1, _kernel3(a, eff)))
    # emboss
    if rng.uniform() < g:
        a = rng.uniform(*cfg.emboss_alpha)
        s = rng.uniform(*cfg.emboss_strength)
        eff = np.array([[-1 - s, -s, 0], [-s, 1, s], [0, s, 1 + s]], np.float32)
        img = as3(cv2.filter2D(img, -1, _kernel3(a, eff)))
    # simplex-noise edge blend
    if rng.uniform() < g:
        a = rng.uniform(*cfg.edge_alpha)
        lap = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
        edged = np.clip(as3(cv2.filter2D(img, -1, _kernel3(a, lap))), 0, 255)
        cell = int(rng.choice([4, 8, 16]))
        grid = rng.uniform(size=(max(2, h // cell), max(2, w // cell))).astype(np.float32)
        m = cv2.resize(grid, (w, h))[..., None]
        img = m * edged + (1 - m) * img
    # additive gaussian noise (per_channel 0.5)
    if rng.uniform() < g:
        scale = rng.uniform(*cfg.noise_scale)
        shape = img.shape if rng.uniform() < 0.5 else img.shape[:2] + (1,)
        img = img + rng.normal(0, 1, size=shape) * scale
    # dropout OneOf
    if rng.uniform() < g:
        if rng.uniform() < 0.5:
            p = rng.uniform(*cfg.dropout)
            shape = img.shape if rng.uniform() < 0.5 else img.shape[:2] + (1,)
            img = img * (rng.uniform(size=shape) >= p)
        else:
            p = rng.uniform(*cfg.coarse_dropout)
            gh, gw = max(2, int(0.03 * h)), max(2, int(0.03 * w))
            ch = c if rng.uniform() < 0.2 else 1
            keep = (rng.uniform(size=(gh, gw, ch)) >= p).astype(np.float32)
            import cv2 as _cv

            keep = _cv.resize(keep, (w, h), interpolation=_cv.INTER_NEAREST)
            img = img * (keep[..., None] if keep.ndim == 2 else keep)
    # invert (per-channel)
    if cfg.invert_prob > 0 and rng.uniform() < g:
        inv = rng.uniform(size=c) < cfg.invert_prob
        img = np.where(inv, 255.0 - img, img)
    # add (per_channel 0.5)
    if rng.uniform() < g:
        v = rng.uniform(*cfg.add, size=c) if rng.uniform() < 0.5 else rng.uniform(*cfg.add)
        img = img + v
    # hue / saturation
    if c == 3 and rng.uniform() < g:
        v = rng.uniform(*cfg.hue_sat)
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(np.float64)
        hsv[..., 0] = np.mod(hsv[..., 0] + v, 180.0)
        hsv[..., 1] = np.clip(hsv[..., 1] + v, 0, 255)
        img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(np.float64)
    # multiply (per_channel 0.5)
    if rng.uniform() < g:
        v = rng.uniform(*cfg.multiply, size=c) if rng.uniform() < 0.5 else rng.uniform(*cfg.multiply)
        img = img * v
    # grayscale mix
    if rng.uniform() < g:
        a = rng.uniform(*cfg.grayscale_alpha)
        img = img + a * (img.mean(-1, keepdims=True) - img)
    return np.clip(img, 0, 255)


def augment_batch(
    images: np.ndarray,
    masks: Optional[np.ndarray],
    rng: Optional[np.random.Generator] = None,
    cfg: Optional["augment_cfg.AugmentConfig"] = None,
):
    """(B, H, W, C) images + (B, H, W) int masks -> augmented pair.

    Float images are min-max mapped to the 0..255 uint8 range around the
    warp and mapped back, reproducing the MM-WHS round-trip
    (``data_generator_mmwhs.py:245-254``).
    """
    import cv2

    rng = rng or np.random.default_rng()
    cfg = cfg or augment_cfg.light()
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
        if rng.uniform() < cfg.fliplr:
            img = img[:, ::-1]
            msk = None if msk is None else msk[:, ::-1]
        if rng.uniform() < cfg.flipud:
            img = img[::-1]
            msk = None if msk is None else msk[::-1]
        m, warped = _affine_mat(rng, h, w, cfg)
        if cfg.perspective_prob > 0 and rng.uniform() < cfg.perspective_prob:
            s = rng.uniform(*cfg.perspective_scale)
            jit = rng.normal(0, s, size=(4, 2)) * np.array([w, h])  # cv2 (x, y)
            dst = np.array([[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1]], np.float32)
            src = (dst + jit).astype(np.float32)
            hmat = cv2.getPerspectiveTransform(src, dst)
            img = cv2.warpPerspective(img, hmat, (w, h))
            if img.ndim == 2:
                img = img[..., None]
            if msk is not None:
                msk = cv2.warpPerspective(
                    msk.astype(np.float32), hmat, (w, h), flags=cv2.INTER_NEAREST
                ).astype(masks.dtype)
        if warped:
            order = cv2.INTER_NEAREST if rng.uniform() < 0.5 else cv2.INTER_LINEAR
            cval = float(rng.uniform(0, 255))
            img = cv2.warpAffine(img, m, (w, h), flags=order, borderValue=(cval,) * 3)
            if img.ndim == 2:
                img = img[..., None]
            if msk is not None:
                msk = cv2.warpAffine(
                    msk.astype(np.float32), m, (w, h), flags=cv2.INTER_NEAREST, borderValue=0
                ).astype(masks.dtype)
        # elastic + piecewise displacement fields via one remap
        disp = None
        if cfg.elastic_prob > 0 and rng.uniform() < cfg.elastic_prob:
            alpha = rng.uniform(*cfg.elastic_alpha)
            disp = rng.uniform(-1, 1, size=(h, w, 2)).astype(np.float32) * alpha
        if cfg.piecewise_prob > 0 and rng.uniform() < cfg.piecewise_prob:
            s = rng.uniform(*cfg.piecewise_scale)
            grid = rng.normal(0, 1, size=(4, 4, 2)).astype(np.float32)
            coarse = cv2.resize(grid, (w, h)) * s * np.array([h, w], np.float32)
            disp = coarse if disp is None else disp + coarse
        if disp is not None:
            yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
            map_x = xx + disp[..., 1]
            map_y = yy + disp[..., 0]
            img = cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)
            if img.ndim == 2:
                img = img[..., None]
            if msk is not None:
                msk = cv2.remap(
                    msk.astype(np.float32), map_x, map_y, cv2.INTER_NEAREST,
                    borderMode=cv2.BORDER_REPLICATE,
                ).astype(masks.dtype)
        img = _intensity_np(rng, img, cfg)
        out_i[b] = img
        if out_m is not None:
            out_m[b] = msk
    if is_float:
        out_i = lo + out_i.astype(np.float32) * (hi - lo + 1e-12) / 255.0
    else:
        out_i = np.clip(out_i, 0, 255).astype(np.float64)
    return out_i.astype(images.dtype if not is_float else np.float32), out_m


def make_host_augment(aug: str):
    """Loader hook: (images, masks, rng) -> (images, masks). Gates and
    ranges come from the same AugmentConfig as the device pipeline."""
    if aug == "heavy":
        cfg = augment_cfg.heavy()
    elif aug == "aug2":
        cfg = augment_cfg.medium()
    elif aug == "light":
        cfg = augment_cfg.light()
    else:
        return None
    return lambda i, m, rng: augment_batch(i, m, rng, cfg=cfg)
