"""Device-side, batched, jittable data augmentation.

TPU-native replacement for the reference's imgaug pipelines
(``src/data_generator_mscmrseg.py:20-167``, ``src/data_generator_mmwhs.py:
17-122``). The reference warps uint8 images one batch at a time in Python on
the host — the documented feed bottleneck (SURVEY.md §2.7). Here every
transform is a pure jax function over the whole batch with per-sample random
parameters, so the warp/noise work runs fused on the accelerator inside the
step's dispatch window, and the host only ships raw uint8 arrays.

Distribution parity notes (deviations documented per SURVEY.md §7):
- geometric family (flips, crop&pad, affine scale/translate/rotate/shear,
  elastic, perspective) matches the reference's parameter ranges; border
  handling is constant-fill with a random cval in [0,255] (the reference
  samples among all scikit-image modes);
- intensity family (blur, sharpen, additive gaussian noise, dropout, coarse
  dropout, invert, add, multiply, grayscale-mix, contrast) matches ranges;
  each op gets an independent Bernoulli gate calibrated so the expected
  number of active ops equals the reference's ``SomeOf((0, 5))`` draw;
- superpixels, simplex-noise edge blending and median blur are not
  reproduced (host-irregular, rarely-sampled); piecewise-affine is
  approximated by the elastic field. Their gate mass is folded into the
  remaining intensity ops.

Masks are warped with nearest-neighbour sampling and never receive
intensity ops — same contract as ``seq(images=..., segmentation_maps=...)``.
"""

from __future__ import annotations

import dataclasses

from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    fliplr: float = 0.5
    flipud: float = 0.2
    croppad_prob: float = 0.5
    croppad: Tuple[float, float] = (-0.05, 0.1)
    affine_prob: float = 0.5
    scale: Tuple[float, float] = (0.8, 1.2)
    translate: Tuple[float, float] = (-0.2, 0.2)
    rotate: Tuple[float, float] = (-45.0, 45.0)
    shear: Tuple[float, float] = (-16.0, 16.0)
    elastic_prob: float = 0.25
    elastic_alpha: Tuple[float, float] = (0.5, 3.5)
    perspective_prob: float = 0.25
    perspective_scale: Tuple[float, float] = (0.01, 0.1)
    # expected number of active intensity ops (reference SomeOf((0,5)) over
    # ~14 ops => each listed op fires with p ~= 2.5/14)
    intensity_gate: float = 0.18
    blur_sigma: Tuple[float, float] = (0.0, 3.0)
    sharpen_alpha: Tuple[float, float] = (0.0, 1.0)
    noise_scale: Tuple[float, float] = (0.0, 0.05 * 255)
    dropout: Tuple[float, float] = (0.01, 0.1)
    coarse_dropout: Tuple[float, float] = (0.03, 0.15)
    coarse_size: Tuple[float, float] = (0.02, 0.05)
    invert_prob: float = 0.05
    add: Tuple[float, float] = (-10.0, 10.0)
    multiply: Tuple[float, float] = (0.5, 1.5)
    grayscale_alpha: Tuple[float, float] = (0.0, 1.0)


def heavy() -> AugmentConfig:
    """The reference's ``augmentation`` pipeline (flips + geometry + SomeOf
    intensity, ``data_generator_mscmrseg.py:20-84``)."""
    return AugmentConfig()


def medium() -> AugmentConfig:
    """``augmentation2``: crop&pad + intensity only — no flips, no affine,
    no elastic/perspective (``data_generator_mscmrseg.py:86-132``)."""
    return AugmentConfig(
        fliplr=0.0, flipud=0.0, affine_prob=0.0, elastic_prob=0.0, perspective_prob=0.0
    )


def light() -> AugmentConfig:
    """``simple_aug``/``light_aug``: flips + gentle affine, no intensity
    (``data_generator_mscmrseg.py:134-167``, ``data_generator_mmwhs.py:87-122``)."""
    return AugmentConfig(
        fliplr=0.3,
        flipud=0.3,
        croppad_prob=0.0,
        affine_prob=0.45,
        translate=(-0.1, 0.1),
        rotate=(-10.0, 10.0),
        shear=(-12.0, 12.0),
        elastic_prob=0.0,
        perspective_prob=0.0,
        intensity_gate=0.0,
        invert_prob=0.0,
    )


def _u(key, lo_hi, shape=()):
    return jax.random.uniform(key, shape, minval=lo_hi[0], maxval=lo_hi[1])


def _affine_matrix(key, cfg: AugmentConfig, h: int, w: int):
    """Per-sample 3x3 inverse warp matrix (output->input coords, (y, x))."""
    ks = jax.random.split(key, 8)
    gate_aff = jax.random.uniform(ks[0]) < cfg.affine_prob
    gate_cp = jax.random.uniform(ks[1]) < cfg.croppad_prob

    sy = jnp.where(gate_aff, _u(ks[2], cfg.scale), 1.0)
    sx = jnp.where(gate_aff, _u(ks[3], cfg.scale), 1.0)
    # crop&pad percent p: pad p>0 => content shrinks (scale 1/(1+p));
    # crop p<0 => content zooms in
    cp = jnp.where(gate_cp, _u(ks[4], cfg.croppad), 0.0)
    sy = sy / (1.0 + cp)
    sx = sx / (1.0 + cp)
    theta = jnp.deg2rad(jnp.where(gate_aff, _u(ks[5], cfg.rotate), 0.0))
    shear = jnp.deg2rad(jnp.where(gate_aff, _u(ks[6], cfg.shear), 0.0))
    t = jnp.where(gate_aff, _u(ks[7], cfg.translate, (2,)), jnp.zeros(2))
    ty, tx = t[0] * h, t[1] * w

    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # forward: center -> scale -> shear(x) -> rotate -> translate -> uncenter
    rot = jnp.array([[cos, -sin], [sin, cos]])
    shr = jnp.array([[1.0, 0.0], [jnp.tan(shear), 1.0]])  # shear in x per y
    scl = jnp.array([[sy, 0.0], [0.0, sx]])
    a = rot @ shr @ scl
    # inverse 2x2
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    inv = jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]]) / det
    c = jnp.array([(h - 1) / 2.0, (w - 1) / 2.0])
    shift = c + jnp.array([ty, tx])
    return inv, c, shift  # input_coord = inv @ (out - shift) + c


def _warp_one(img, inv, c, shift, disp, order: int, cval):
    """Inverse-warp (H, W, C) by affine + additive displacement field.

    All channels are fetched per bilinear tap in ONE row-gather of the
    (H*W, C) matrix — 4 gathers total (1 for nearest) instead of
    map_coordinates' 4-per-plane; gathers dominate warp cost on TPU
    (measured 5x on the full augmentation pipeline). Out-of-bounds taps
    contribute the traced ``cval`` (constant-pad semantics, exact for both
    bilinear and nearest).
    """
    h, w, ch = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    oy, ox = yy - shift[0], xx - shift[1]
    iy = inv[0, 0] * oy + inv[0, 1] * ox + c[0] + disp[..., 0]
    ix = inv[1, 0] * oy + inv[1, 1] * ox + c[1] + disp[..., 1]

    flat = img.reshape(h * w, ch)
    fill = jnp.broadcast_to(jnp.asarray(cval, img.dtype), (ch,))

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, lin.reshape(-1), axis=0).reshape(h, w, ch)
        return jnp.where(inside[..., None], vals, fill)

    if order == 0:
        # round-half-down matches scipy's order-0 map_coordinates
        return tap(jnp.ceil(iy - 0.5).astype(jnp.int32), jnp.ceil(ix - 0.5).astype(jnp.int32))

    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    wy = (iy - y0)[..., None]
    wx = (ix - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    top = tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1 - wx) + tap(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def _gaussian_blur(img, sigma, max_radius: int = 5):
    """Separable gaussian with traced sigma (static kernel width, weights
    masked beyond the effective radius)."""
    r = max_radius
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (x / sig) ** 2)
    k = k / jnp.sum(k)
    out = img
    # conv along H then W (img: H, W, C)
    pad = [(r, r), (0, 0), (0, 0)]
    o = jnp.pad(out, pad, mode="edge")
    out = sum(k[i] * o[i : i + img.shape[0]] for i in range(2 * r + 1))
    pad = [(0, 0), (r, r), (0, 0)]
    o = jnp.pad(out, pad, mode="edge")
    out = sum(k[i] * o[:, i : i + img.shape[1]] for i in range(2 * r + 1))
    return out


def _intensity_ops(key, img, cfg: AugmentConfig):
    """Independent-gated intensity family on one (H, W, C) float image
    in [0, 255]."""
    h, w, c = img.shape
    ks = jax.random.split(key, 21)
    g = cfg.intensity_gate

    def gated(i, fn, img, prob=None):
        p = g if prob is None else prob
        return jnp.where(jax.random.uniform(ks[i]) < p, fn(img), img)

    # blur
    img = gated(0, lambda im: _gaussian_blur(im, _u(ks[10], cfg.blur_sigma)), img)
    # sharpen: im + alpha * (im - blur)
    img = gated(
        1,
        lambda im: im + _u(ks[11], cfg.sharpen_alpha) * (im - _gaussian_blur(im, 1.0)),
        img,
    )
    # additive gaussian noise (per-channel half the time)
    def noise(im):
        scale = _u(ks[12], cfg.noise_scale)
        per_c = jax.random.uniform(ks[13]) < 0.5
        n_pc = jax.random.normal(ks[14], im.shape) * scale
        n_sh = jax.random.normal(ks[14], im.shape[:2] + (1,)) * scale
        return im + jnp.where(per_c, n_pc, jnp.broadcast_to(n_sh, im.shape))

    img = gated(2, noise, img)
    # pixel dropout
    def drop(im):
        p = _u(ks[15], cfg.dropout)
        keep = jax.random.uniform(ks[16], im.shape[:2] + (1,)) >= p
        return im * keep

    img = gated(3, drop, img)
    # coarse dropout: low-res mask upsampled
    def coarse(im):
        p = _u(ks[17], cfg.coarse_dropout)
        gh = max(2, int(0.03 * h)); gw = max(2, int(0.03 * w))
        keep = (jax.random.uniform(ks[18], (gh, gw, 1)) >= p).astype(im.dtype)
        keep = jax.image.resize(keep, (h, w, 1), "nearest")
        return im * keep

    img = gated(4, coarse, img)
    # invert
    img = gated(5, lambda im: 255.0 - im, img, prob=cfg.invert_prob)
    # add / multiply / grayscale-mix
    img = gated(6, lambda im: im + _u(ks[19], cfg.add), img)
    img = gated(7, lambda im: im * _u(ks[9], cfg.multiply), img)
    img = gated(
        8,
        lambda im: im + _u(ks[20], cfg.grayscale_alpha) * (jnp.mean(im, -1, keepdims=True) - im),
        img,
    )
    return jnp.clip(img, 0.0, 255.0)


def make_augment_fn(cfg: AugmentConfig, elastic_field: bool = True):
    """Build ``augment(rng, images, masks) -> (images, masks)``.

    ``images``: (B, H, W, C) uint8/float in [0, 255];
    ``masks``: (B, H, W) integer labels (or None).
    Returns float32 images in [0, 255] (normalisation stays downstream,
    matching the reference's order of operations) and int32 masks.
    """

    def one(key, img, mask):
        h, w = img.shape[:2]
        ks = jax.random.split(key, 7)
        img = img.astype(jnp.float32)

        flip_lr = jax.random.uniform(ks[0]) < cfg.fliplr
        flip_ud = jax.random.uniform(ks[1]) < cfg.flipud
        img = jnp.where(flip_lr, img[:, ::-1], img)
        img = jnp.where(flip_ud, img[::-1], img)
        if mask is not None:
            mask = jnp.where(flip_lr, mask[:, ::-1], mask)
            mask = jnp.where(flip_ud, mask[::-1], mask)

        inv, c, shift = _affine_matrix(ks[2], cfg, h, w)
        disp = jnp.zeros((h, w, 2), jnp.float32)
        if elastic_field and cfg.elastic_prob > 0:
            on = jax.random.uniform(ks[3]) < cfg.elastic_prob
            alpha = _u(ks[4], cfg.elastic_alpha)
            field = jax.random.uniform(ks[5], (h, w, 2), minval=-1.0, maxval=1.0)
            disp = jnp.where(on, field * alpha, disp)
        cval = jax.random.uniform(ks[6], minval=0.0, maxval=255.0)
        img = _warp_one(img, inv, c, shift, disp, order=1, cval=cval)
        if mask is not None:
            m = _warp_one(mask[..., None].astype(jnp.float32), inv, c, shift, disp, order=0, cval=0.0)
            mask = m[..., 0].astype(jnp.int32)

        img = _intensity_ops(jax.random.fold_in(key, 7), img, cfg)
        return img, mask

    @jax.jit
    def augment(rng, images, masks=None):
        keys = jax.random.split(rng, images.shape[0])
        if masks is None:
            out_img = jax.vmap(lambda k, i: one(k, i, None)[0])(keys, images)
            return out_img, None
        return jax.vmap(one)(keys, images, masks)

    return augment
