"""Device-side, batched, jittable data augmentation.

TPU-native replacement for the reference's imgaug pipelines
(``src/data_generator_mscmrseg.py:20-167``, ``src/data_generator_mmwhs.py:
17-122``). The reference warps uint8 images one batch at a time in Python on
the host — the documented feed bottleneck (SURVEY.md §2.7). Here every
transform is a pure jax function over the whole batch with per-sample random
parameters, so the warp/noise work runs fused on the accelerator inside the
step's dispatch window, and the host only ships raw uint8 arrays.

Structure mirrors the reference's ``heavy`` pipeline: flips -> sometimes
crop&pad -> sometimes affine -> ``SomeOf((0, 5))`` over FIFTEEN entries
(superpixels*, blur-OneOf{gaussian, average, median}, sharpen, emboss,
simplex-noise edge blend, additive gaussian noise, dropout-OneOf{pixel,
coarse}, invert, add, hue/saturation, multiply, grayscale, elastic*,
piecewise-affine*, perspective*; ``*`` = wrapped in ``Sometimes(0.5)``).
Every entry and parameter range is implemented; gates are independent
Bernoullis with p = E[SomeOf]/n_entries = 2.5/15 (x0.5 for the
Sometimes-wrapped entries), so the expected number of active ops matches.

Distribution-level (not RNG-level) parity deviations, each minor and
documented inline: random_order application shuffling is not reproduced
(fixed op order; all geometry composes into ONE resample — higher fidelity
than imgaug's repeated resampling); SomeOf samples without replacement,
gates here are independent; border handling is constant-fill with a random
cval in [0, 255] (the reference samples among all scikit-image modes);
simplex noise is approximated by bilinear value noise at a sampled
granularity; directed edge detect uses the isotropic kernel; coarse-dropout
grid granularity is fixed at ~3% of the image (imgaug samples 2-5%);
superpixels run at <=128px internal resolution exactly like imgaug's
``max_size=128`` but with a k-means SLIC approximation.

Masks are warped with nearest-neighbour sampling and never receive
intensity ops — same contract as ``seq(images=..., segmentation_maps=...)``.
"""

from __future__ import annotations

import dataclasses

from typing import Tuple

import jax
import jax.numpy as jnp

_SOMEOF_EXPECTED = 2.5  # E[#active] of iaa.SomeOf((0, 5))


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
    # ---- SomeOf((0,5)) family: per-entry gate (2.5/15 for heavy); the
    # Sometimes(0.5)-wrapped entries use gate * 0.5
    intensity_gate: float = _SOMEOF_EXPECTED / 15
    superpixels_prob: float = 0.5 * _SOMEOF_EXPECTED / 15
    superpixels_segments: Tuple[int, int] = (20, 200)
    superpixels_replace: Tuple[float, float] = (0.0, 1.0)
    blur_sigma: Tuple[float, float] = (0.0, 3.0)
    avg_blur_k: Tuple[int, int] = (2, 7)
    median_blur_k: Tuple[int, int] = (3, 11)
    sharpen_alpha: Tuple[float, float] = (0.0, 1.0)
    sharpen_lightness: Tuple[float, float] = (0.75, 1.5)
    emboss_alpha: Tuple[float, float] = (0.0, 1.0)
    emboss_strength: Tuple[float, float] = (0.0, 2.0)
    edge_alpha: Tuple[float, float] = (0.5, 1.0)
    noise_scale: Tuple[float, float] = (0.0, 0.05 * 255)
    dropout: Tuple[float, float] = (0.01, 0.1)
    coarse_dropout: Tuple[float, float] = (0.03, 0.15)
    coarse_size: Tuple[float, float] = (0.02, 0.05)
    invert_prob: float = 0.05  # per-channel invert prob WHEN the entry fires
    add: Tuple[float, float] = (-10.0, 10.0)
    hue_sat: Tuple[float, float] = (-20.0, 20.0)
    multiply: Tuple[float, float] = (0.5, 1.5)
    grayscale_alpha: Tuple[float, float] = (0.0, 1.0)
    elastic_prob: float = 0.5 * _SOMEOF_EXPECTED / 15
    elastic_alpha: Tuple[float, float] = (0.5, 3.5)
    piecewise_prob: float = 0.5 * _SOMEOF_EXPECTED / 15
    piecewise_scale: Tuple[float, float] = (0.01, 0.05)
    perspective_prob: float = 0.5 * _SOMEOF_EXPECTED / 15
    perspective_scale: Tuple[float, float] = (0.01, 0.1)


def heavy() -> AugmentConfig:
    """The reference's ``augmentation`` pipeline (flips + geometry + a
    15-entry SomeOf, ``data_generator_mscmrseg.py:20-84``)."""
    return AugmentConfig()


def medium() -> AugmentConfig:
    """``augmentation2``: crop&pad + a 12-entry SomeOf — no flips, no
    affine, no elastic/piecewise/perspective
    (``data_generator_mscmrseg.py:86-132``)."""
    g = _SOMEOF_EXPECTED / 12
    return AugmentConfig(
        fliplr=0.0,
        flipud=0.0,
        affine_prob=0.0,
        intensity_gate=g,
        superpixels_prob=0.5 * g,
        elastic_prob=0.0,
        piecewise_prob=0.0,
        perspective_prob=0.0,
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
        intensity_gate=0.0,
        superpixels_prob=0.0,
        elastic_prob=0.0,
        piecewise_prob=0.0,
        perspective_prob=0.0,
        invert_prob=0.0,
    )


def _u(key, lo_hi, shape=()):
    return jax.random.uniform(key, shape, minval=lo_hi[0], maxval=lo_hi[1])


# --------------------------------------------------------------------- #
# geometry: ONE projective warp per image (affine o perspective), plus an
# additive displacement field (elastic + piecewise-affine)
def _affine_inverse(key, cfg: AugmentConfig, h: int, w: int):
    """3x3 homogeneous inverse map (output (y,x,1) -> input) for
    flips-excluded geometry: crop&pad + affine (iaa ranges)."""
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
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    inv = jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]]) / det
    c = jnp.array([(h - 1) / 2.0, (w - 1) / 2.0])
    shift = c + jnp.array([ty, tx])
    # input = inv @ (out - shift) + c, as one homogeneous matrix
    trans = c - inv @ shift
    return jnp.array(
        [
            [inv[0, 0], inv[0, 1], trans[0]],
            [inv[1, 0], inv[1, 1], trans[1]],
            [0.0, 0.0, 1.0],
        ]
    )


def _perspective_inverse(key, cfg: AugmentConfig, h: int, w: int):
    """iaa.PerspectiveTransform: corners jittered by N(0, s)·size
    (s ~ U(scale)); the inverse map is the homography sending output corners
    to the jittered input corners (DLT on 4 points)."""
    ks = jax.random.split(key, 3)
    gate = jax.random.uniform(ks[0]) < cfg.perspective_prob
    s = _u(ks[1], cfg.perspective_scale)
    jit = jax.random.normal(ks[2], (4, 2)) * s * jnp.array([h, w], jnp.float32)
    jit = jnp.where(gate, jit, jnp.zeros((4, 2)))
    dst = jnp.array(
        [[0.0, 0.0], [0.0, w - 1.0], [h - 1.0, 0.0], [h - 1.0, w - 1.0]]
    )
    src = dst + jit
    # DLT rows for (y_out, x_out) -> (y_in, x_in)
    rows = []
    rhs = []
    for i in range(4):
        y, x = dst[i, 0], dst[i, 1]
        u, v = src[i, 0], src[i, 1]
        rows.append(jnp.stack([y, x, 1.0, 0.0 * y, 0.0 * y, 0.0 * y, -u * y, -u * x]))
        rows.append(jnp.stack([0.0 * y, 0.0 * y, 0.0 * y, y, x, 1.0, -v * y, -v * x]))
        rhs += [u, v]
    A = jnp.stack(rows)
    b = jnp.stack(rhs)
    hvec = jnp.linalg.solve(A + 1e-8 * jnp.eye(8), b)
    return jnp.concatenate([hvec, jnp.ones(1)]).reshape(3, 3)


def _warp_one(img, M, disp, order: int, cval):
    """Inverse projective warp of (H, W, C) + additive displacement field.

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
    dnm = M[2, 0] * yy + M[2, 1] * xx + M[2, 2]
    dnm = jnp.where(jnp.abs(dnm) < 1e-8, 1e-8, dnm)
    iy = (M[0, 0] * yy + M[0, 1] * xx + M[0, 2]) / dnm + disp[..., 0]
    ix = (M[1, 0] * yy + M[1, 1] * xx + M[1, 2]) / dnm + disp[..., 1]

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


# --------------------------------------------------------------------- #
# intensity family
def _gaussian_blur(img, sigma, max_radius: int = 5):
    """Separable gaussian with traced sigma (static kernel width, weights
    masked beyond the effective radius)."""
    r = max_radius
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (x / sig) ** 2)
    k = k / jnp.sum(k)
    out = img
    pad = [(r, r), (0, 0), (0, 0)]
    o = jnp.pad(out, pad, mode="edge")
    out = sum(k[i] * o[i : i + img.shape[0]] for i in range(2 * r + 1))
    pad = [(0, 0), (r, r), (0, 0)]
    o = jnp.pad(out, pad, mode="edge")
    out = sum(k[i] * o[:, i : i + img.shape[1]] for i in range(2 * r + 1))
    return out


def _avg_blur(img, k):
    """Separable box blur with traced width k in [2, 7] (iaa.AverageBlur).
    Even widths use half-weighted edge taps (the average of the two centred
    odd boxes — cv2's half-pixel anchor in expectation)."""
    r = 3  # max radius for k=7
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    kf = k.astype(jnp.float32)
    half = (kf - 1.0) / 2.0
    # weight 1 inside the window, 0.5 on the fractional edge taps
    wgt = jnp.clip(half - jnp.abs(offs) + 1.0, 0.0, 1.0)
    wgt = wgt / jnp.sum(wgt)
    o = jnp.pad(img, [(r, r), (0, 0), (0, 0)], mode="edge")
    out = sum(wgt[i] * o[i : i + img.shape[0]] for i in range(2 * r + 1))
    o = jnp.pad(out, [(0, 0), (r, r), (0, 0)], mode="edge")
    return sum(wgt[i] * o[:, i : i + img.shape[1]] for i in range(2 * r + 1))


def _median_blur(img, k):
    """True median filter with traced ODD k in [3, 11] (iaa.MedianBlur).

    One 121-wide window sort serves every k: taps outside the k-window are
    replaced by +/-inf in symmetric pairs ((dy,dx) vs (-dy,-dx)), which
    leaves the median of the 121-element multiset equal to the median of
    the valid k^2 elements (121 - k^2 is always even), so the answer is
    always the fixed rank-60 element.
    """
    h, w, c = img.shape
    r = 5
    half = (k.astype(jnp.float32) - 1.0) / 2.0
    x = jnp.pad(img, [(r, r), (r, r), (0, 0)], mode="edge")
    wins = []
    fills = []
    big = jnp.float32(1e9)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            wins.append(x[r + dy : r + dy + h, r + dx : r + dx + w])
            valid = (jnp.abs(dy) <= half) & (jnp.abs(dx) <= half)
            pos = (dy > 0) | ((dy == 0) & (dx > 0))  # sign of the inf fill
            fills.append(jnp.where(valid, jnp.float32(0), jnp.where(pos, big, -big)))
    wins = jnp.stack(wins, axis=-1)  # (h, w, c, 121)
    fill = jnp.stack(fills)  # (121,) of {0, +-inf}
    vals = jnp.where(fill == 0, wins, fill)
    return jnp.sort(vals, axis=-1)[..., 60]


def _conv3(img, kernel):
    """3x3 depthwise convolution with reflect padding (cv2 filter2D)."""
    h, w, _ = img.shape
    x = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    out = 0.0
    for dy in range(3):
        for dx in range(3):
            out = out + kernel[dy, dx] * x[dy : dy + h, dx : dx + w]
    return out


def _sharpen(img, alpha, lightness):
    """iaa.Sharpen: blend identity with [[-1,-1,-1],[-1,8+l,-1],[-1,-1,-1]]."""
    eff = jnp.array(
        [[-1.0, -1.0, -1.0], [-1.0, 8.0, -1.0], [-1.0, -1.0, -1.0]]
    ) + jnp.array([[0, 0, 0], [0, 1.0, 0], [0, 0, 0]]) * lightness
    ident = jnp.zeros((3, 3)).at[1, 1].set(1.0)
    return _conv3(img, (1.0 - alpha) * ident + alpha * eff)


def _emboss(img, alpha, strength):
    """iaa.Emboss: blend identity with the diagonal relief kernel."""
    s = strength
    eff = jnp.array([[-1.0 - s, -s, 0.0], [-s, 1.0, s], [0.0, s, 1.0 + s]])
    ident = jnp.zeros((3, 3)).at[1, 1].set(1.0)
    return _conv3(img, (1.0 - alpha) * ident + alpha * eff)


def _simplex_edge(key, img, cfg: AugmentConfig):
    """iaa.SimplexNoiseAlpha(OneOf(EdgeDetect, DirectedEdgeDetect)).

    Edge response: laplacian kernel blended by alpha ~ U(0.5, 1) (the
    directed variant is approximated by the same isotropic kernel). The
    simplex alpha mask is approximated by bilinear value noise whose
    granularity is sampled among ~{4, 8, 16}px cells (imgaug size_px_max
    (2, 16))."""
    h, w, _ = img.shape
    ks = jax.random.split(key, 4)
    alpha = _u(ks[0], cfg.edge_alpha)
    lap = jnp.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    ident = jnp.zeros((3, 3)).at[1, 1].set(1.0)
    edged = jnp.clip(_conv3(img, (1.0 - alpha) * ident + alpha * lap), 0.0, 255.0)
    masks = []
    for cell in (4, 8, 16):
        gh, gw = max(2, h // cell), max(2, w // cell)
        g = jax.random.uniform(jax.random.fold_in(ks[1], cell), (gh, gw, 1))
        masks.append(jax.image.resize(g, (h, w, 1), "linear"))
    choice = jax.random.randint(ks[2], (), 0, 3)
    mask = jnp.select([choice == 0, choice == 1], masks[:2], masks[2])
    return mask * edged + (1.0 - mask) * img


def _rgb_to_hsv(img):
    """cv2 8-bit convention: H in [0, 180), S/V in [0, 255]."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = v - mn
    safe = jnp.where(d > 0, d, 1.0)
    hr = 30.0 * (g - b) / safe
    hg = 60.0 + 30.0 * (b - r) / safe
    hb = 120.0 + 30.0 * (r - g) / safe
    hue = jnp.where(v == r, hr, jnp.where(v == g, hg, hb))
    hue = jnp.where(d > 0, jnp.mod(hue, 180.0), 0.0)
    sat = jnp.where(v > 0, 255.0 * d / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([hue, sat, v], axis=-1)


def _hsv_to_rgb(hsv):
    hue, sat, v = hsv[..., 0], hsv[..., 1] / 255.0, hsv[..., 2]
    hp = (jnp.mod(hue, 180.0)) / 30.0  # sector in [0, 6)
    i = jnp.floor(hp)
    f = hp - i
    p = v * (1.0 - sat)
    q = v * (1.0 - sat * f)
    t = v * (1.0 - sat * (1.0 - f))
    i = i.astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def _add_hue_sat(key, img, rng_range):
    """iaa.AddToHueAndSaturation: one sampled value added to H (wrapping)
    and S (clipped) in cv2 HSV space."""
    val = _u(key, rng_range)
    hsv = _rgb_to_hsv(img)
    hue = jnp.mod(hsv[..., 0] + val, 180.0)
    sat = jnp.clip(hsv[..., 1] + val, 0.0, 255.0)
    return jnp.clip(_hsv_to_rgb(jnp.stack([hue, sat, hsv[..., 2]], -1)), 0.0, 255.0)


_SP_K = 200  # static center count (n_segments upper bound)


def _superpixels(key, img, cfg: AugmentConfig):
    """iaa.Superpixels(p_replace=(0,1), n_segments=(20,200)) via a k-means
    SLIC approximation at <=128px internal resolution (imgaug's own
    ``max_size=128`` downscale), compactness m=10 on the standard
    dc^2 + (m/S)^2 ds^2 metric; each segment's pixels are replaced by the
    segment mean with per-segment probability p ~ U(0,1)."""
    h, w, c = img.shape
    factor = max(1, -(-max(h, w) // 128))
    hs, ws = h // factor, w // factor
    small = jax.image.resize(img, (hs, ws, c), "linear") if factor > 1 else img
    ks = jax.random.split(key, 6)
    n = jax.random.randint(ks[0], (), cfg.superpixels_segments[0], cfg.superpixels_segments[1] + 1)
    active = jnp.arange(_SP_K) < n
    ys = jax.random.randint(ks[1], (_SP_K,), 0, hs)
    xs = jax.random.randint(ks[2], (_SP_K,), 0, ws)

    spatial_w = 10.0 / jnp.sqrt(hs * ws / n.astype(jnp.float32))  # m / S
    yy = jax.lax.broadcasted_iota(jnp.float32, (hs, ws), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (hs, ws), 1)
    feats = jnp.concatenate(
        [
            small.reshape(hs * ws, c) / 255.0,
            (yy.reshape(-1, 1) * spatial_w),
            (xx.reshape(-1, 1) * spatial_w),
        ],
        axis=1,
    )  # (P, c+2)
    centers = jnp.concatenate(
        [
            small[ys, xs] / 255.0,
            ys[:, None].astype(jnp.float32) * spatial_w,
            xs[:, None].astype(jnp.float32) * spatial_w,
        ],
        axis=1,
    )  # (K, c+2)

    def assign(centers):
        d = (
            jnp.sum(feats * feats, 1, keepdims=True)
            - 2.0 * feats @ centers.T
            + jnp.sum(centers * centers, 1)[None]
        )
        d = jnp.where(active[None], d, jnp.float32(1e9))
        return jnp.argmin(d, axis=1)

    seg = assign(centers)
    for _ in range(2):  # k-means refinement
        sums = jax.ops.segment_sum(
            jnp.concatenate([feats, jnp.ones((feats.shape[0], 1))], 1), seg, _SP_K
        )
        cnt = jnp.maximum(sums[:, -1:], 1.0)
        centers = sums[:, :-1] / cnt
        seg = assign(centers)

    mean_col = (
        jax.ops.segment_sum(
            jnp.concatenate([small.reshape(-1, c), jnp.ones((hs * ws, 1))], 1), seg, _SP_K
        )
    )
    mean_col = mean_col[:, :c] / jnp.maximum(mean_col[:, -1:], 1.0)  # (K, C)

    p_rep = _u(ks[3], cfg.superpixels_replace)
    rep = jax.random.uniform(ks[4], (_SP_K,)) < p_rep
    seg_img = seg.reshape(hs, ws)
    if factor > 1:
        seg_img = jax.image.resize(
            seg_img[..., None].astype(jnp.float32), (h, w, 1), "nearest"
        )[..., 0].astype(jnp.int32)
    return jnp.where(rep[seg_img][..., None], mean_col[seg_img], img)


def _intensity_ops(key, img, cfg: AugmentConfig):
    """The SomeOf((0,5)) family on one (H, W, C) float image in [0, 255].

    Entries fire independently with p = intensity_gate (expectation matches
    the reference's SomeOf draw); gates with a STATIC probability of 0 are
    skipped at trace time so light/medium pipelines never pay for ops they
    cannot apply.
    """
    h, w, c = img.shape
    ks = jax.random.split(key, 40)
    g = cfg.intensity_gate

    def gated(i, fn, img, prob=None):
        p = g if prob is None else prob
        if p <= 0.0:  # static short-circuit
            return img
        return jnp.where(jax.random.uniform(ks[i]) < p, fn(img), img)

    # 1. superpixels (Sometimes-wrapped)
    img = gated(0, lambda im: _superpixels(ks[20], im, cfg), img, prob=cfg.superpixels_prob)

    # 2. blur OneOf {gaussian, average, median}
    def blur_family(im):
        gsn = _gaussian_blur(im, _u(ks[21], cfg.blur_sigma))
        avg = _avg_blur(im, jax.random.randint(ks[22], (), cfg.avg_blur_k[0], cfg.avg_blur_k[1] + 1))
        # odd k in [median_blur_k]: k = 2r + 1 with r ~ U{k0//2, ..., k1//2}
        med = _median_blur(
            im,
            2 * jax.random.randint(ks[23], (), cfg.median_blur_k[0] // 2, cfg.median_blur_k[1] // 2 + 1) + 1,
        )
        choice = jax.random.randint(ks[24], (), 0, 3)
        return jnp.select([choice == 0, choice == 1], [gsn, avg], med)

    img = gated(1, blur_family, img)
    # 3. sharpen (alpha, lightness)
    img = gated(
        2,
        lambda im: _sharpen(im, _u(ks[25], cfg.sharpen_alpha), _u(ks[26], cfg.sharpen_lightness)),
        img,
    )
    # 4. emboss
    img = gated(
        3,
        lambda im: _emboss(im, _u(ks[27], cfg.emboss_alpha), _u(ks[28], cfg.emboss_strength)),
        img,
    )
    # 5. simplex-noise edge blend
    img = gated(4, lambda im: _simplex_edge(ks[29], im, cfg), img)

    # 6. additive gaussian noise (per-channel half the time)
    def noise(im):
        scale = _u(ks[12], cfg.noise_scale)
        per_c = jax.random.uniform(ks[13]) < 0.5
        n_pc = jax.random.normal(ks[14], im.shape) * scale
        n_sh = jax.random.normal(ks[14], im.shape[:2] + (1,)) * scale
        return im + jnp.where(per_c, n_pc, jnp.broadcast_to(n_sh, im.shape))

    img = gated(5, noise, img)

    # 7. dropout OneOf {pixel (per_channel 0.5), coarse (per_channel 0.2)}
    def dropout_family(im):
        p = _u(ks[15], cfg.dropout)
        pc1 = jax.random.uniform(ks[30]) < 0.5
        keep_pc = (jax.random.uniform(ks[16], im.shape) >= p).astype(im.dtype)
        keep_sh = (jax.random.uniform(ks[16], im.shape[:2] + (1,)) >= p).astype(im.dtype)
        fine = im * jnp.where(pc1, keep_pc, jnp.broadcast_to(keep_sh, im.shape))

        p2 = _u(ks[17], cfg.coarse_dropout)
        gh = max(2, int(0.03 * h))
        gw = max(2, int(0.03 * w))
        pc2 = jax.random.uniform(ks[31]) < 0.2
        kc_pc = (jax.random.uniform(ks[18], (gh, gw, c)) >= p2).astype(im.dtype)
        kc_sh = (jax.random.uniform(ks[18], (gh, gw, 1)) >= p2).astype(im.dtype)
        kmask = jnp.where(pc2, kc_pc, jnp.broadcast_to(kc_sh, (gh, gw, c)))
        coarse = im * jax.image.resize(kmask, (h, w, c), "nearest")
        return jnp.where(jax.random.uniform(ks[32]) < 0.5, fine, coarse)

    img = gated(6, dropout_family, img)

    # 8. invert (per-channel Bernoulli(invert_prob) when the entry fires)
    def invert(im):
        inv_ch = jax.random.uniform(ks[33], (c,)) < cfg.invert_prob
        return jnp.where(inv_ch, 255.0 - im, im)

    img = gated(7, invert, img, prob=(g if cfg.invert_prob > 0 else 0.0))

    # 9. add (per_channel 0.5)
    def add_op(im):
        pc = jax.random.uniform(ks[34]) < 0.5
        v_pc = _u(ks[19], cfg.add, (c,))
        v_sh = jnp.broadcast_to(_u(ks[19], cfg.add), (c,))
        return im + jnp.where(pc, v_pc, v_sh)

    img = gated(8, add_op, img)
    # 10. hue / saturation
    if c == 3:
        img = gated(9, lambda im: _add_hue_sat(ks[35], im, cfg.hue_sat), img)
    # 11. multiply (per_channel 0.5)
    def mul_op(im):
        pc = jax.random.uniform(ks[36]) < 0.5
        v_pc = _u(ks[9], cfg.multiply, (c,))
        v_sh = jnp.broadcast_to(_u(ks[9], cfg.multiply), (c,))
        return im * jnp.where(pc, v_pc, v_sh)

    img = gated(10, mul_op, img)
    # 12. grayscale mix
    img = gated(
        11,
        lambda im: im + _u(ks[37], cfg.grayscale_alpha) * (jnp.mean(im, -1, keepdims=True) - im),
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
        ks = jax.random.split(key, 10)
        img = img.astype(jnp.float32)

        flip_lr = jax.random.uniform(ks[0]) < cfg.fliplr
        flip_ud = jax.random.uniform(ks[1]) < cfg.flipud
        img = jnp.where(flip_lr, img[:, ::-1], img)
        img = jnp.where(flip_ud, img[::-1], img)
        if mask is not None:
            mask = jnp.where(flip_lr, mask[:, ::-1], mask)
            mask = jnp.where(flip_ud, mask[::-1], mask)

        M = _affine_inverse(ks[2], cfg, h, w)
        if cfg.perspective_prob > 0:
            # inverse maps compose right-to-left: perspective then affine
            M = M @ _perspective_inverse(ks[7], cfg, h, w)
        disp = jnp.zeros((h, w, 2), jnp.float32)
        if elastic_field and cfg.elastic_prob > 0:
            on = jax.random.uniform(ks[3]) < cfg.elastic_prob
            alpha = _u(ks[4], cfg.elastic_alpha)
            field = jax.random.uniform(ks[5], (h, w, 2), minval=-1.0, maxval=1.0)
            disp = disp + jnp.where(on, field * alpha, jnp.zeros(()))
        if cfg.piecewise_prob > 0:
            # iaa.PiecewiseAffine(scale=(0.01,0.05)): a coarse control grid of
            # N(0, scale*size) offsets, bilinearly upsampled (the local-affine
            # patchwork is approximated by its induced smooth field)
            on = jax.random.uniform(ks[8]) < cfg.piecewise_prob
            s = _u(ks[9], cfg.piecewise_scale)
            grid = jax.random.normal(jax.random.fold_in(key, 11), (4, 4, 2))
            coarse = jax.image.resize(grid, (h, w, 2), "linear")
            coarse = coarse * s * jnp.array([h, w], jnp.float32)
            disp = disp + jnp.where(on, coarse, jnp.zeros(()))
        cval = jax.random.uniform(ks[6], minval=0.0, maxval=255.0)
        img = _warp_one(img, M, disp, order=1, cval=cval)
        if mask is not None:
            m = _warp_one(mask[..., None].astype(jnp.float32), M, disp, order=0, cval=0.0)
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
