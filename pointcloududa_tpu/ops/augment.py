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

Exact-sampling parity (r3): ``SomeOf((0, 5))`` draws k ~ U{0..5} and
selects exactly k of the n entries WITHOUT replacement (a rank draw), like
imgaug — not independent Bernoullis; image borders sample among ALL five
scikit-image modes (constant/edge/symmetric/reflect/wrap) with cval ~
U(0, 255), per ``mode=ia.ALL``/``pad_mode=ia.ALL`` — heavy/aug2 only: the
light pipelines pin ``mode='constant'`` exactly like the reference
(``border_mode_all=False``); the affine image
resample order is sampled from {nearest, bilinear} (``order=[0, 1]``);
crop&pad percents are sampled PER SIDE (``sample_independently=True``);
the affine translate ranges are per-axis (``translate_x``); the
simplex alpha mask is gradient (Perlin) noise at imgaug's sampled
``size_px_max (2, 16)`` granularity with linear/nearest upscale,
1-3 max-aggregated octave draws and sigmoid shaping; coarse-dropout grid
granularity is sampled per-application from ``size_percent (0.02, 0.05)``.
``random_order=True`` (both the outer Sequential and the SomeOf) follows
imgaug's PER-BATCH semantics exactly: the child order is drawn once per
batch (imgaug's meta augmenters iterate children over the whole batch in
one permutation), so a (5,) outer order and a (12,) SomeOf order are drawn
per batch; the four linear outer children compose into the warp matrix in
the drawn order (exact), and the intensity entries apply in the drawn
12!-order via ``lax.scan`` over positions with an unbatched ``lax.switch``
(one entry kernel per position — fixed-chain cost).

Remaining distribution-level deviations, each minor and documented inline:
all geometry still composes into ONE resample (higher fidelity than
imgaug's repeated resampling, but per-op border/order settings merge into
the composite's) — hence the flips hold their drawn slot inside the warp
rather than interleaving with intensity entries, the three SomeOf geometry
members (elastic/piecewise/perspective) ride at the warp boundary instead
of their drawn slot among the intensity entries, and when the SomeOf child
lands strictly between the statically-LIVE warp children (crop&pad/affine
with nonzero prob — dead children don't count, so aug2's 2-child order is
exact) the intensity block's side is resolved by a fair coin (the marginal
order vs either warp child stays exact); the Perlin basis stands in for
OpenSimplex and the sigmoid
shaping constants are best-effort (imgaug is not installable in this
environment — see TODO.md); directed edge detect follows imgaug's
direction-weighted kernel construction but is unverifiable against imgaug
here (same blocker); superpixels run at <=128px internal resolution exactly like
imgaug's ``max_size=128`` but with a k-means SLIC approximation.

Masks are warped with nearest-neighbour sampling, constant-0 borders
(imgaug hardcodes ``mode="constant", cval=0`` for segmentation maps even
when the image samples ``ia.ALL``), and never receive intensity ops — same
contract as ``seq(images=..., segmentation_maps=...)``.
"""

from __future__ import annotations

import dataclasses
import functools

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
    # image border handling for the crop&pad/affine resample: True = sample
    # among all five skimage modes (``mode=ia.ALL``/``pad_mode=ia.ALL``,
    # heavy/aug2); False = constant only (the light pipelines' Affine pins
    # ``mode='constant'``, data_generator_mscmrseg.py:153 / mmwhs.py:101).
    # Masks always get constant-0 borders, matching imgaug's segmap rule.
    border_mode_all: bool = True
    # exact iaa.SomeOf((0, 5)) without-replacement draw over the first
    # ``someof_n`` entries (15 heavy, 12 medium — the medium pipeline's
    # SomeOf list is exactly the first 12 entries, reference
    # data_generator_mscmrseg.py:95-129). 0 = independent per-entry gates
    # (the legacy/test mode using the *_prob / intensity_gate fields below).
    someof_n: int = 15
    someof_count: Tuple[int, int] = (0, 5)
    sometimes_p: float = 0.5  # the Sometimes(0.5) wrap on entries {0,12,13,14}
    scale: Tuple[float, float] = (0.8, 1.2)
    translate: Tuple[float, float] = (-0.2, 0.2)
    # per-axis x override for iaa.Affine translate_percent={"x": ..., "y":
    # translate}; None = same range as `translate` (the heavy pipeline is
    # x/y-symmetric, the light one is not)
    translate_x: "Tuple[float, float] | None" = None
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

    def __post_init__(self):
        # _median_blur hard-codes its stencil window to r=5 (taps beyond
        # |d| > 5 never enter the count) and runs its greedy bit descent in
        # bf16 lanes, which is bit-exact only while every intermediate is an
        # integer <= 256: rank=(k^2+1)//2 and the masked tap count k^2 both
        # stay <= 121 for k <= 11. A wider k would silently drop taps AND
        # round the rank, so reject it here instead of inside the jit.
        lo, hi = self.median_blur_k
        if not (1 <= lo <= hi <= 11):
            raise ValueError(
                f"median_blur_k={self.median_blur_k}: _median_blur supports "
                "odd k in [1, 11] only (r=5 stencil window; bf16-exact bit "
                "descent needs k*k+1 <= 256 -> k <= 11)"
            )


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
        someof_n=12,
        intensity_gate=g,
        superpixels_prob=0.5 * g,
        elastic_prob=0.0,
        piecewise_prob=0.0,
        perspective_prob=0.0,
    )


def light() -> AugmentConfig:
    """``light_aug``: flips + gentle affine, no intensity
    (``data_generator_mmwhs.py:87-122`` — the only light pipeline the
    reference ever CALLS, from its MM-WHS generator at ``:253``; the
    similar ``simple_aug`` in ``data_generator_mscmrseg.py:134-167`` with
    gates 0.3/0.3/0.45 is dead code). Gates 0.2/0.2/0.3; the affine
    translate range is per-axis asymmetric (x (-0.1, 0.05), y (-0.1, 0.1))."""
    return AugmentConfig(
        fliplr=0.2,
        flipud=0.2,
        croppad_prob=0.0,
        affine_prob=0.3,
        translate=(-0.1, 0.1),
        translate_x=(-0.1, 0.05),
        rotate=(-10.0, 10.0),
        shear=(-12.0, 12.0),
        someof_n=0,
        intensity_gate=0.0,
        superpixels_prob=0.0,
        elastic_prob=0.0,
        piecewise_prob=0.0,
        perspective_prob=0.0,
        invert_prob=0.0,
        border_mode_all=False,  # both light Affines pin mode='constant'
    )


def someof_active(key, cfg: AugmentConfig):
    """Exact ``iaa.SomeOf((0, 5), ..., random_order=True)`` entry draw.

    k ~ U{count}, then exactly k of the ``someof_n`` entries selected
    WITHOUT replacement (uniform rank draw); the Sometimes(0.5)-wrapped
    entries (0 superpixels, 12 elastic, 13 piecewise, 14 perspective) are
    additionally thinned by an independent coin, exactly as imgaug resolves
    a selected ``Sometimes`` child. Returns a (15,) bool vector (entries
    beyond ``someof_n`` are False). None when ``someof_n == 0``.
    """
    if cfg.someof_n <= 0:
        return None
    ka, kb, kc = jax.random.split(key, 3)
    k = jax.random.randint(ka, (), cfg.someof_count[0], cfg.someof_count[1] + 1)
    scores = jax.random.uniform(kb, (cfg.someof_n,))
    ranks = jnp.argsort(jnp.argsort(scores))
    active = jnp.zeros((15,), bool).at[: cfg.someof_n].set(ranks < k)
    wrapped = jnp.array([0, 12, 13, 14])
    coin = jax.random.uniform(kc, (4,)) < cfg.sometimes_p
    return active.at[wrapped].set(active[wrapped] & coin)


def _u(key, lo_hi, shape=()):
    return jax.random.uniform(key, shape, minval=lo_hi[0], maxval=lo_hi[1])


# --------------------------------------------------------------------- #
# geometry: ONE projective warp per image — the four LINEAR outer children
# (flips, crop&pad, affine) as per-sample inverse matrices composed in the
# per-batch drawn order, times perspective, plus an additive displacement
# field (elastic + piecewise-affine)
def _child_matrices(key, cfg: AugmentConfig, h: int, w: int):
    """Per-sample inverse 3x3 maps (output (y,x,1) -> input) for the four
    linear outer-Sequential children, indexed [Fliplr, Flipud, CropAndPad,
    Affine]; identity when a child does not fire. The caller composes them
    in the per-batch drawn application order (``random_order=True``) —
    exact, since all four are affine maps.

    CropAndPad samples its percent PER SIDE (top, bottom, left, right),
    matching ``iaa.CropAndPad(percent=(lo, hi))`` with the default
    ``sample_independently=True``; with ``keep_size=True`` the forward map
    per axis is out = (in + 0.5 + p_lo*n) / (1 + p_lo + p_hi) - 0.5
    (pixel-center resize convention).

    Returns ``(mats (4, 3, 3), any_warp, snap)``: ``any_warp`` = crop&pad
    or affine fired (border mode/cval sampling applies only then — flips
    vacate nothing); ``snap`` = the iaa.Affine ``order=[0, 1]`` draw
    (nearest-neighbour image resample half the time the affine fires).
    """
    ks = jax.random.split(key, 11)
    eye = jnp.eye(3)
    gate_lr = jax.random.uniform(ks[0]) < cfg.fliplr
    gate_ud = jax.random.uniform(ks[1]) < cfg.flipud
    m_lr = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, w - 1.0], [0.0, 0.0, 1.0]])
    m_ud = jnp.array([[-1.0, 0.0, h - 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    m_lr = jnp.where(gate_lr, m_lr, eye)
    m_ud = jnp.where(gate_ud, m_ud, eye)

    gate_cp = jax.random.uniform(ks[2]) < cfg.croppad_prob
    p4 = jnp.where(gate_cp, _u(ks[3], cfg.croppad, (4,)), jnp.zeros(4))  # t, b, l, r
    sy_cp = 1.0 + p4[0] + p4[1]
    sx_cp = 1.0 + p4[2] + p4[3]
    m_cp = jnp.array(
        [
            [sy_cp, 0.0, 0.5 * (sy_cp - 1.0) - p4[0] * h],
            [0.0, sx_cp, 0.5 * (sx_cp - 1.0) - p4[2] * w],
            [0.0, 0.0, 1.0],
        ]
    )

    gate_aff = jax.random.uniform(ks[4]) < cfg.affine_prob
    sy = jnp.where(gate_aff, _u(ks[5], cfg.scale), 1.0)
    sx = jnp.where(gate_aff, _u(ks[6], cfg.scale), 1.0)
    theta = jnp.deg2rad(jnp.where(gate_aff, _u(ks[7], cfg.rotate), 0.0))
    shear = jnp.deg2rad(jnp.where(gate_aff, _u(ks[8], cfg.shear), 0.0))
    tx_range = cfg.translate_x if cfg.translate_x is not None else cfg.translate
    u2 = jax.random.uniform(ks[9], (2,))
    t_raw = jnp.stack(
        [
            cfg.translate[0] + u2[0] * (cfg.translate[1] - cfg.translate[0]),
            tx_range[0] + u2[1] * (tx_range[1] - tx_range[0]),
        ]
    )
    t = jnp.where(gate_aff, t_raw, jnp.zeros(2))
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
    m_aff = jnp.array(
        [
            [inv[0, 0], inv[0, 1], trans[0]],
            [inv[1, 0], inv[1, 1], trans[1]],
            [0.0, 0.0, 1.0],
        ]
    )
    snap = gate_aff & (jax.random.uniform(ks[10]) < 0.5)
    return jnp.stack([m_lr, m_ud, m_cp, m_aff]), gate_aff | gate_cp, snap


def _perspective_inverse(key, cfg: AugmentConfig, h: int, w: int, gate=None):
    """iaa.PerspectiveTransform: corners jittered by N(0, s)·size
    (s ~ U(scale)); the inverse map is the homography sending output corners
    to the jittered input corners (DLT on 4 points). ``gate``: traced bool
    from the SomeOf draw; None = legacy self-sampled Bernoulli."""
    ks = jax.random.split(key, 3)
    if gate is None:
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


def _border_fold(i, n, mode):
    """Map an out-of-range integer index per skimage/np.pad border mode.

    mode (traced): 0 constant (clip; caller overrides with the fill value),
    1 edge, 2 symmetric (abccba), 3 reflect (abcba), 4 wrap.
    """
    edge = jnp.clip(i, 0, n - 1)
    m2 = jnp.mod(i, 2 * n)
    symmetric = jnp.where(m2 < n, m2, 2 * n - 1 - m2)
    period = max(2 * n - 2, 1)
    m3 = jnp.mod(i, period)
    reflect = jnp.where(m3 < n, m3, 2 * n - 2 - m3)
    wrap = jnp.mod(i, n)
    return jnp.select(
        [mode == 1, mode == 2, mode == 3, mode == 4],
        [edge, symmetric, reflect, wrap],
        edge,
    )


def _fold_coord(t, n: int, mode):
    """Continuous border fold of a float sample coordinate ``t`` into the
    1-ring-padded range [-1, n] per traced ``mode`` (0 constant / 1 edge /
    2 symmetric / 3 reflect / 4 wrap).

    The np.pad extensions for edge/symmetric/reflect/wrap are periodic or
    reflective, so interpolating the extension at ``t`` equals interpolating
    the base samples (plus a 1-ring pad) at the folded coordinate — the same
    identity scipy's ``map_coordinates`` uses. Bit-equivalent to folding each
    integer tap with :func:`_border_fold` and keeping the unfolded weights
    (golden-tested against a numpy big-pad oracle), except half-integer
    rounding ties under reflection, which random warps hit with probability
    zero. Constant mode is the identity (the caller clips indices and fills
    out-of-range taps with cval).
    """
    edge = jnp.clip(t, 0.0, n - 1.0)
    psi = jnp.mod(t + 0.5, 2.0 * n)  # symmetric: even around -0.5, period 2n
    symmetric = jnp.minimum(psi, 2.0 * n - psi) - 0.5
    period = max(2 * n - 2, 1)  # reflect: even around 0, period 2n-2
    reflect = (n - 1.0) - jnp.abs(jnp.mod(t, period) - (n - 1.0))
    wrap = jnp.mod(t, n)
    return jnp.select([mode == 1, mode == 2, mode == 3, mode == 4],
                      [edge, symmetric, reflect, wrap], t)


def _warp_one(img, M, disp, order: int, cval, mode=None, snap=None, nn=None):
    """Inverse projective warp of (H, W, C) + additive displacement field.

    ONE row-gather serves every tap: the 1-ring mode-padded image is
    unrolled into a (H+1, W+1, 4C) tensor of 2x2 patches, coordinates are
    border-folded CONTINUOUSLY (:func:`_fold_coord` — same extension
    semantics as per-tap integer folding), and a single gather of
    (H*W) patch rows fetches all four bilinear taps at once. Gathers
    dominate warp cost on TPU (the previous 4-gathers-plus-separate-mask
    layout measured 23.2 + 6.6 ms/batch bs16 224^2 of the 49.6 ms heavy
    pipeline); patch construction is fused elementwise traffic.

    ``mode`` (traced int, default constant): border handling per
    ``ia.ALL`` — 0 constant (fill = ``cval``), 1 edge, 2 symmetric,
    3 reflect, 4 wrap. ``snap`` (traced bool): snap the sample coordinates
    to integers (round-half-down) before the bilinear fetch — the exact
    order-0 result through the order-1 path at zero extra cost
    (iaa.Affine order=[0,1]). ``nn``: optional (H, W) plane sampled
    nearest (round-half-down) with constant-0 borders inside the SAME
    gather — the fused segmentation-mask path (imgaug hardcodes
    constant-0 for segmaps even when the image samples ia.ALL); when
    given, returns ``(img_out, nn_out)``.
    """
    h, w, ch = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    dnm = M[2, 0] * yy + M[2, 1] * xx + M[2, 2]
    dnm = jnp.where(jnp.abs(dnm) < 1e-8, 1e-8, dnm)
    iy = (M[0, 0] * yy + M[0, 1] * xx + M[0, 2]) / dnm + disp[..., 0]
    ix = (M[1, 0] * yy + M[1, 1] * xx + M[1, 2]) / dnm + disp[..., 1]
    if snap is not None:
        iy = jnp.where(snap, jnp.ceil(iy - 0.5), iy)
        ix = jnp.where(snap, jnp.ceil(ix - 0.5), ix)

    mode_t = jnp.int32(0) if mode is None else mode
    planes = img if nn is None else jnp.concatenate([img, nn[..., None].astype(img.dtype)], -1)
    cp = planes.shape[-1]

    # 1-ring pad; ring values per traced mode (edge/symmetric replicate the
    # border, reflect takes the second row, wrap the opposite one; constant
    # shares edge — its out-of-range taps are overwritten by the fill)
    def ring(a, axis):
        row = lambda k: jax.lax.index_in_dim(a, k, axis=axis, keepdims=True)
        n = a.shape[axis]
        lo = jnp.where(mode_t == 3, row(1), jnp.where(mode_t == 4, row(n - 1), row(0)))
        hi = jnp.where(mode_t == 3, row(n - 2), jnp.where(mode_t == 4, row(0), row(n - 1)))
        return jnp.concatenate([lo, a, hi], axis=axis)

    ap = ring(ring(planes, 0), 1)  # (h+2, w+2, cp); corners fold both axes
    patch = jnp.concatenate(
        [ap[:-1, :-1], ap[:-1, 1:], ap[1:, :-1], ap[1:, 1:]], axis=-1
    ).reshape((h + 1) * (w + 1), 4 * cp)

    fy = _fold_coord(iy, h, mode_t)
    fx = _fold_coord(ix, w, mode_t)
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = fy - y0
    wx = fx - x0
    y0i = jnp.clip(y0.astype(jnp.int32), -1, h - 1) + 1  # padded row in [0, h]
    x0i = jnp.clip(x0.astype(jnp.int32), -1, w - 1) + 1
    g = jnp.take(patch, (y0i * (w + 1) + x0i).reshape(-1), axis=0)
    g = g.reshape(h, w, 4, cp)  # taps ordered [(0,0), (0,1), (1,0), (1,1)]

    # per-tap constant fill from the RAW (unfolded) indices; the folded
    # modes never fill (their taps are always in range after the fold)
    ry = jnp.floor(iy).astype(jnp.int32)
    rx = jnp.floor(ix).astype(jnp.int32)
    ins = jnp.stack(
        [
            (ry + dy >= 0) & (ry + dy < h) & (rx + dx >= 0) & (rx + dx < w)
            for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1))
        ],
        axis=2,
    ) | (mode_t != 0)

    def nearest4(v, sy, sx):  # v: (h, w, 4, c) -> round-half-down tap
        top = jnp.where(sx[..., None], v[..., 1, :], v[..., 0, :])
        bot = jnp.where(sx[..., None], v[..., 3, :], v[..., 2, :])
        return jnp.where(sy[..., None], bot, top)

    if order == 0:
        # round-half-down matches scipy's order-0 map_coordinates; the
        # nearest tap always lies inside the bilinear 2x2 support
        nin = (
            (jnp.ceil(iy - 0.5) >= 0) & (jnp.ceil(iy - 0.5) < h)
            & (jnp.ceil(ix - 0.5) >= 0) & (jnp.ceil(ix - 0.5) < w)
        ) | (mode_t != 0)
        val = nearest4(g, wy > 0.5, wx > 0.5)
        fill = jnp.broadcast_to(jnp.asarray(cval, img.dtype), (cp,))
        return jnp.where(nin[..., None], val, fill)

    fill = jnp.broadcast_to(jnp.asarray(cval, img.dtype), (ch,))
    bt = jnp.where(ins[..., None], g[..., :ch], fill)
    wy_, wx_ = wy[..., None], wx[..., None]
    top = bt[..., 0, :] * (1 - wx_) + bt[..., 1, :] * wx_
    bot = bt[..., 2, :] * (1 - wx_) + bt[..., 3, :] * wx_
    out = top * (1 - wy_) + bot * wy_
    if nn is None:
        return out
    nin = (
        (jnp.ceil(iy - 0.5) >= 0) & (jnp.ceil(iy - 0.5) < h)
        & (jnp.ceil(ix - 0.5) >= 0) & (jnp.ceil(ix - 0.5) < w)
    )
    nn_out = nearest4(g[..., cp - 1 :], wy > 0.5, wx > 0.5)[..., 0]
    return out, jnp.where(nin, nn_out, jnp.zeros((), img.dtype))


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
    """uint8-exact median filter with traced ODD k in [3, 11] (iaa.MedianBlur).

    cv2/imgaug median-blur uint8 images (the reference pipeline is uint8 at
    every augmenter boundary, ``data_generator_mscmrseg.py:20-84``), so the
    exact semantics are an INTEGER median: realised as an 8-bit binary
    search on the value — eight fused 11x11 masked-count stencil passes —
    instead of a per-pixel 121-wide sort (which materialised an
    (H, W, C, 121) window tensor; measured 64.8 ms/batch bs16 224^2 on TPU
    vs the whole 47.6 ms train step). Mid-chain float inputs are rounded
    to the nearest integer first, matching imgaug's uint8 round-trip.

    Invariant: the answer is max{m in [0,255] : count(window < m) < R} with
    rank R = (k^2+1)/2 — greedy bit descent from the high bit. Taps beyond
    the traced k-window are masked out of the count (edge padding, like the
    sort version and cv2's BORDER_REPLICATE).

    The descent runs in BF16 LANES: every value in it is an integer — taps
    0..255, thresholds <= 256, validity 0/1, per-tap products <= 255, the
    count and its partial sums <= 121, rank <= 61 — and integers <= 256
    (plus any power of two) are exactly representable in bfloat16, so the
    bf16 descent is BIT-IDENTICAL to the f32 one (asserted on-device and
    pinned by the cv2 golden, ``test_median_blur_matches_cv2``) at half the
    VPU/bandwidth cost: measured 6.37 vs 9.02 ms/batch bs16 224^2 on TPU
    (-29%). Also measured and REJECTED (2026-08-19): a one-time
    out-of-window sentinel substitution (tap -> 512) instead of the per-bit
    validity multiply — 8.79 ms in f32 and 13.92 ms in bf16; XLA fuses the
    scalar multiply into the compare pass better than the rematerialised
    select.
    """
    h, w, c = img.shape
    r = 5
    half = (k.astype(jnp.int32) - 1) // 2
    x = jnp.clip(jnp.round(img), 0.0, 255.0).astype(jnp.bfloat16)
    xp = jnp.pad(x, [(r, r), (r, r), (0, 0)], mode="edge")
    rank = ((k * k + 1) // 2).astype(jnp.bfloat16)
    taps = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            valid = (max(abs(dy), abs(dx)) <= half).astype(jnp.bfloat16)
            taps.append((xp[r + dy : r + dy + h, r + dx : r + dx + w], valid))
    m = jnp.zeros((h, w, c), jnp.bfloat16)
    for bit in (128, 64, 32, 16, 8, 4, 2, 1):
        t = m + jnp.bfloat16(bit)
        cnt = sum(v * (tap < t).astype(jnp.bfloat16) for tap, v in taps)
        m = jnp.where(cnt < rank, t, m)
    return m.astype(jnp.float32)


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


def _directed_edge_kernel(direction):
    """3x3 ``iaa.DirectedEdgeDetect`` effect matrix for ``direction`` ~
    U(0, 1) (0 = from the top, clockwise).

    imgaug's construction: quantise the angle to whole degrees
    (``int(direction*360) % 360``), take the unit direction vector, weight
    each of the 8 neighbour cells by ``(1 - angle_between/180°)^4``,
    normalise the weights to sum 1, negate, and set the centre to 1 — i.e.
    centre minus a direction-weighted neighbourhood average. Golden-tested
    against a scalar-loop oracle (test_augment_distribution.py); an A/B
    against imgaug itself is blocked in this environment (TODO.md).
    """
    deg = jnp.mod(jnp.floor(direction * 360.0), 360.0)
    rad = jnp.deg2rad(deg) - 0.5 * jnp.pi
    dx, dy = jnp.cos(rad), jnp.sin(rad)
    offs = jnp.array([-1.0, 0.0, 1.0])
    gx, gy = jnp.meshgrid(offs, offs, indexing="xy")  # [y+1, x+1] cell (x, y)
    norm = jnp.sqrt(gx * gx + gy * gy)
    cosang = jnp.clip((gx * dx + gy * dy) / jnp.where(norm == 0, 1.0, norm), -1.0, 1.0)
    sim = (1.0 - jnp.arccos(cosang) / jnp.pi) ** 4
    sim = sim.at[1, 1].set(0.0)
    m = -sim / jnp.sum(sim)
    return m.at[1, 1].set(1.0)


_PERLIN_G = 16  # max lattice cells across a dimension (imgaug size_px_max hi)


def _perlin_eval(theta, u, v):
    """Classic Perlin evaluation at lattice coordinates ``(u, v)``.

    ``theta``: (side, side) gradient angles — the unit gradient at lattice
    node (i, j) is (sin θ, cos θ). Value = quintic-fade bilinear blend of
    the four corner gradient·offset dots; range ~[-sqrt(2)/2, sqrt(2)/2].
    Golden-tested against a scalar-loop oracle derived from Perlin's
    published definition (test_augment_distribution.py).
    """
    side = theta.shape[0]
    i0 = jnp.floor(u)
    j0 = jnp.floor(v)
    fu = u - i0
    fv = v - j0
    i0 = i0.astype(jnp.int32)
    j0 = j0.astype(jnp.int32)

    def grad_dot(di, dj):
        th = jnp.take(theta.reshape(-1), (i0 + di) * side + (j0 + dj))
        return jnp.sin(th) * (fu - di) + jnp.cos(th) * (fv - dj)

    def fade(t):
        return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)

    wu, wv = fade(fu), fade(fv)
    n0 = grad_dot(0, 0) * (1 - wv) + grad_dot(0, 1) * wv
    n1 = grad_dot(1, 0) * (1 - wv) + grad_dot(1, 1) * wv
    return n0 * (1 - wu) + n1 * wu


def _perlin_eval_sep(theta, u, v):
    """:func:`_perlin_eval` on a separable grid — ``u``: (h,) row lattice
    coords, ``v``: (w,) column coords; returns the same (h, w) values as
    ``_perlin_eval(theta, u[:, None]*ones, v[None, :]*ones)``.

    The four corner-gradient lookups become two tiny row/column ``take``s
    of the (side, side) lattice (with sin/cos evaluated once on the
    lattice) instead of four full-resolution flat gathers per octave —
    the gathers made the noise mask 45% of the whole heavy device
    pipeline (98.7 of 218.6 ms/batch bs16 224^2 on TPU)."""
    i0 = jnp.floor(u)
    j0 = jnp.floor(v)
    fu = (u - i0)[:, None]  # (h, 1)
    fv = (v - j0)[None, :]  # (1, w)
    i0 = i0.astype(jnp.int32)
    j0 = j0.astype(jnp.int32)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    def grad_dot(di, dj):
        s = jnp.take(jnp.take(sin_t, i0 + di, axis=0), j0 + dj, axis=1)
        c = jnp.take(jnp.take(cos_t, i0 + di, axis=0), j0 + dj, axis=1)
        return s * (fu - di) + c * (fv - dj)

    def fade(t):
        return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)

    wu, wv = fade(fu), fade(fv)
    n0 = grad_dot(0, 0) * (1 - wv) + grad_dot(0, 1) * wv
    n1 = grad_dot(1, 0) * (1 - wv) + grad_dot(1, 1) * wv
    return n0 * (1 - wu) + n1 * wu


def _perlin_mask(key, h: int, w: int):
    """Gradient-noise alpha mask in [0, 1] — the imgaug SimplexNoiseAlpha
    recipe: per draw, a noise layer at a sampled low resolution
    (``size_px_max`` ~ U{2..16} cells across), upscaled ``linear`` (here:
    continuous Perlin evaluation) or ``nearest`` (coords snapped to raster
    centers) with equal probability; 1-3 draws aggregated by max
    (``iterations=(1, 3)``, ``aggregation_method="max"``); sigmoid shaping
    with a Normal(0, 5) threshold. Perlin (unit-gradient lattice, quintic
    fade) stands in for OpenSimplex — same class of gradient noise,
    different basis; constants are best-effort pending an imgaug golden A/B
    (TODO.md)."""
    ks = jax.random.split(key, 3)
    yy = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)
    n_iter = jax.random.randint(ks[0], (), 1, 4)
    side = _PERLIN_G + 2

    def octave(i):
        kk = jax.random.fold_in(ks[1], i)
        k1, k2, k3 = jax.random.split(kk, 3)
        g = jax.random.randint(k1, (), 2, _PERLIN_G + 1).astype(jnp.float32)
        nearest = jax.random.uniform(k2) < 0.5
        u = yy * (g / h)  # row coord only depends on y, col only on x:
        v = xx * (g / w)  # the evaluation is separable (one take per axis)
        u = jnp.where(nearest, jnp.floor(u) + 0.5, u)
        v = jnp.where(nearest, jnp.floor(v) + 0.5, v)
        theta = jax.random.uniform(k3, (side, side), maxval=2.0 * jnp.pi)
        val = _perlin_eval_sep(theta, u, v)  # ~[-0.707, 0.707]
        return jnp.clip(0.5 + val * (0.5 / 0.70710678), 0.0, 1.0)

    mask = jnp.zeros((h, w), jnp.float32)
    for i in range(3):
        mask = jnp.maximum(mask, jnp.where(i < n_iter, octave(i), 0.0))
    thresh = jax.random.normal(ks[2]) * 5.0
    return jax.nn.sigmoid(20.0 * (mask - 0.5) + thresh)


def _simplex_edge(key, img, cfg: AugmentConfig):
    """iaa.SimplexNoiseAlpha(OneOf(EdgeDetect, DirectedEdgeDetect)).

    The OneOf coin picks the isotropic laplacian (EdgeDetect) or the
    direction-weighted kernel (:func:`_directed_edge_kernel`, direction ~
    U(0, 1)), blended with identity by alpha ~ U(0.5, 1). The alpha mask is
    gradient (Perlin) noise at imgaug's sampled granularity with
    max-aggregated draws and sigmoid shaping (:func:`_perlin_mask`)."""
    h, w, _ = img.shape
    ks = jax.random.split(key, 4)
    alpha = _u(ks[0], cfg.edge_alpha)
    lap = jnp.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    directed = jax.random.uniform(ks[2]) < 0.5
    eff = jnp.where(directed, _directed_edge_kernel(jax.random.uniform(ks[3])), lap)
    ident = jnp.zeros((3, 3)).at[1, 1].set(1.0)
    edged = jnp.clip(_conv3(img, (1.0 - alpha) * ident + alpha * eff), 0.0, 255.0)
    mask = _perlin_mask(ks[1], h, w)[..., None]
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
        seg = jnp.argmin(d, axis=1)
        # one-hot (P, K) — per-segment sums become MXU matmuls below
        # (segment_sum's scatter lowering is the slow path on TPU)
        return seg, jax.nn.one_hot(seg, _SP_K, dtype=jnp.float32)

    seg, onehot = assign(centers)
    feats1 = jnp.concatenate([feats, jnp.ones((feats.shape[0], 1))], 1)
    for _ in range(2):  # k-means refinement
        sums = jnp.matmul(onehot.T, feats1, precision=jax.lax.Precision.HIGHEST)
        cnt = jnp.maximum(sums[:, -1:], 1.0)
        centers = sums[:, :-1] / cnt
        seg, onehot = assign(centers)

    mean_col = jnp.matmul(
        onehot.T,
        jnp.concatenate([small.reshape(-1, c), jnp.ones((hs * ws, 1))], 1),
        precision=jax.lax.Precision.HIGHEST,
    )
    mean_col = mean_col[:, :c] / jnp.maximum(mean_col[:, -1:], 1.0)  # (K, C)

    p_rep = _u(ks[3], cfg.superpixels_replace)
    rep = jax.random.uniform(ks[4], (_SP_K,)) < p_rep
    # per-pixel lookup as one more (P, K) @ (K, C+1) matmul at the SMALL
    # resolution, upsampled nearest afterwards — equivalent to gathering
    # through the nearest-upsampled segment map (nearest replication
    # commutes with the lookup), without any full-resolution gather
    table = jnp.concatenate([mean_col, rep[:, None].astype(jnp.float32)], 1)
    looked = jnp.matmul(onehot, table, precision=jax.lax.Precision.HIGHEST).reshape(hs, ws, c + 1)
    mean_img, rep_img = looked[..., :c], looked[..., c] > 0.5
    if factor > 1:
        mean_img = jax.image.resize(mean_img, (h, w, c), "nearest")
        rep_img = jax.image.resize(
            rep_img[..., None].astype(jnp.float32), (h, w, 1), "nearest"
        )[..., 0] > 0.5
    return jnp.where(rep_img[..., None], mean_img, img)


def _entry_fns(ks, cfg: AugmentConfig, c: int):
    """The twelve intensity SomeOf entries as UNGATED single-image
    closures (``fn(img) -> img`` on an (H, W, C) float image in [0, 255]);
    the caller applies the gate (exact without-replacement SomeOf draw, or
    the legacy independent gates). ``ks``: the per-sample (40, 2) subkey
    array — each entry reads a fixed disjoint subset, so entries have
    independent parameter streams regardless of application order."""

    # entry 1: blur OneOf {gaussian, average, median}
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

    # entry 5: additive gaussian noise (per-channel half the time)
    def noise(im):
        scale = _u(ks[12], cfg.noise_scale)
        per_c = jax.random.uniform(ks[13]) < 0.5
        n_pc = jax.random.normal(ks[14], im.shape) * scale
        n_sh = jax.random.normal(ks[14], im.shape[:2] + (1,)) * scale
        return im + jnp.where(per_c, n_pc, jnp.broadcast_to(n_sh, im.shape))

    # entry 6: dropout OneOf {pixel (pc 0.5), coarse (pc 0.2)}
    def dropout_family(im):
        h, w = im.shape[:2]
        p = _u(ks[15], cfg.dropout)
        pc1 = jax.random.uniform(ks[30]) < 0.5
        keep_pc = (jax.random.uniform(ks[16], im.shape) >= p).astype(im.dtype)
        keep_sh = (jax.random.uniform(ks[16], im.shape[:2] + (1,)) >= p).astype(im.dtype)
        fine = im * jnp.where(pc1, keep_pc, jnp.broadcast_to(keep_sh, im.shape))

        # iaa.CoarseDropout(size_percent=(0.02, 0.05)): the keep-mask's
        # low resolution is SAMPLED per application. Static max raster
        # (5% of the image); the sampled granularity g indexes it through
        # floor(y*g/h) — per-cell Bernoulli at the drawn resolution.
        p2 = _u(ks[17], cfg.coarse_dropout)
        gmax = max(2, int(cfg.coarse_size[1] * h) + 1), max(2, int(cfg.coarse_size[1] * w) + 1)
        gh = jnp.round(_u(ks[38], cfg.coarse_size) * h)
        gw = jnp.round(_u(ks[38], cfg.coarse_size) * w)  # same draw: square cells
        gh = jnp.clip(gh, 2, gmax[0]).astype(jnp.int32)
        gw = jnp.clip(gw, 2, gmax[1]).astype(jnp.int32)
        pc2 = jax.random.uniform(ks[31]) < 0.2
        u_pc = jax.random.uniform(ks[18], (*gmax, c))
        u_sh = jnp.broadcast_to(jax.random.uniform(ks[18], (*gmax, 1)), (*gmax, c))
        u = jnp.where(pc2, u_pc, u_sh)
        iy = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * gh / h).astype(jnp.int32)
        ix = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * gw / w).astype(jnp.int32)
        kmask = (u >= p2).astype(im.dtype)[iy, ix]
        coarse = im * kmask
        return jnp.where(jax.random.uniform(ks[32]) < 0.5, fine, coarse)

    # entry 7: invert (per-channel Bernoulli(invert_prob) when it fires)
    def invert(im):
        inv_ch = jax.random.uniform(ks[33], (c,)) < cfg.invert_prob
        return jnp.where(inv_ch, 255.0 - im, im)

    # entry 8: add (per_channel 0.5)
    def add_op(im):
        pc = jax.random.uniform(ks[34]) < 0.5
        v_pc = _u(ks[19], cfg.add, (c,))
        v_sh = jnp.broadcast_to(_u(ks[19], cfg.add), (c,))
        return im + jnp.where(pc, v_pc, v_sh)

    # entry 10: multiply (per_channel 0.5)
    def mul_op(im):
        pc = jax.random.uniform(ks[36]) < 0.5
        v_pc = _u(ks[9], cfg.multiply, (c,))
        v_sh = jnp.broadcast_to(_u(ks[9], cfg.multiply), (c,))
        return im * jnp.where(pc, v_pc, v_sh)

    return [
        lambda im: _superpixels(ks[20], im, cfg),
        blur_family,
        lambda im: _sharpen(im, _u(ks[25], cfg.sharpen_alpha), _u(ks[26], cfg.sharpen_lightness)),
        lambda im: _emboss(im, _u(ks[27], cfg.emboss_alpha), _u(ks[28], cfg.emboss_strength)),
        lambda im: _simplex_edge(ks[29], im, cfg),
        noise,
        dropout_family,
        invert,
        add_op,
        (lambda im: _add_hue_sat(ks[35], im, cfg.hue_sat)) if c == 3 else (lambda im: im),
        mul_op,
        lambda im: im + _u(ks[37], cfg.grayscale_alpha) * (jnp.mean(im, -1, keepdims=True) - im),
    ]


def _intensity_ops(key, img, cfg: AugmentConfig):
    """LEGACY/test mode (``someof_n == 0``): the twelve intensity entries
    applied in fixed list order with independent per-entry gates
    (p = ``intensity_gate`` / the ``*_prob`` fields). A STATIC probability
    of 0 skips the op at trace time so light pipelines never pay for it.
    Production pipelines (``someof_n > 0``) use the exact per-batch-order
    path (:func:`_apply_someof_exact`) instead."""
    c = img.shape[-1]
    ks = jax.random.split(key, 40)
    # gates draw from a FOLDED stream, disjoint from the entry param
    # subkeys (ks[8]/ks[9] feed mul_op's params — reusing ks[i] as gate i
    # would couple the hue/sat gate to the shared multiply factor)
    gks = jax.random.split(jax.random.fold_in(key, 3), 12)
    fns = _entry_fns(ks, cfg, c)
    g = cfg.intensity_gate
    probs = [cfg.superpixels_prob] + [g] * 6 + [(g if cfg.invert_prob > 0 else 0.0)] + [g] * 4
    for i, (fn, p) in enumerate(zip(fns, probs)):
        if p <= 0.0:
            continue  # static skip
        on = jax.random.uniform(gks[i]) < p
        img = jnp.where(on, fn(img), img)
    return jnp.clip(img, 0.0, 255.0)


def _apply_someof_exact(keys, imgs, active, perm, cfg: AugmentConfig):
    """Apply the twelve intensity SomeOf entries to the whole batch in the
    per-batch drawn order ``perm`` — exact ``random_order=True`` semantics:
    imgaug draws the child order once per BATCH (its meta augmenters
    iterate children over the full batch in a per-batch permutation), so
    every sample in a batch shares one of the 12! orders and the order
    varies across batches.

    Realised as ``lax.scan`` over order positions with an UNBATCHED
    ``lax.switch`` (the order is batch-shared, so the branch index is a
    scalar): exactly one entry's kernel executes per position — the same
    total work as a fixed-order chain, and each entry compiles once.

    ``keys``: (B,) per-sample keys; ``active``: (B, 15) bool from
    :func:`someof_active`; ``perm``: (12,) int32 batch-shared order.
    """
    c = imgs.shape[-1]

    def apply_entry(i):
        def per_sample(k, im, act):
            ks = jax.random.split(jax.random.fold_in(k, 7), 40)
            fns = _entry_fns(ks, cfg, c)
            return jnp.where(act[i], fns[i](im), im)

        return lambda ims: jax.vmap(per_sample)(keys, ims, active)

    branches = [apply_entry(i) for i in range(12)]

    def body(ims, p):
        return jax.lax.switch(p, branches, ims), None

    imgs, _ = jax.lax.scan(body, imgs, perm)
    return jnp.clip(imgs, 0.0, 255.0)


def make_augment_fn(cfg: AugmentConfig, elastic_field: bool = True):
    """Build ``augment(rng, images, masks) -> (images, masks)``.

    ``images``: (B, H, W, C) uint8/float in [0, 255];
    ``masks``: (B, H, W) integer labels (or None).
    Returns float32 images in [0, 255] (normalisation stays downstream,
    matching the reference's order of operations) and int32 masks.

    ``random_order=True`` (outer Sequential AND SomeOf,
    ``data_generator_mscmrseg.py:80-83``) follows imgaug's PER-BATCH
    semantics — meta augmenters iterate their children over the whole
    batch in one per-batch permutation — realised exactly:

    * a (5,) outer permutation of [Fliplr, Flipud, CropAndPad, Affine,
      SomeOf] is drawn per batch; the four linear children compose into
      the single warp matrix in that order (exact — they are all affine),
      and the intensity block runs before/after the warp according to the
      SomeOf child's drawn position (before both warp children -> first,
      after both -> last, in between -> coin; the marginal order vs either
      warp child is exact). Perspective (a SomeOf member) composes on the
      SomeOf side of the warp product.
    * a (12,) SomeOf permutation is drawn per batch and the intensity
      entries are applied in exactly that order via
      :func:`_apply_someof_exact` — all 12! orders, batch-shared like
      imgaug, at the same runtime cost as a fixed chain.

    Residual order deviations (documented in the module docstring): the
    flip children keep their drawn position inside the composite warp
    rather than interleaving with intensity entries, and the three SomeOf
    geometry members (elastic/piecewise/perspective) ride at the warp
    boundary instead of their drawn slot among the intensity entries.
    """
    n_int = 12 if cfg.someof_n > 0 else 0

    def geo_one(key, img, mask, active, geo_seq, intensity_first):
        """One sample's composite warp: the four linear children composed
        in the per-batch drawn order + perspective + displacement field."""
        h, w = img.shape[:2]
        ks = jax.random.split(key, 12)
        mats, any_warp, snap = _child_matrices(ks[2], cfg, h, w)
        M = mats[geo_seq[0]]
        for p in range(1, 4):
            M = M @ mats[geo_seq[p]]
        persp_on = active[14] if (active is not None and cfg.someof_n > 14) else None
        if persp_on is not None or cfg.perspective_prob > 0:
            # inverse maps compose right-to-left; perspective is a SomeOf
            # member, so it sits on the SomeOf side of the product
            P = _perspective_inverse(ks[7], cfg, h, w, gate=persp_on)
            M = jnp.where(intensity_first, P @ M, M @ P)
        disp = jnp.zeros((h, w, 2), jnp.float32)
        el_on = active[12] if (active is not None and cfg.someof_n > 12) else None
        if elastic_field and (el_on is not None or cfg.elastic_prob > 0):
            on = el_on if el_on is not None else jax.random.uniform(ks[3]) < cfg.elastic_prob
            alpha = _u(ks[4], cfg.elastic_alpha)
            field = jax.random.uniform(ks[5], (h, w, 2), minval=-1.0, maxval=1.0)
            disp = disp + jnp.where(on, field * alpha, jnp.zeros(()))
        pw_on = active[13] if (active is not None and cfg.someof_n > 13) else None
        if pw_on is not None or cfg.piecewise_prob > 0:
            # iaa.PiecewiseAffine(scale=(0.01,0.05)): a coarse control grid of
            # N(0, scale*size) offsets, bilinearly upsampled (the local-affine
            # patchwork is approximated by its induced smooth field)
            on = pw_on if pw_on is not None else jax.random.uniform(ks[8]) < cfg.piecewise_prob
            s = _u(ks[9], cfg.piecewise_scale)
            grid = jax.random.normal(jax.random.fold_in(key, 11), (4, 4, 2))
            coarse = jax.image.resize(grid, (h, w, 2), "linear")
            coarse = coarse * s * jnp.array([h, w], jnp.float32)
            disp = disp + jnp.where(on, coarse, jnp.zeros(()))
        # border mode ~ ia.ALL and cval ~ U(0,255) apply to the crop&pad/
        # affine IMAGE resample (heavy/aug2; the light pipelines pin
        # mode='constant'); when neither fired the composite's other
        # members keep their imgaug defaults (constant-0 borders)
        if cfg.border_mode_all:
            mode = jnp.where(any_warp, jax.random.randint(ks[11], (), 0, 5), 0)
        else:
            mode = None
        cval = jnp.where(any_warp, jax.random.uniform(ks[6], minval=0.0, maxval=255.0), 0.0)
        if mask is not None:
            # imgaug warps segmentation maps with constant-0 borders even
            # when the image samples ia.ALL (Affine/CropAndPad hardcode
            # mode="constant", cval=0 for segmaps); the mask rides the
            # image's single patch-gather as the fused ``nn`` plane
            # (equivalence to a separate order-0 constant-0 warp is pinned
            # by test_warp_fused_mask_matches_separate)
            img, m = _warp_one(
                img, M, disp, order=1, cval=cval, mode=mode, snap=snap,
                nn=mask.astype(jnp.float32),
            )
            mask = m.astype(jnp.int32)
        else:
            img = _warp_one(img, M, disp, order=1, cval=cval, mode=mode, snap=snap)
        return img, mask

    def _sample_active(k):
        # same subkey slot the geometry block leaves unused (ks[10])
        return someof_active(jax.random.split(k, 12)[10], cfg)

    @jax.jit
    def augment(rng, images, masks=None):
        b = images.shape[0]
        k_order, k_perm, k_coin, kb = jax.random.split(rng, 4)
        keys = jax.random.split(kb, b)
        images = images.astype(jnp.float32)
        if masks is not None:
            masks = masks.astype(jnp.int32)
        # per-batch outer order of [Fliplr, Flipud, CropAndPad, Affine, SomeOf]
        order5 = jax.random.permutation(k_order, 5)
        pos = jnp.argsort(order5)  # pos[child] = application position
        geo_seq = jnp.argsort(pos[:4])  # the 4 linear children, in order

        if n_int == 0:
            # light/legacy: drawn order among the linear geometry children
            # (flips vs affine — light's Sequential is random_order too);
            # fixed-order independent-gate intensity (test mode only)
            def one(k, im, mk):
                im, mk = geo_one(k, im, mk, None, geo_seq, jnp.bool_(False))
                im = _intensity_ops(jax.random.fold_in(k, 7), im, cfg)
                return im, mk

            # masks=None flows through vmap as an empty pytree leaf
            return jax.vmap(one)(keys, images, masks)

        # SomeOf position vs the statically-LIVE warp children decides
        # whether the intensity block precedes the composite warp — only
        # children the config can actually fire count (aug2/medium has no
        # affine child, so its SomeOf-vs-CropAndPad order is exact; dead
        # children would otherwise force the between-coin 1/3 of the time)
        sp = pos[4]
        warp_pos = [pos[c] for c, p in ((2, cfg.croppad_prob), (3, cfg.affine_prob)) if p > 0]
        coin = jax.random.uniform(k_coin) < 0.5
        if warp_pos:
            lo = functools.reduce(jnp.minimum, warp_pos)
            hi = functools.reduce(jnp.maximum, warp_pos)
            before, after = sp < lo, sp > hi
            intensity_first = before | ((~after) & coin)
        else:
            # no live bordered-warp child: placement only orders intensity
            # vs the (flip-only) warp, a pure coin in imgaug too
            intensity_first = coin
        perm12 = jax.random.permutation(k_perm, n_int)
        active = jax.vmap(_sample_active)(keys)

        # ONE orchestration path: masks=None flows through as an empty
        # pytree leaf (vmap/scan pass it untouched), so the image-only and
        # image+mask modes cannot diverge
        def geo_block(x):
            ims, mks = x
            f = lambda k, im, mk, act: geo_one(k, im, mk, act, geo_seq, intensity_first)
            return jax.vmap(f)(keys, ims, mks, active)

        def int_block(x):
            ims, mks = x
            return _apply_someof_exact(keys, ims, active, perm12, cfg), mks

        order2 = jnp.where(intensity_first, jnp.array([1, 0]), jnp.array([0, 1]))
        (images, masks), _ = jax.lax.scan(
            lambda x, p: (jax.lax.switch(p, [geo_block, int_block], x), None),
            (images, masks),
            order2,
        )
        return images, masks

    return augment
