"""Distribution A/B harness for the augmentation family.

The reference's imgaug pipeline (``src/data_generator_mscmrseg.py:20-84``)
cannot run here (imgaug is not installed), so parity is checked two ways:

1. **Op-level goldens**: the new kernels (median/average blur, sharpen,
   emboss, edge detect, HSV conversion) are compared against cv2 — the same
   backend imgaug itself wraps — on fixed inputs.
2. **Distribution statistics**: gate firing rates and intensity moments are
   compared against values derived analytically from the imgaug spec
   (SomeOf((0,5)) of 15 entries => per-entry p = 1/6; Sometimes halves it;
   Add(-10,10)/Multiply(0.5,1.5)/AdditiveGaussianNoise(0, 0-12.75) moments),
   plus a label-preservation regression bound for the geometric family.
"""

import cv2
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointcloududa_tpu.ops import augment

GEO_OFF = dict(
    fliplr=0.0, flipud=0.0, croppad_prob=0.0, affine_prob=0.0,
    elastic_prob=0.0, piecewise_prob=0.0, perspective_prob=0.0,
)
# someof_n=0 selects the legacy independent-gate mode these isolation tests
# drive through intensity_gate / *_prob; the production pipelines use the
# exact without-replacement SomeOf draw (tests further below)
ALL_OFF = dict(
    **GEO_OFF, someof_n=0, intensity_gate=0.0, superpixels_prob=0.0, invert_prob=0.0
)


@pytest.fixture(scope="module")
def img32():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)


# --------------------------------------------------------------------- #
# 1. op-level goldens vs cv2
@pytest.mark.parametrize("k", [3, 5, 7, 9, 11])
def test_median_blur_matches_cv2(img32, k):
    ours = np.asarray(
        augment._median_blur(jnp.asarray(img32, jnp.float32), jnp.int32(k))
    )
    want = cv2.medianBlur(img32, k).astype(np.float32)
    r = k // 2  # cv2 border handling differs; compare the interior
    np.testing.assert_allclose(ours[r:-r, r:-r], want[r:-r, r:-r], atol=1e-3)


@pytest.mark.parametrize("k", [3, 5, 7])
def test_average_blur_matches_cv2_odd_k(img32, k):
    ours = np.asarray(
        augment._avg_blur(jnp.asarray(img32, jnp.float32), jnp.int32(k))
    )
    want = cv2.blur(img32.astype(np.float32), (k, k))
    r = k // 2
    np.testing.assert_allclose(ours[r:-r, r:-r], want[r:-r, r:-r], rtol=1e-4, atol=1e-2)


def test_sharpen_matches_cv2_filter2d(img32):
    alpha, light = 0.7, 1.25
    eff = np.array([[-1, -1, -1], [-1, 8 + light, -1], [-1, -1, -1]], np.float32)
    ident = np.zeros((3, 3), np.float32)
    ident[1, 1] = 1.0
    kernel = (1 - alpha) * ident + alpha * eff
    want = cv2.filter2D(img32.astype(np.float32), -1, kernel)
    ours = np.asarray(
        augment._sharpen(jnp.asarray(img32, jnp.float32), alpha, light)
    )
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-2)


def test_emboss_matches_cv2_filter2d(img32):
    alpha, s = 0.6, 1.5
    eff = np.array([[-1 - s, -s, 0], [-s, 1, s], [0, s, 1 + s]], np.float32)
    ident = np.zeros((3, 3), np.float32)
    ident[1, 1] = 1.0
    # cv2.filter2D CORRELATES; our loop indexes kernel[dy,dx] directly == correlation
    want = cv2.filter2D(img32.astype(np.float32), -1, (1 - alpha) * ident + alpha * eff)
    ours = np.asarray(augment._emboss(jnp.asarray(img32, jnp.float32), alpha, s))
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-2)


def test_hsv_roundtrip_and_matches_cv2(img32):
    hsv = np.asarray(augment._rgb_to_hsv(jnp.asarray(img32, jnp.float32)))
    want = cv2.cvtColor(img32, cv2.COLOR_RGB2HSV).astype(np.float32)  # uint8: H in 0..180
    # uint8 conversion rounds; compare loosely (hue wraps at 180)
    dh = np.abs(hsv[..., 0] - want[..., 0])
    dh = np.minimum(dh, 180.0 - dh)
    assert float(dh.mean()) < 1.0
    np.testing.assert_allclose(hsv[..., 1:], want[..., 1:], atol=1.5)
    back = np.asarray(augment._hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, img32.astype(np.float32), atol=1e-2)


def test_superpixels_replace_all_and_none(img32):
    img = jnp.asarray(img32, jnp.float32)
    cfg = augment.AugmentConfig(superpixels_replace=(1.0, 1.0))
    out = np.asarray(augment._superpixels(jax.random.PRNGKey(0), img, cfg))
    # full replacement: at most n_segments distinct colors (<= 200)
    uniq = np.unique(out.reshape(-1, 3), axis=0)
    assert len(uniq) <= 200
    assert not np.allclose(out, img32)  # something changed
    cfg0 = augment.AugmentConfig(superpixels_replace=(0.0, 0.0))
    out0 = np.asarray(augment._superpixels(jax.random.PRNGKey(0), img, cfg0))
    np.testing.assert_allclose(out0, img32.astype(np.float32))  # identity


# --------------------------------------------------------------------- #
# 2. distribution statistics vs the imgaug spec
def test_someof_gate_calibration_heavy():
    """heavy(): per-entry gate = E[SomeOf((0,5))]/15 = 1/6; Sometimes-wrapped
    entries at 1/12 (superpixels, elastic, piecewise, perspective)."""
    cfg = augment.heavy()
    assert cfg.someof_n == 15 and cfg.someof_count == (0, 5)
    assert abs(cfg.intensity_gate - 2.5 / 15) < 1e-9
    for p in (cfg.superpixels_prob, cfg.elastic_prob, cfg.piecewise_prob, cfg.perspective_prob):
        assert abs(p - 0.5 * 2.5 / 15) < 1e-9
    med = augment.medium()
    assert med.someof_n == 12  # the medium SomeOf list = first 12 entries
    assert abs(med.intensity_gate - 2.5 / 12) < 1e-9
    assert med.elastic_prob == med.piecewise_prob == med.perspective_prob == 0.0
    assert augment.light().someof_n == 0


def test_someof_exact_draw_semantics():
    """The production draw is imgaug-exact: k ~ U{0..5} entries WITHOUT
    replacement — never more than 5 active, marginal rate = E[k]/n (x0.5
    for Sometimes-wrapped), and the count histogram of the UNWRAPPED
    entries is dominated by the uniform k draw (not a binomial tail)."""
    import jax

    ks = jax.random.split(jax.random.PRNGKey(0), 6000)
    acts = np.asarray(jax.vmap(lambda k: augment.someof_active(k, augment.heavy()))(ks))
    plain = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]
    wrapped = [0, 12, 13, 14]
    # a without-replacement draw can NEVER activate more than 5 entries —
    # independent Bernoullis (the r2 approximation) exceed 5 ~3% of the time
    assert (acts.sum(1) <= 5).all()
    # marginals match the spec
    assert np.abs(acts[:, plain].mean(0) - 2.5 / 15).max() < 0.02
    assert np.abs(acts[:, wrapped].mean(0) - 1.25 / 15).max() < 0.02
    # medium: last 3 entries excluded from the draw entirely
    acts12 = np.asarray(jax.vmap(lambda k: augment.someof_active(k, augment.medium()))(ks[:500]))
    assert not acts12[:, 12:].any()


def test_border_fold_matches_numpy_pad():
    """_border_fold vs np.pad index semantics for edge/symmetric/reflect/
    wrap on out-of-range indices."""
    import jax.numpy as jnp

    n = 5
    base = np.arange(n)
    idx = np.arange(-7, 12)
    for mode_i, np_mode in ((1, "edge"), (2, "symmetric"), (3, "reflect"), (4, "wrap")):
        padded = np.pad(base, (7, 7), mode=np_mode)
        want = padded[idx + 7]
        got = base[np.asarray(augment._border_fold(jnp.asarray(idx), n, jnp.int32(mode_i)))]
        np.testing.assert_array_equal(got, want, err_msg=np_mode)


def test_warp_border_modes_fill_vs_fold():
    """A pure translation past the border: constant mode fills with cval;
    edge mode replicates the border row (no cval anywhere)."""
    import jax.numpy as jnp

    img = jnp.broadcast_to(jnp.arange(8.0)[:, None, None], (8, 8, 1))  # rows 0..7
    M = jnp.asarray(np.array([[1.0, 0, -3], [0, 1, 0], [0, 0, 1]]))  # out y -> in y-3
    disp = jnp.zeros((8, 8, 2))
    out_c = np.asarray(augment._warp_one(img, M, disp, 1, 99.0, mode=jnp.int32(0)))
    out_e = np.asarray(augment._warp_one(img, M, disp, 1, 99.0, mode=jnp.int32(1)))
    assert (out_c[:3] == 99.0).all() and (out_c[3:, :, 0] == np.arange(5)[:, None]).all()
    assert (out_e[:3] == 0.0).all() and (out_e[3:, :, 0] == np.arange(5)[:, None]).all()


def _np_warp_oracle(img, M, disp, order, cval, np_mode):
    """Independent numpy oracle for _warp_one: big-pad with np.pad and
    interpolate the extension at the RAW (unfolded) coordinates — the
    extension identity the continuous border fold is built on."""
    h, w, _ = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    dnm = M[2, 0] * yy + M[2, 1] * xx + M[2, 2]
    iy = (M[0, 0] * yy + M[0, 1] * xx + M[0, 2]) / dnm + disp[..., 0]
    ix = (M[1, 0] * yy + M[1, 1] * xx + M[1, 2]) / dnm + disp[..., 1]
    P = 64
    kw = {"constant_values": cval} if np_mode == "constant" else {}
    pad = np.pad(img.astype(np.float64), [(P, P), (P, P), (0, 0)], mode=np_mode, **kw)
    if order == 0:
        yi = np.ceil(iy - 0.5).astype(int)
        xi = np.ceil(ix - 0.5).astype(int)
        return pad[yi + P, xi + P]
    y0 = np.floor(iy).astype(int)
    x0 = np.floor(ix).astype(int)
    wy = (iy - y0)[..., None]
    wx = (ix - x0)[..., None]
    g = lambda a, b: pad[a + P, b + P]
    top = g(y0, x0) * (1 - wx) + g(y0, x0 + 1) * wx
    bot = g(y0 + 1, x0) * (1 - wx) + g(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def test_warp_golden_vs_numpy_pad_oracle():
    """The single-gather patch warp (continuous border fold) vs an
    independent big-pad numpy oracle: every border mode, order 0 and 1,
    a rotation+scale+translate matrix plus a smooth displacement field."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    h, w, c = 13, 17, 2
    img = rng.uniform(0, 255, (h, w, c)).astype(np.float32)
    th = 0.4
    R = np.array(
        [[np.cos(th) / 0.8, -np.sin(th), 3.7], [np.sin(th), np.cos(th) * 1.2, -2.3], [0, 0, 1.0]]
    )
    disp = rng.uniform(-2.5, 2.5, (h, w, 2)).astype(np.float32)
    for mode_i, np_mode in ((0, "constant"), (1, "edge"), (2, "symmetric"), (3, "reflect"), (4, "wrap")):
        for order in (0, 1):
            got = np.asarray(
                augment._warp_one(
                    jnp.asarray(img), jnp.asarray(R, jnp.float32), jnp.asarray(disp),
                    order, 99.0, mode=jnp.int32(mode_i),
                )
            )
            want = _np_warp_oracle(img, R, disp, order, 99.0, np_mode)
            np.testing.assert_allclose(got, want, atol=2e-3, err_msg=f"{np_mode} order={order}")
    # snap=True through the order-1 path == the order-0 result
    got_snap = np.asarray(
        augment._warp_one(
            jnp.asarray(img), jnp.asarray(R, jnp.float32), jnp.asarray(disp),
            1, 99.0, mode=jnp.int32(2), snap=jnp.bool_(True),
        )
    )
    np.testing.assert_allclose(
        got_snap, _np_warp_oracle(img, R, disp, 0, 99.0, "symmetric"), atol=2e-3
    )


def test_warp_fused_mask_matches_separate():
    """The fused ``nn`` plane (mask riding the image's patch-gather) must
    equal a separate order-0 constant-0 warp of the mask, for every image
    border mode and under coordinate snapping."""
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    h, w = 19, 15
    img = jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 4, (h, w)).astype(np.int32))
    th = -0.3
    M = jnp.asarray(
        np.array([[np.cos(th) * 1.1, -np.sin(th), -2.2], [np.sin(th), np.cos(th) / 1.1, 4.1], [0, 0, 1.0]]),
        jnp.float32,
    )
    disp = jnp.asarray(rng.uniform(-2.0, 2.0, (h, w, 2)).astype(np.float32))
    for mode_i in range(5):
        for snap in (False, True):
            fused_img, fused_m = augment._warp_one(
                img, M, disp, 1, 7.0, mode=jnp.int32(mode_i),
                snap=jnp.bool_(snap), nn=mask.astype(jnp.float32),
            )
            sep_img = augment._warp_one(
                img, M, disp, 1, 7.0, mode=jnp.int32(mode_i), snap=jnp.bool_(snap)
            )
            sep_m = augment._warp_one(
                mask[..., None].astype(jnp.float32), M, disp, 0, 0.0, snap=jnp.bool_(snap)
            )[..., 0]
            np.testing.assert_allclose(
                np.asarray(fused_img), np.asarray(sep_img), atol=1e-4, err_msg=f"img mode={mode_i}"
            )
            np.testing.assert_array_equal(
                np.asarray(fused_m), np.asarray(sep_m), err_msg=f"mask mode={mode_i} snap={snap}"
            )


def test_perlin_mask_range_and_granularity():
    import jax

    m = np.asarray(augment._perlin_mask(jax.random.PRNGKey(2), 64, 64))
    assert m.shape == (64, 64)
    assert 0.0 <= m.min() and m.max() <= 1.0
    # different keys give different fields
    m2 = np.asarray(augment._perlin_mask(jax.random.PRNGKey(3), 64, 64))
    assert np.abs(m - m2).mean() > 0.01


def test_coarse_dropout_granularity_sampled():
    """Force the coarse-dropout branch and measure the dropped-cell size:
    runs (contiguous dropped spans) must reflect size_percent in
    (0.02, 0.05) => cell sides between ~1/0.05 and ~1/0.02 of the image,
    i.e. between 12 and 34 px at 64^2 (inclusive of rounding)."""
    import jax

    cfg = dataclass_with(
        augment.AugmentConfig(**{**ALL_OFF, "intensity_gate": 1.0}),
        **{**NEUTRAL, "coarse_dropout": (0.5, 0.5), "coarse_size": (0.02, 0.05),
           "dropout": (0.0, 0.0)},
    )
    # p2=0.5 => a checkerboard of dropped cells; boundary spacing along a
    # column == the sampled cell height (h / gh, gh = round(s*h), s in
    # (0.02, 0.05) => gh in {3..6} at 128 => spacing in {21..43})
    n = 128
    imgs = np.full((8, n, n, 3), 200, np.uint8)
    fn = augment.make_augment_fn(cfg)
    found = set()
    for seed in range(6):
        out, _ = fn(jax.random.PRNGKey(seed), imgs)
        out = np.asarray(out)
        for b in range(out.shape[0]):
            col = out[b, :, :, 0]
            changes = np.where(np.abs(np.diff(col.mean(1))) > 5)[0]
            if len(changes) >= 2:
                found.update(np.diff(changes).tolist())
    plausible = {s for s in found if 18 <= s <= 46}
    # multiple distinct cell sizes observed — granularity is SAMPLED
    assert len(plausible) >= 2, found


def dataclass_with(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


# params that turn every intensity entry into an identity (their gates
# still fire, proving gating and neutralisation independently): k=1 blurs,
# alpha=0 kernels, zero ranges
NEUTRAL = dict(
    blur_sigma=(0.0, 0.0), avg_blur_k=(1, 1), median_blur_k=(1, 1),
    sharpen_alpha=(0.0, 0.0), emboss_alpha=(0.0, 0.0), edge_alpha=(0.0, 0.0),
    noise_scale=(0.0, 0.0), dropout=(0.0, 0.0), coarse_dropout=(0.0, 0.0),
    add=(0.0, 0.0), hue_sat=(0.0, 0.0), multiply=(1.0, 1.0),
    grayscale_alpha=(0.0, 0.0),
)


def test_single_entry_fire_rate_matches_someof_gate():
    """Neutralise every entry except multiply(1.3,1.5) (which always changes
    a non-zero image when it fires): the observed change rate must equal the
    per-entry SomeOf gate p = 2.5/15 = 1/6."""
    cfg = dataclass_with(
        augment.AugmentConfig(**{**ALL_OFF, "intensity_gate": 2.5 / 15}),
        **{**NEUTRAL, "multiply": (1.3, 1.5)},
    )
    n = 400
    rng = np.random.default_rng(0)
    imgs = rng.integers(40, 216, size=(n, 16, 16, 3)).astype(np.uint8)
    fn = augment.make_augment_fn(cfg)
    out, _ = fn(jax.random.PRNGKey(0), imgs)
    changed = ~np.isclose(
        np.asarray(out), imgs.astype(np.float32), atol=0.5
    ).all(axis=(1, 2, 3))
    assert abs(changed.mean() - 1 / 6) < 0.07


def test_neutral_params_are_identities():
    """k=1 blurs / alpha-0 kernels / zero ranges pass images through even
    with every gate firing — the basis of the isolation tests above."""
    cfg = dataclass_with(
        augment.AugmentConfig(**{**ALL_OFF, "intensity_gate": 1.0}), **NEUTRAL
    )
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, size=(16, 16, 16, 3)).astype(np.uint8)
    fn = augment.make_augment_fn(cfg)
    out, _ = fn(jax.random.PRNGKey(1), imgs)
    np.testing.assert_allclose(np.asarray(out), imgs.astype(np.float32), atol=0.3)


def test_add_moment_matches_uniform_spec():
    """iaa.Add((-10,10)) when firing: per-sample shift ~ U(-10,10). Enable
    only the add entry (gate 1) and check the shift distribution moments."""
    cfg = dataclass_with(
        augment.AugmentConfig(**{**ALL_OFF, "intensity_gate": 1.0}),
        **{**NEUTRAL, "add": (-10.0, 10.0)},
    )
    n = 400
    base = np.full((n, 8, 8, 3), 128.0, np.float32)
    fn = augment.make_augment_fn(cfg)
    out, _ = fn(jax.random.PRNGKey(3), base)
    shifts = np.asarray(out).mean(axis=(1, 2, 3)) - 128.0
    # iaa.Add((-10,10), per_channel=0.5): half the samples get one shared
    # U(-10,10) shift (E|s| = 5), half get 3 independent per-channel shifts
    # whose image mean averages them (E|mean of 3 U| from the spec, by MC)
    mc = np.random.default_rng(0).uniform(-10, 10, (200000, 3)).mean(axis=1)
    expect_abs = 0.5 * 5.0 + 0.5 * np.abs(mc).mean()
    expect_std = np.sqrt(0.5 * (100 / 3) + 0.5 * mc.var())
    assert abs(shifts.mean()) < 0.8
    assert abs(np.abs(shifts).mean() - expect_abs) < 0.7
    assert abs(shifts.std() - expect_std) < 0.8
    assert np.abs(shifts).max() <= 10.01


def test_noise_moment_matches_spec():
    """AdditiveGaussianNoise(scale=(0, 12.75)): per-sample noise std ~
    U(0, 12.75) => E[std] = 6.375."""
    cfg = dataclass_with(
        augment.AugmentConfig(**{**ALL_OFF, "intensity_gate": 1.0}),
        **{**NEUTRAL, "noise_scale": (0.0, 12.75)},
    )
    n = 300
    base = np.full((n, 16, 16, 3), 128.0, np.float32)
    fn = augment.make_augment_fn(cfg)
    out, _ = fn(jax.random.PRNGKey(5), base)
    stds = np.asarray(out).std(axis=(1, 2, 3))
    assert abs(stds.mean() - 6.375) < 0.9
    assert stds.max() < 14.5  # scale cap + std-estimator variance


def test_host_twin_neutral_params_near_identity():
    """The cv2 host twin honours the same AugmentConfig: with every gate
    firing but neutral params it passes images through (tolerance covers
    cv2's uint8 HSV round-trip quantisation)."""
    from pointcloududa_tpu.ops.host_augment import augment_batch

    cfg = dataclass_with(
        augment.AugmentConfig(**{**ALL_OFF, "intensity_gate": 1.0}), **NEUTRAL
    )
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, size=(6, 16, 16, 3)).astype(np.uint8)
    out, _ = augment_batch(imgs, None, np.random.default_rng(0), cfg=cfg)
    np.testing.assert_allclose(np.asarray(out, np.float32), imgs.astype(np.float32), atol=6.0)


def test_host_twin_heavy_contract():
    """Full heavy host pipeline: shapes, range, label subset preserved."""
    from pointcloududa_tpu.ops.host_augment import make_host_augment

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, size=(8, 32, 32, 3)).astype(np.uint8)
    masks = np.zeros((8, 32, 32), np.int32)
    masks[:, 10:22, 10:22] = 1
    masks[:, 13:19, 13:19] = 2
    fn = make_host_augment("heavy")
    oi, om = fn(imgs, masks, np.random.default_rng(0))
    assert oi.shape == imgs.shape and om.shape == masks.shape
    assert 0.0 <= float(np.min(oi)) and float(np.max(oi)) <= 255.0
    assert set(np.unique(om)) <= {0, 1, 2}


def test_label_preservation_under_heavy_geometry():
    """Geometric family on a centred structure: the warped mask keeps all
    original labels in >= 80% of samples (regression bound for the
    translate(+-20%)/scale(0.8-1.2)/rotate(45)/shear(16) family), and labels
    never leave the input label set."""
    n = 200
    imgs = np.full((n, 32, 32, 3), 128, np.uint8)
    masks = np.zeros((n, 32, 32), np.int32)
    masks[:, 10:22, 10:22] = 1
    masks[:, 13:19, 13:19] = 2
    cfg = dataclass_with(
        # someof_n=0: intensity entries off (legacy gates at 0) while the
        # geometric family keeps its heavy() probabilities
        augment.heavy(), someof_n=0, intensity_gate=0.0, superpixels_prob=0.0,
        invert_prob=0.0,
    )
    fn = augment.make_augment_fn(cfg)
    _, out_m = fn(jax.random.PRNGKey(11), imgs, masks)
    out_m = np.asarray(out_m)
    assert set(np.unique(out_m)) <= {0, 1, 2}
    kept = np.mean([set(np.unique(m)) == {0, 1, 2} for m in out_m])
    assert kept >= 0.8


def test_perlin_eval_matches_scalar_oracle():
    """Golden-value test for the Perlin core (CLAUDE.md rule): a scalar
    per-pixel loop implementing Perlin's published definition — unit
    gradient (sin a, cos a) per lattice node, gradient-dot-offset at the
    four cell corners, quintic smoothstep 6t^5 - 15t^4 + 10t^3, bilinear
    blend — written independently of the vectorised device kernel."""
    rng = np.random.default_rng(7)
    side = 5
    theta = rng.uniform(0, 2 * np.pi, size=(side, side))
    h = w = 12
    u = rng.uniform(0.0, 3.0, size=(h, w))  # stays inside the lattice
    v = rng.uniform(0.0, 3.0, size=(h, w))

    want = np.zeros((h, w))
    for y in range(h):
        for x in range(w):
            uu, vv = u[y, x], v[y, x]
            i0, j0 = int(np.floor(uu)), int(np.floor(vv))
            fu, fv = uu - i0, vv - j0

            def dot(di, dj):
                a = theta[i0 + di, j0 + dj]
                return np.sin(a) * (fu - di) + np.cos(a) * (fv - dj)

            def smooth(t):
                return 6 * t**5 - 15 * t**4 + 10 * t**3

            wu, wv = smooth(fu), smooth(fv)
            n0 = dot(0, 0) * (1 - wv) + dot(0, 1) * wv
            n1 = dot(1, 0) * (1 - wv) + dot(1, 1) * wv
            want[y, x] = n0 * (1 - wu) + n1 * wu

    got = np.asarray(
        augment._perlin_eval(
            jnp.asarray(theta, jnp.float32),
            jnp.asarray(u, jnp.float32),
            jnp.asarray(v, jnp.float32),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_perlin_eval_sep_matches_dense():
    """The separable-grid fast path (`_perlin_eval_sep`, used by the mask
    builder: row coords depend only on y, column coords only on x) must
    equal the oracle-pinned dense kernel evaluated on the broadcast grid."""
    rng = np.random.default_rng(11)
    side = 6
    theta = jnp.asarray(rng.uniform(0, 2 * np.pi, size=(side, side)), jnp.float32)
    h, w = 17, 23
    u = jnp.asarray(rng.uniform(0.0, 4.0, size=h), jnp.float32)
    v = jnp.asarray(rng.uniform(0.0, 4.0, size=w), jnp.float32)
    dense = augment._perlin_eval(
        theta, jnp.broadcast_to(u[:, None], (h, w)), jnp.broadcast_to(v[None, :], (h, w))
    )
    sep = augment._perlin_eval_sep(theta, u, v)
    np.testing.assert_allclose(np.asarray(sep), np.asarray(dense), atol=1e-5)


def test_mask_borders_constant_zero_under_ia_all():
    """imgaug warps segmentation maps with constant-0 borders even when the
    image samples mode=ia.ALL (Affine/CropAndPad hardcode constant-0 for
    segmaps): force a strong pad (content shrink) on every sample with an
    all-ones mask — the vacated border must be label 0 in EVERY sample,
    never edge-replicated or wrapped 1s."""
    cfg = augment.AugmentConfig(
        **{**ALL_OFF, "croppad_prob": 1.0, "croppad": (0.3, 0.4)}
    )
    assert cfg.border_mode_all  # the IMAGE border does sample ia.ALL here
    n = 32
    imgs = np.full((n, 32, 32, 1), 128, np.uint8)
    masks = np.ones((n, 32, 32), np.int32)
    fn = augment.make_augment_fn(cfg)
    _, out = fn(jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(masks))
    out = np.asarray(out)
    # pad >= 0.3 => content occupies <= 1/1.3 of the frame => >= 3 px border
    assert (out[:, :2, :] == 0).all() and (out[:, -2:, :] == 0).all()
    assert (out[:, :, :2] == 0).all() and (out[:, :, -2:] == 0).all()


def test_light_pipeline_pins_constant_border():
    """The light pipelines' Affine uses mode='constant' only
    (data_generator_mscmrseg.py:153, data_generator_mmwhs.py:101): under a
    forced +50% translation of an x-gradient image, the vacated band must
    be one constant fill value per sample. The same setup with
    border_mode_all=True must produce folded (non-constant) bands in some
    samples — the knob is live, not decorative."""
    n = 40
    grad = np.clip(30 + 5 * np.arange(32), 0, 255).astype(np.uint8)
    imgs = np.broadcast_to(grad[None, None, :, None], (n, 32, 32, 1)).copy()
    base = {
        **ALL_OFF,
        "affine_prob": 1.0,
        "scale": (1.0, 1.0),
        "rotate": (0.0, 0.0),
        "shear": (0.0, 0.0),
        "translate": (0.5, 0.5),
    }

    def vacated_stds(border_mode_all):
        cfg = augment.AugmentConfig(**base, border_mode_all=border_mode_all)
        fn = augment.make_augment_fn(cfg)
        out, _ = fn(jax.random.PRNGKey(3), jnp.asarray(imgs), None)
        region = np.asarray(out)[:, 2:10, 2:10, 0]  # inside the vacated zone
        return region.std(axis=(1, 2))

    assert (vacated_stds(False) < 1e-3).all()  # constant fill everywhere
    assert (vacated_stds(True) > 1.0).any()  # ia.ALL folds the gradient


def test_light_config_matches_live_light_aug():
    """light() models the reference's LIVE light pipeline — MM-WHS
    ``light_aug`` (data_generator_mmwhs.py:87-122, called at :253) with
    gates Fliplr(0.2)/Flipud(0.2)/Sometimes(0.3, Affine) and the per-axis
    asymmetric translate_percent x (-0.1, 0.05), y (-0.1, 0.1) — not the
    dead ``simple_aug`` (0.3/0.3/0.45, never called by the reference)."""
    cfg = augment.light()
    assert (cfg.fliplr, cfg.flipud, cfg.affine_prob) == (0.2, 0.2, 0.3)
    assert cfg.translate == (-0.1, 0.1)  # y range
    assert cfg.translate_x == (-0.1, 0.05)  # x range
    assert cfg.rotate == (-10.0, 10.0) and cfg.shear == (-12.0, 12.0)
    # heavy/medium are x/y-symmetric: no override
    assert augment.heavy().translate_x is None
    assert augment.medium().translate_x is None


@pytest.mark.parametrize("direction", [0.0, 0.13, 0.25, 0.5, 0.77])
def test_directed_edge_kernel_matches_scalar_oracle(direction):
    """Golden-value test for the DirectedEdgeDetect effect matrix: a scalar
    loop over the 8 neighbour cells computing the angle between each cell
    offset and the (degree-quantised) direction vector via the dot-product
    definition, weighting by (1 - angle/180)^4, normalising, negating, and
    setting the centre to 1 — independent of the vectorised kernels."""
    import math

    deg = math.floor(direction * 360.0) % 360.0
    rad = math.radians(deg) - 0.5 * math.pi
    dvx, dvy = math.cos(rad), math.sin(rad)
    want = np.zeros((3, 3))
    for cy in (-1, 0, 1):
        for cx in (-1, 0, 1):
            if (cx, cy) == (0, 0):
                continue
            dot = cx * dvx + cy * dvy
            ang = math.acos(max(-1.0, min(1.0, dot / math.hypot(cx, cy))))
            want[cy + 1, cx + 1] = (1.0 - math.degrees(ang) / 180.0) ** 4
    want = -want / want.sum()
    want[1, 1] = 1.0

    got = np.asarray(augment._directed_edge_kernel(jnp.float32(direction)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    from pointcloududa_tpu.ops import host_augment

    np.testing.assert_allclose(
        host_augment._directed_edge_kernel_np(direction), want, atol=1e-5
    )
    # direction 0 = from the top: the top-centre cell carries the largest
    # neighbour weight (most negative after negation)
    if direction == 0.0:
        assert got[0, 1] == got.min()
