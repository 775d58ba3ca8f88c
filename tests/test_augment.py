"""Tests for the device-side augmentation engine."""

import jax
import numpy as np
import pytest

from pointcloududa_tpu.ops import augment


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(4, 32, 32, 3)).astype(np.uint8)
    masks = np.zeros((4, 32, 32), dtype=np.int32)
    masks[:, 8:24, 8:24] = 1
    masks[:, 12:20, 12:20] = 2
    return imgs, masks


def test_heavy_augment_contract(batch):
    imgs, masks = batch
    fn = augment.make_augment_fn(augment.heavy())
    out_i, out_m = fn(jax.random.PRNGKey(0), imgs, masks)
    assert out_i.shape == imgs.shape and out_i.dtype == np.float32
    assert out_m.shape == masks.shape
    assert float(out_i.min()) >= 0.0 and float(out_i.max()) <= 255.0
    # labels remain a subset of the input label set
    assert set(np.unique(np.array(out_m))) <= {0, 1, 2}


def test_augment_randomness_and_determinism(batch):
    imgs, masks = batch
    fn = augment.make_augment_fn(augment.heavy())
    a_i, _ = fn(jax.random.PRNGKey(0), imgs, masks)
    b_i, _ = fn(jax.random.PRNGKey(0), imgs, masks)
    c_i, _ = fn(jax.random.PRNGKey(1), imgs, masks)
    np.testing.assert_array_equal(np.array(a_i), np.array(b_i))  # same key, same result
    assert not np.allclose(np.array(a_i), np.array(c_i))  # different key differs


def test_light_preserves_intensities(batch):
    """light(): geometry only — surviving (non-border) pixel values must come
    from the original image's value set."""
    imgs, masks = batch
    fn = augment.make_augment_fn(augment.light())
    out_i, out_m = fn(jax.random.PRNGKey(3), imgs, masks)
    assert out_i.shape == imgs.shape
    assert float(out_i.max()) <= 255.0


def test_medium_no_geometry(batch):
    """medium() (augmentation2 parity) applies no flips/affine/elastic/
    piecewise/perspective — with its one genuine geometry child (crop&pad,
    p=0.5 like the reference's augmentation2) disabled, masks must be
    unchanged by everything that remains."""
    import dataclasses

    imgs, masks = batch
    cfg = dataclasses.replace(augment.medium(), croppad_prob=0.0)
    fn = augment.make_augment_fn(cfg)
    _, out_m = fn(jax.random.PRNGKey(7), imgs, masks)
    np.testing.assert_array_equal(np.array(out_m), masks)
    assert augment.medium().croppad_prob == 0.5  # the real medium keeps it


def test_flip_rates_match_config():
    """Statistical check: per-sample flip gates fire at the configured
    probabilities (heavy: fliplr 0.5, flipud 0.2)."""
    n = 250
    # an asymmetric image whose flips are detectable
    img = np.zeros((n, 8, 8, 1), np.float32)
    img[:, 0, 0, 0] = 255.0
    cfg = augment.AugmentConfig(
        someof_n=0,
        fliplr=0.5, flipud=0.2, croppad_prob=0.0, affine_prob=0.0,
        elastic_prob=0.0, perspective_prob=0.0, piecewise_prob=0.0,
        superpixels_prob=0.0, intensity_gate=0.0, invert_prob=0.0,
    )
    fn = augment.make_augment_fn(cfg)
    out, _ = fn(jax.random.PRNGKey(0), img)
    out = np.array(out)
    flipped_lr = out[:, 0, -1, 0] > 128
    flipped_ud = out[:, -1, 0, 0] > 128
    both = out[:, -1, -1, 0] > 128
    p_lr = (flipped_lr | both).mean()
    p_ud = (flipped_ud | both).mean()
    assert abs(p_lr - 0.5) < 0.12
    assert abs(p_ud - 0.2) < 0.1


def test_affine_gate_rate():
    """Geometry applies to ~affine_prob of samples (detected via changed
    center-of-mass of a corner blob)."""
    n = 200
    img = np.zeros((n, 16, 16, 1), np.float32)
    img[:, 2:5, 2:5, 0] = 255.0
    cfg = augment.AugmentConfig(
        someof_n=0,
        fliplr=0.0, flipud=0.0, croppad_prob=0.0, affine_prob=0.5,
        translate=(0.3, 0.4), rotate=(0.0, 0.0), shear=(0.0, 0.0), scale=(1.0, 1.0),
        elastic_prob=0.0, perspective_prob=0.0, piecewise_prob=0.0,
        superpixels_prob=0.0, intensity_gate=0.0, invert_prob=0.0,
    )
    fn = augment.make_augment_fn(cfg)
    out, _ = fn(jax.random.PRNGKey(1), img)
    moved = ~np.isclose(np.array(out), img, atol=20).all(axis=(1, 2, 3))
    assert abs(moved.mean() - 0.5) < 0.15


def test_croppad_direction():
    """pad (p > 0) must SHRINK content (imgaug CropAndPad pads then resizes
    back); regression for an inverted scale."""
    img = np.zeros((32, 24, 24, 1), np.float32)
    img[:, 8:16, 8:16, 0] = 255.0  # 8px-wide centered blob
    cfg = augment.AugmentConfig(
        someof_n=0,
        fliplr=0.0, flipud=0.0, croppad_prob=1.0, croppad=(0.5, 0.5),
        affine_prob=0.0, elastic_prob=0.0, perspective_prob=0.0, piecewise_prob=0.0,
        superpixels_prob=0.0, intensity_gate=0.0, invert_prob=0.0,
    )
    fn = augment.make_augment_fn(cfg)
    out, _ = fn(jax.random.PRNGKey(0), img)
    out = np.array(out)
    # per-side sampling: pad 0.5 on each side => content scaled by
    # 1/(1+0.5+0.5) = 1/2 per axis, so the old blob edge (offset ~4 from
    # center, in-bounds so unaffected by the random border fill) becomes
    # background while the center stays blob
    center = out[:, 11:13, 11:13, 0]
    edge = out[:, 8, 11:13, 0]  # offset -3.5..-4 rows from center
    assert center.mean() > 200.0
    assert edge.mean() < 50.0


def test_images_only_mode(batch):
    imgs, _ = batch
    fn = augment.make_augment_fn(augment.light())
    out_i, out_m = fn(jax.random.PRNGKey(2), imgs)
    assert out_i.shape == imgs.shape
    assert out_m is None


def test_someof_exact_applies_drawn_order():
    """_apply_someof_exact must apply the intensity entries in EXACTLY the
    per-batch drawn order. Entry parameter streams are order-independent
    (fixed disjoint subkey subsets), so each entry's effective transform
    can be recovered by running it alone: add (entry 8) gives a = out - x,
    multiply (entry 10) gives m = out / x. Both composite orders must then
    match the analytic compositions (x + a) * m vs x * m + a elementwise —
    whatever per_channel coins fired."""
    import jax
    import jax.numpy as jnp

    cfg = augment.heavy()
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.uniform(60.0, 140.0, size=(3, 8, 8, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(11), imgs.shape[0])

    def act(entries):
        a = np.zeros((imgs.shape[0], 15), bool)
        a[:, entries] = True
        return jnp.asarray(a)

    rest = [e for e in range(12) if e not in (8, 10)]
    perm_am = jnp.asarray(np.array([8, 10] + rest, np.int32))
    perm_ma = jnp.asarray(np.array([10, 8] + rest, np.int32))

    out_a = np.array(augment._apply_someof_exact(keys, imgs, act([8]), perm_am, cfg))
    out_m = np.array(augment._apply_someof_exact(keys, imgs, act([10]), perm_am, cfg))
    a = out_a - np.array(imgs)  # |a| <= 10: no clipping at these intensities
    m = out_m / np.array(imgs)  # m in [0.5, 1.5]

    got_am = np.array(augment._apply_someof_exact(keys, imgs, act([8, 10]), perm_am, cfg))
    got_ma = np.array(augment._apply_someof_exact(keys, imgs, act([8, 10]), perm_ma, cfg))
    np.testing.assert_allclose(got_am, (np.array(imgs) + a) * m, rtol=0, atol=1e-3)
    np.testing.assert_allclose(got_ma, np.array(imgs) * m + a, rtol=0, atol=1e-3)
    # the two orders are genuinely different programs
    assert np.abs(got_am - got_ma).max() > 0.5


def test_outer_geometry_order_realizes_both_compositions():
    """The per-batch drawn outer order must realize BOTH flip/affine
    compositions across batches, in both twins (light-style pipelines:
    the reference's light_aug Sequential is random_order=True too).

    With fliplr=1 and a deterministic +2px x-translation on a 16-wide
    frame, flip-then-translate puts a blob centred at col 4 at
    15-4+2 = 13, translate-then-flip at 15-(4+2) = 9 — mutually
    exclusive outcomes decided only by the drawn order, uniform by
    symmetry of the (5,) outer permutation."""
    import jax

    from pointcloududa_tpu.ops import host_augment

    cfg = augment.AugmentConfig(
        someof_n=0, fliplr=1.0, flipud=0.0, croppad_prob=0.0,
        affine_prob=1.0, scale=(1.0, 1.0), rotate=(0.0, 0.0), shear=(0.0, 0.0),
        translate=(0.0, 0.0), translate_x=(0.125, 0.125),
        elastic_prob=0.0, piecewise_prob=0.0, perspective_prob=0.0,
        superpixels_prob=0.0, intensity_gate=0.0, invert_prob=0.0,
    )
    img = np.zeros((1, 16, 16, 3), np.float32)
    mask = np.zeros((1, 16, 16), np.int32)
    mask[0, 6:10, 3:6] = 1
    img[0, 6:10, 3:6] = 255.0

    def centroid_x(m):
        ys, xs = np.nonzero(m[0])
        assert len(xs) > 0, "blob vanished"
        return xs.mean()

    fn = augment.make_augment_fn(cfg)
    n, counts = 60, {9: 0, 13: 0}
    for i in range(n):
        _, om = fn(jax.random.PRNGKey(i), img, mask)
        cx = centroid_x(np.array(om))
        key = min(counts, key=lambda k: abs(k - cx))
        assert abs(key - cx) < 1.0, f"unexpected centroid {cx}"
        counts[key] += 1
    assert min(counts.values()) >= 12, f"device twin order collapsed: {counts}"

    counts = {9: 0, 13: 0}
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        _, om = host_augment.augment_batch(img.copy(), mask.copy(), rng, cfg)
        cx = centroid_x(np.asarray(om))
        key = min(counts, key=lambda k: abs(k - cx))
        assert abs(key - cx) < 1.0, f"unexpected centroid {cx}"
        counts[key] += 1
    assert min(counts.values()) >= 12, f"host twin order collapsed: {counts}"


def test_median_blur_k_validated_at_construction():
    """ADVICE r3: _median_blur's r=5 window + bf16-exact bit descent only
    covers odd k in [1, 11]; a wider range must be rejected when the config
    is built, not silently mis-median inside the jit."""
    import dataclasses

    import pytest as _pytest

    with _pytest.raises(ValueError, match="median_blur_k"):
        augment.AugmentConfig(median_blur_k=(3, 13))
    with _pytest.raises(ValueError, match="median_blur_k"):
        dataclasses.replace(augment.heavy(), median_blur_k=(0, 11))
    # identity (k=1) and the production range stay constructible
    augment.AugmentConfig(median_blur_k=(1, 1))
    augment.AugmentConfig(median_blur_k=(3, 11))
