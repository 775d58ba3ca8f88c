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
    """medium() (augmentation2 parity) applies no flips/affine: masks must
    be unchanged."""
    imgs, masks = batch
    fn = augment.make_augment_fn(augment.medium())
    _, out_m = fn(jax.random.PRNGKey(7), imgs, masks)
    np.testing.assert_array_equal(np.array(out_m), masks)


def test_images_only_mode(batch):
    imgs, _ = batch
    fn = augment.make_augment_fn(augment.light())
    out_i, out_m = fn(jax.random.PRNGKey(2), imgs)
    assert out_i.shape == imgs.shape
    assert out_m is None
