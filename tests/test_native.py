"""Native C++ host kernels vs their numpy references."""

import numpy as np
import pytest

from pointcloududa_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def _numpy_fps(pts, k, start):
    out = np.zeros((k, pts.shape[1]))
    out[0] = pts[start]
    d = ((pts - out[0]) ** 2).sum(1)
    for i in range(1, k):
        idx = int(np.argmax(d))
        out[i] = pts[idx]
        d = np.minimum(d, ((pts - out[i]) ** 2).sum(1))
    return out


def test_native_fps_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(500, 3))
    got = native.fps(pts, 32, start=7)
    exp = _numpy_fps(pts, 32, 7)
    np.testing.assert_allclose(got, exp)


def test_native_boundary_matches_numpy():
    from scipy import ndimage

    rng = np.random.default_rng(1)
    slab = (ndimage.gaussian_filter(rng.normal(size=(3, 32, 32)), 2) > 0).astype(np.uint8)
    got = native.boundary_voxels(slab)
    s = slab.astype(bool)
    padded = np.pad(s, 1)
    interior = (
        padded[:-2, 1:-1, 1:-1] & padded[2:, 1:-1, 1:-1]
        & padded[1:-1, :-2, 1:-1] & padded[1:-1, 2:, 1:-1]
        & padded[1:-1, 1:-1, :-2] & padded[1:-1, 1:-1, 2:]
    )
    exp = np.argwhere(s & ~interior)
    got_sorted = got[np.lexsort(got.T[::-1])]
    exp_sorted = exp[np.lexsort(exp.T[::-1])]
    np.testing.assert_array_equal(got_sorted, exp_sorted)


def test_native_largest_component():
    mask = np.zeros((1, 16, 16), dtype=np.int32)
    mask[0, :4, :4] = 1
    mask[0, 10:12, 10:12] = 1
    out = native.largest_component(mask, 1)
    assert out[0, 1, 1] == 1
    assert out[0, 11, 11] == 0
    assert out.sum() == 16


def test_native_fps_used_by_pointcloud():
    from pointcloududa_tpu.data import pointcloud

    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 1
    cloud = pointcloud.mask_to_point_cloud(mask, seed=0)
    assert cloud.shape == (300, 3)
    assert cloud.sum() > 0
