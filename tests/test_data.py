"""Tests for the host data pipeline: ring sampler semantics, point-cloud
builder, manifests, loader assembly (with a fake adapter), and the
histogram-matching equivalent."""

import numpy as np

from pointcloududa_tpu.data.loader import BatchAssembler, DevicePrefetcher, PairedIterator
from pointcloududa_tpu.data.manifest import load_ids, write_ids
from pointcloududa_tpu.data.pointcloud import (
    boundary_voxels,
    farthest_point_sampling,
    mask_to_point_cloud,
)
from pointcloududa_tpu.data.sampler import RingSampler


def test_ring_sampler_reference_semantics():
    """Epoch = n_samples draws from a once-shuffled ring with persistent,
    wrapping cursor (data_generator_mscmrseg.py:274-291)."""
    s = RingSampler(n_items=5, batch_size=2, n_samples=7, shuffle_seed=None)
    ep1 = list(s.epoch())
    # positions: [0,1], [2,3], [4,0], [1] (7 draws, tail truncated)
    assert ep1 == [[0, 1], [2, 3], [4, 0], [1]]
    ep2 = list(s.epoch())
    # cursor carried over: starts at position 2
    assert ep2 == [[2, 3], [4, 0], [1, 2], [3]]


def test_ring_sampler_shuffle_and_state():
    s = RingSampler(n_items=10, batch_size=4, n_samples=8, shuffle_seed=3)
    ep = list(s.epoch())
    assert sum(len(b) for b in ep) == 8
    state = s.state()
    a = list(s.epoch())
    s.restore(state)
    b = list(s.epoch())
    assert a == b


def test_ring_sampler_full_dataset_default():
    s = RingSampler(n_items=6, batch_size=4, n_samples=-1, shuffle_seed=None)
    ep = list(s.epoch())
    assert sum(len(b) for b in ep) == 6


def test_fps_covers_extremes():
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(500, 3))
    pts[0] = [10, 10, 10]  # an outlier FPS must pick early
    out = farthest_point_sampling(pts, 8, seed=1)
    assert out.shape == (8, 3)
    assert any(np.allclose(p, [10, 10, 10]) for p in out)


def test_fps_greedy_invariant():
    rng = np.random.default_rng(1)
    pts = rng.uniform(size=(100, 2))
    k = 10
    out = farthest_point_sampling(pts, k, seed=2)
    # every selected point must be a dataset point, and each one after the
    # first must attain the max of min-distance to the previously chosen set
    for j in range(1, k):
        dist_prev = np.min(((pts[None] - out[:j, None]) ** 2).sum(-1), axis=0)
        idx = int(np.argmin(((pts - out[j]) ** 2).sum(-1)))
        assert ((pts[idx] - out[j]) ** 2).sum() < 1e-12  # is a dataset point
        assert abs(dist_prev[idx] - dist_prev.max()) < 1e-12


def test_boundary_voxels_of_box():
    slab = np.zeros((3, 8, 8), dtype=np.uint8)
    slab[:, 2:6, 2:6] = 1
    pts = boundary_voxels(slab)
    # z=0 and z=2 faces are fully boundary (16 each); z=1 keeps only the ring
    assert len(pts) == 16 + 16 + 12
    assert pts.min() >= 0


def test_mask_to_point_cloud_contract():
    mask = np.zeros((64, 64), dtype=np.uint8)
    mask[20:40, 20:40] = 1
    cloud = mask_to_point_cloud(mask, seed=0)
    assert cloud.shape == (300, 3)
    assert cloud[:, 0].max() <= 2  # z within the 3-slab
    ys, xs = cloud[:, 1], cloud[:, 2]
    assert ys.min() >= 19 and ys.max() <= 40 and xs.min() >= 19 and xs.max() <= 40
    # empty / tiny masks give a zero cloud (npy2point.py:113-116)
    assert mask_to_point_cloud(np.zeros((64, 64))).sum() == 0
    tiny = np.zeros((64, 64))
    tiny[0, :50] = 1  # sum == 50, not > 50
    assert mask_to_point_cloud(tiny).sum() == 0


def test_manifest_roundtrip(tmp_path):
    p = str(tmp_path / "list.csv")
    write_ids(p, ["pat_1_img_0", "pat_1_img_1"])
    assert load_ids(p) == ["pat_1_img_0", "pat_1_img_1"]


class _FakeAdapter:
    def __init__(self, n, with_vert=True):
        self.n = n
        self.with_vert = with_vert

    def __len__(self):
        return self.n

    def __call__(self, i):
        img = np.full((8, 8, 3), i, dtype=np.uint8)
        mask = np.full((8, 8), i % 4, dtype=np.uint8)
        vert = np.full((300, 3), i, dtype=np.float32) if self.with_vert else None
        return img, mask, vert


def test_paired_iterator_assembles_batches():
    src = RingSampler(10, 4, n_samples=8, shuffle_seed=None)
    tgt = RingSampler(6, 4, n_samples=8, shuffle_seed=None)
    it = PairedIterator(
        src, tgt, BatchAssembler(_FakeAdapter(10), workers=2), BatchAssembler(_FakeAdapter(6), workers=2)
    )
    batches = list(it.epoch())
    assert len(batches) == 2
    b = batches[0]
    assert b["img_s"].shape == (4, 8, 8, 3)
    assert b["mask_s"].shape == (4, 8, 8)
    assert b["vert_s"].shape == (4, 300, 3)
    assert b["img_t"].shape == (4, 8, 8, 3)
    np.testing.assert_array_equal(b["img_s"][:, 0, 0, 0], [0, 1, 2, 3])


def test_host_augment_hook_and_vertex_regen():
    def fake_aug(imgs, masks, rng):
        return imgs, np.roll(masks, 1, axis=1)

    masks_big = _FakeAdapter(4)

    class BigMaskAdapter(_FakeAdapter):
        def __call__(self, i):
            img = np.zeros((64, 64, 3), np.uint8)
            mask = np.zeros((64, 64), np.uint8)
            mask[10:40, 10:40] = 1
            return img, mask, np.zeros((300, 3), np.float32)

    asm = BatchAssembler(BigMaskAdapter(4), workers=0, host_augment=fake_aug, regen_vertices=True)
    out = asm([0, 1], np.random.default_rng(0))
    assert out["vert"].shape == (2, 300, 3)
    assert out["vert"].sum() > 0  # regenerated from the (rolled) mask


def test_device_prefetcher_passthrough_and_errors():
    pf = DevicePrefetcher(place=lambda x: x * 2, depth=2)
    assert list(pf(iter([1, 2, 3]))) == [2, 4, 6]

    def bad():
        yield 1
        raise ValueError("boom")

    import pytest

    with pytest.raises(ValueError):
        list(pf(bad()))


def test_match_histograms_moments():
    from pointcloududa_tpu.data.mmwhs import match_histograms_single

    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, size=(32, 32, 3))
    ref = rng.normal(5, 2, size=(32, 32, 3))
    out = match_histograms_single(img, ref)
    assert abs(out.mean() - ref.mean()) < 0.1
    assert abs(out.std() - ref.std()) < 0.2
    # rank order preserved per channel
    c = 0
    assert np.array_equal(
        np.argsort(img[..., c].ravel(), kind="stable"),
        np.argsort(out[..., c].ravel(), kind="stable"),
    )


def test_match_histograms_goldens():
    """Hand-derived expected outputs of skimage's _match_cumulative_cdf
    algorithm (the function the reference imports,
    ``src/data_generator_mmwhs.py:9``) — exact value pins, including tie
    handling and the out-of-range quantile clamp, replacing the r2
    moments/rank-order approximation note (TODO.md)."""
    from pointcloududa_tpu.data.mmwhs import match_histograms_single

    def m(src, ref):
        out = match_histograms_single(
            np.asarray(src, np.float64).reshape(-1, 1, 1),
            np.asarray(ref, np.float64).reshape(-1, 1, 1),
        )
        return out.ravel()

    # src quantiles [.25,.75,1]; tmpl staircase (.25,10)(.5,20)(.75,30)(1,40)
    # -> interp: .25->10, .75->30, 1->40; tied 1s map to ONE value (30)
    np.testing.assert_allclose(m([0, 1, 1, 2], [10, 20, 30, 40]), [10, 30, 30, 40])
    # src quantiles [2/3, 1]; tmpl (0.5,1)(1,2) -> 2/3 -> 1+(1/6)/(1/2)=4/3
    np.testing.assert_allclose(m([5, 5, 7], [1, 2]), [4 / 3, 4 / 3, 2.0])
    # quantile below the tmpl staircase clamps to the tmpl minimum
    np.testing.assert_allclose(m([0.5, 1.5], [3, 3, 9]), [3.0, 9.0])
    # constant source maps wholly to the tmpl maximum (quantile 1.0)
    np.testing.assert_allclose(m([7, 7, 7], [1, 2, 3]), [3.0, 3.0, 3.0])
    # channels are matched independently
    src = np.stack([np.asarray([0.0, 1, 1, 2]), np.asarray([2.0, 1, 1, 0])], -1)
    ref = np.stack([np.asarray([10.0, 20, 30, 40]), np.asarray([-1.0, -2, -3, -4])], -1)
    out = match_histograms_single(src.reshape(2, 2, 2), ref.reshape(2, 2, 2))
    np.testing.assert_allclose(out[..., 0].ravel(), [10, 30, 30, 40])
    np.testing.assert_allclose(out[..., 1].ravel(), [-1, -2, -2, -4])
