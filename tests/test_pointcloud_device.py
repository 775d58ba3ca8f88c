"""Device point-cloud builder vs the host (numpy/native) builder."""

import jax
import numpy as np

from pointcloududa_tpu.data.pointcloud import boundary_voxels, mask_to_point_cloud
from pointcloududa_tpu.ops.pointcloud_device import masks_to_point_clouds


def _square_mask(h=64, lo=20, hi=44):
    m = np.zeros((h, h), np.uint8)
    m[lo:hi, lo:hi] = 1
    return m


def test_device_clouds_land_on_host_surface():
    """Every device-sampled point must be a surface voxel of the host
    builder's slab (same candidate set), and spread across it."""
    mask = _square_mask()
    clouds = masks_to_point_clouds(
        np.stack([mask, mask]), jax.random.PRNGKey(0), number_points=100
    )
    clouds = np.array(clouds).astype(np.int64)
    slab = np.stack([mask, mask, mask])
    surface = {tuple(v) for v in boundary_voxels(slab)}
    for cloud in clouds:
        pts = {tuple(v) for v in cloud}
        assert pts <= surface
        # FPS should spread: cover a decent fraction of unique positions
        assert len(pts) > 80
        # all three z-planes represented (faces + ring)
        assert {0, 1, 2} <= {p[0] for p in cloud}


def test_device_cloud_empty_mask_rule():
    masks = np.zeros((2, 32, 32), np.uint8)
    masks[1, :5, :11] = 1  # 55 px > 50: non-empty
    clouds = np.array(masks_to_point_clouds(masks, jax.random.PRNGKey(1), number_points=20))
    assert clouds[0].sum() == 0
    assert clouds[1].sum() > 0
    # tiny mask (<= 50) -> zero cloud
    masks[1] = 0
    masks[1, 0, :50] = 1
    clouds = np.array(masks_to_point_clouds(masks, jax.random.PRNGKey(1), number_points=20))
    assert clouds[1].sum() == 0


def test_pallas_fps_matches_xla_exactly():
    """The Pallas FPS kernel must reproduce the XLA loop's greedy sequence
    point-for-point (interpret mode on CPU; compiled on TPU)."""
    from jax.experimental.pallas import tpu as pltpu

    mask = np.zeros((2, 64, 64), np.uint8)
    mask[0, 20:44, 20:44] = 1
    mask[1, 5:30, 10:50] = 1
    a = np.array(masks_to_point_clouds(mask, jax.random.PRNGKey(0), number_points=50, impl="xla"))
    with pltpu.force_tpu_interpret_mode():
        b = np.array(
            masks_to_point_clouds(mask, jax.random.PRNGKey(0), number_points=50, impl="pallas")
        )
    np.testing.assert_array_equal(a, b)


def test_device_fps_greedy_spread():
    """FPS property: the selected set's min pairwise distance is large
    relative to random sampling of the same surface."""
    mask = _square_mask(96, 16, 80)
    cloud = np.array(
        masks_to_point_clouds(mask[None], jax.random.PRNGKey(2), number_points=64)
    )[0]
    d = ((cloud[:, None, :] - cloud[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    min_pair = np.sqrt(d.min())
    # random surface sampling would collide (min distance ~0-1); FPS spreads
    assert min_pair >= 2.0
