"""Tests for host-side metrics (Dice/HD/ASD) and post-processing."""

import numpy as np

from pointcloududa_tpu.ops import metrics, postprocess


def test_dice_binary_basic():
    a = np.zeros((4, 4), dtype=int)
    b = np.zeros((4, 4), dtype=int)
    a[:2] = 1
    b[:2] = 1
    assert metrics.dice_binary(a, b) == 1.0
    b[:] = 0
    assert metrics.dice_binary(a, b) == 0.0
    assert metrics.dice_binary(np.zeros((2, 2)), np.zeros((2, 2))) == 0.0


def test_dice_binary_partial():
    a = np.array([[1, 1, 0, 0]])
    b = np.array([[1, 0, 0, 0]])
    assert abs(metrics.dice_binary(a, b) - 2 / 3) < 1e-12


def test_hausdorff_known_value():
    a = np.zeros((10, 10), dtype=bool)
    b = np.zeros((10, 10), dtype=bool)
    a[2, 2] = True
    b[2, 5] = True
    assert metrics.hausdorff_distance(a, b) == 3.0


def test_asd_asymmetric():
    a = np.zeros((12, 12), dtype=bool)
    b = np.zeros((12, 12), dtype=bool)
    a[5, 5] = True
    b[5, 5:8] = True
    # surface of a = 1 voxel, nearest b surface voxel distance 0
    assert metrics.average_surface_distance(a, b) == 0.0
    # b surfaces are at distance 0,1,2 from a
    assert abs(metrics.average_surface_distance(b, a) - 1.0) < 1e-12


def test_evaluate_structure_dict():
    gt = np.zeros((2, 8, 8), dtype=int)
    gt[:, :2] = 1
    gt[:, 2:4] = 2
    gt[:, 4:6] = 3
    res = metrics.evaluate(gt, gt.copy(), apply_hd=True, apply_asd=True)
    for name in ("myo", "lv", "rv"):
        assert res[name][0] == 1.0
        assert res[name][1] == 0.0


def test_compute_metrics_on_files_sentinels(capsys):
    gt = np.zeros((2, 8, 8), dtype=np.uint16)
    gt[:, :2] = 500
    pred = np.zeros_like(gt)  # empty prediction -> -1 sentinels
    res = metrics.compute_metrics_on_files(gt, pred, ifhd=True, ifasd=True)
    assert res[0] == -1.0 and res[1] == -1.0 and res[2] == -1.0
    assert len(res) == 9


def test_metrics_mmwhs_volume_sentinels():
    gt = np.zeros((2, 8, 8), dtype=int)
    gt[0, :3] = 1
    pred = np.zeros_like(gt)
    res = metrics.metrics_mmwhs_volume(gt, pred, toprint=False)
    assert len(res) == 12
    assert res[1] == -1 and res[2] == -1  # hd/asd sentinel for empty pred


def test_to_categorical_roundtrip():
    mask = np.random.default_rng(1).integers(0, 4, size=(3, 6, 6))
    onehot = postprocess.to_categorical(mask, 4, channel="channel_last")
    assert onehot.shape == (3, 6, 6, 4)
    np.testing.assert_array_equal(np.argmax(onehot, -1), mask)
    onehot_cf = postprocess.to_categorical(mask[:, np.newaxis], 4, channel="channel_first")
    assert onehot_cf.shape == (3, 4, 6, 6)
    np.testing.assert_array_equal(np.argmax(onehot_cf, 1), mask)


def test_soft_to_hard_pred_ties():
    pred = np.array([[[0.5, 0.5, 0.2]]])
    hard = postprocess.soft_to_hard_pred(pred, channel_axis=-1)
    np.testing.assert_array_equal(hard, [[[1, 1, 0]]])


def test_keep_largest_connected_components():
    mask = np.zeros((1, 10, 10), dtype=int)
    mask[0, :3, :3] = 1  # big blob (9 px)
    mask[0, 7:9, 7:9] = 1  # small blob (4 px)
    mask[0, 5, 5] = 2
    out = postprocess.keep_largest_connected_components(mask)
    assert out[0, 1, 1] == 1
    assert out[0, 8, 8] == 0  # small blob removed
    assert out[0, 5, 5] == 2


def test_crop_and_reconstruct_roundtrip():
    vol = np.random.default_rng(2).normal(size=(3, 16, 16, 4)).astype(np.float32)
    cropped = postprocess.crop_volume(vol, crop_size=4)
    assert cropped.shape == (3, 8, 8, 4)
    recon = postprocess.reconstruct_volume(cropped, crop_size=4, origin_size=16)
    np.testing.assert_array_equal(recon[:, 4:12, 4:12], cropped)
    assert recon[:, 0, 0].sum() == 0
