"""Tests for the NIfTI reader and the volume evaluation paths, on fabricated
mini datasets (random weights — we check plumbing/contracts, not quality)."""

import os

import numpy as np
import pytest

from pointcloududa_tpu.utils.nifti import load_nii, save_nii


def test_nifti_roundtrip(tmp_path):
    data = np.random.default_rng(0).integers(0, 600, size=(24, 20, 5)).astype(np.int16)
    p = str(tmp_path / "vol.nii.gz")
    affine = np.diag([1.2, 1.2, 5.0, 1.0])
    save_nii(p, data, affine)
    out, aff, hdr = load_nii(p)
    np.testing.assert_array_equal(out, data)
    np.testing.assert_allclose(aff, affine)
    assert hdr["dim"][0] == 3


def test_nifti_float_and_uncompressed(tmp_path):
    data = np.random.default_rng(1).normal(size=(8, 9, 3)).astype(np.float32)
    p = str(tmp_path / "vol.nii")
    save_nii(p, data)
    out, _, _ = load_nii(p)
    np.testing.assert_allclose(out, data, rtol=1e-6)


@pytest.fixture(scope="module")
def mscmrseg_fake_data(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("mscmrseg")
    os.makedirs(root / "processed/trainB", exist_ok=True)
    os.makedirs(root / "raw_data/labels/lge_test_gt", exist_ok=True)
    rng = np.random.default_rng(0)
    n_slices = 3
    gt = np.zeros((40, 40, n_slices), dtype=np.int16)
    gt[10:20, 10:20, :] = 200
    gt[20:28, 20:28, :] = 500
    save_nii(str(root / "raw_data/labels/lge_test_gt/patient6_LGE_manual.nii.gz"), gt)
    for i in range(n_slices):
        img = rng.integers(0, 255, size=(256, 256, 3)).astype(np.uint8)
        cv2.imwrite(str(root / f"processed/trainB/pat_6_lge_{i}.png"), img)
    return str(root)


def test_evaluate_mscmrseg_plumbing(mscmrseg_fake_data, tmp_path):
    import jax

    from pointcloududa_tpu.config import mscmrseg_default
    from pointcloududa_tpu.eval.volume import evaluate_mscmrseg
    from pointcloududa_tpu.train.state import build_models, create_train_state

    cfg = mscmrseg_default(filters=4, n_block=2, crop_size=16, fc_inch=0)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    gen, *_ = build_models(cfg)
    csv = str(tmp_path / "per_patient.csv")
    plots = str(tmp_path / "plots")
    out = evaluate_mscmrseg(
        cfg,
        gen,
        state.gen,
        data_dir=mscmrseg_fake_data,
        bs=2,
        ifhd=False,
        ifasd=False,
        pat_id_range=(6, 7),
        crop_size=16,
        per_patient_csv=csv,
        toprint=False,
        plot_dir=plots,
    )
    assert set(out) == {"endo", "rv", "myo"}
    for s in out.values():
        assert -1.0 <= s["dice_mean"] <= 1.0
    assert os.path.exists(csv)
    assert os.path.exists(os.path.join(plots, "pat6_0.png"))


@pytest.fixture(scope="module")
def mmwhs_fake_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmwhs")
    base = root / "PnpAda_release_data/test_ct_image_n_labels"
    os.makedirs(base, exist_ok=True)
    rng = np.random.default_rng(0)
    n = 4
    img = rng.normal(size=(32, 32, n)).astype(np.float32)
    gt = np.zeros((32, 32, n), dtype=np.int16)
    gt[8:16, 8:16] = 1
    gt[16:22, 16:22] = 3
    save_nii(str(base / "image_ct_1003.nii.gz"), img)
    save_nii(str(base / "gth_ct_1003.nii.gz"), gt)
    return str(root)


def test_evaluate_mmwhs_plumbing(mmwhs_fake_data, tmp_path):
    import jax

    from pointcloududa_tpu.config import mmwhs_default
    from pointcloududa_tpu.eval.volume import evaluate_mmwhs
    from pointcloududa_tpu.train.state import build_models, create_train_state

    cfg = mmwhs_default(filters=4, n_block=2, crop_size=32, fc_inch=0)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    gen, *_ = build_models(cfg)
    csv_path = str(tmp_path / "eval.csv")
    out = evaluate_mmwhs(
        cfg,
        gen,
        state.gen,
        data_dir=mmwhs_fake_data,
        bs=2,
        ifhd=False,
        ifasd=False,
        pat_ids=(1003,),
        toprint=False,
        per_patient_csv=csv_path,
        model_name="d1d2d4",
    )
    assert set(out) == {"myo", "la", "lv", "aa"}
    with open(csv_path) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "DC,HD,ASD,model,pad_id"
    assert lines[1].endswith("d1d2d4,1003")


def test_read_mmwhs_volume_stacking(mmwhs_fake_data):
    from pointcloududa_tpu.eval.volume import read_mmwhs_volume

    x, onehot = read_mmwhs_volume(mmwhs_fake_data, 1003)
    assert x.shape == (4, 32, 32, 3)
    assert onehot.shape == (4, 5, 32, 32)
    # 2.5D: middle channel of slice i equals slice i itself
    np.testing.assert_allclose(x[1, :, :, 1], x[2, :, :, 0])  # slice1 == prev of slice2
