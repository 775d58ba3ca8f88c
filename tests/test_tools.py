"""Tests for the offline ETL tools and the TFRecord reader."""

import os
import subprocess
import sys

import numpy as np

from pointcloududa_tpu.utils.tfrecord import (
    parse_example,
    read_examples,
    write_example,
    write_tfrecord,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tfrecord_example_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(256, 256, 3)).astype("<f4")
    label = rng.integers(0, 5, size=(256, 256, 3)).astype("<f4")
    rec = write_example({"data_vol": data.tobytes(), "label_vol": label.tobytes()})
    path = str(tmp_path / "slice0.tfrecords")
    write_tfrecord(path, [rec])
    ex = next(iter(read_examples(path)))
    out = np.frombuffer(ex["data_vol"][0], dtype="<f4").reshape(256, 256, 3)
    np.testing.assert_array_equal(out, data)
    lbl = np.frombuffer(ex["label_vol"][0], dtype="<f4").reshape(256, 256, 3)
    np.testing.assert_array_equal(lbl, label)


def test_prepare_mmwhs_tool(tmp_path):
    rng = np.random.default_rng(1)
    split = "ct_train"
    tfs = tmp_path / "PnpAda_release_data/train_n_val" / f"{split}_tfs"
    os.makedirs(tfs, exist_ok=True)
    ids = []
    for i in range(2):
        _id = f"ct_train_slice{i}.tfrecords"
        ids.append(_id)
        data = rng.normal(size=(256, 256, 3)).astype("<f4")
        label = np.zeros((256, 256, 3), "<f4")
        label[100:150, 100:150] = 2
        write_tfrecord(
            str(tfs / _id),
            [write_example({"data_vol": data.tobytes(), "label_vol": label.tobytes()})],
        )
    with open(tmp_path / f"{split}_list.csv", "w") as f:
        f.write("img\n" + "\n".join(ids) + "\n")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import prepare_mmwhs

    prepare_mmwhs.main(["--input", str(tmp_path), "--splits", split])
    img = np.load(tmp_path / f"PnpAda_release_data/{split}/img/{ids[0]}.npy")
    mask = np.load(tmp_path / f"PnpAda_release_data/{split}/mask/{ids[0]}.npy")
    assert img.shape == (256, 256, 3)
    assert mask.shape == (256, 256, 1)
    assert set(np.unique(mask)) == {0.0, 2.0}


def test_prepare_mscmrseg_png_label_values(tmp_path):
    """Label PNGs must land on {0,85,212,255} — the values the data
    generator decodes back to classes (data_generator_mscmrseg.py:262-265)."""
    from pointcloududa_tpu.utils.nifti import save_nii

    raw = tmp_path / "raw_data/labels"
    os.makedirs(raw, exist_ok=True)
    gt = np.zeros((256, 256, 2), dtype=np.int16)
    gt[40:80, 40:80] = 200
    gt[80:120, 80:120] = 500
    gt[120:160, 120:160] = 600
    save_nii(str(raw / "patient1_LGE_manual.nii.gz"), gt)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import prepare_mscmrseg

    out = tmp_path / "processed/trainBmask"
    prepare_mscmrseg.main(
        ["png", "--modality", "lge", "--labels", "--input", str(tmp_path), "--out", str(out), "--pat", "1", "2"]
    )
    import cv2

    png = cv2.imread(str(out / "pat_1_lge_0.png"), cv2.IMREAD_GRAYSCALE)
    assert png.shape == (224, 224)
    assert set(np.unique(png)) == {0, 85, 212, 255}


def test_prepare_mscmrseg_npy_label_chain(tmp_path):
    """Label npy chain parity: map -> one-hot -> bilinear zoom -> argmax
    (read_nii_image.py:252-266); output is an integer label map."""
    from pointcloududa_tpu.utils.nifti import save_nii

    raw = tmp_path / "raw_data/labels"
    os.makedirs(raw, exist_ok=True)
    gt = np.zeros((64, 64, 2), dtype=np.int16)
    gt[10:30, 10:30] = 200
    gt[30:50, 30:50] = 500
    gt[50:60, 50:60] = 600
    save_nii(str(raw / "patient1_LGE_manual.nii.gz"), gt, np.diag([1.25, 1.25, 12.0, 1.0]))

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import prepare_mscmrseg

    out = tmp_path / "npy/trainBmask"
    prepare_mscmrseg.main(
        ["npy", "--modality", "lge", "--labels", "--input", str(tmp_path), "--out", str(out),
         "--pat", "1", "2", "--crop", "32"]
    )
    m = np.load(out / "pat_1_lge_0.npy")
    assert m.shape == (32, 32)
    assert m.dtype == np.uint8
    assert set(np.unique(m)) <= {0, 1, 2, 3}


def test_prepare_mscmrseg_rotate(tmp_path):
    import cv2

    img_dir = tmp_path / "img"
    mask_dir = tmp_path / "mask"
    vert_dir = tmp_path / "vert"
    for d in (img_dir, mask_dir, vert_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    mask = np.zeros((64, 64), np.uint8)
    mask[20:44, 24:40] = 85
    cv2.imwrite(str(img_dir / "a.png"), rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
    cv2.imwrite(str(mask_dir / "a.png"), mask)
    with open(tmp_path / "list.csv", "w") as f:
        f.write("img\na\n")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import prepare_mscmrseg

    prepare_mscmrseg.main(
        [
            "rotate",
            "--csv", str(tmp_path / "list.csv"),
            "--out-csv", str(tmp_path / "aug_list.csv"),
            "--img-dir", str(img_dir),
            "--mask-dir", str(mask_dir),
            "--vert-dir", str(vert_dir),
        ]
    )
    from pointcloududa_tpu.data.manifest import load_ids

    ids = load_ids(str(tmp_path / "aug_list.csv"))
    assert ids == ["a", "a_r1", "a_r2"]
    r1 = cv2.imread(str(mask_dir / "a_r1.png"), cv2.IMREAD_GRAYSCALE)
    assert set(np.unique(r1)) <= {0, 85}  # nearest-neighbour keeps label values
    assert not np.array_equal(r1, mask)  # actually rotated
    assert np.load(vert_dir / "a_r1.npy").shape == (300, 3)


def test_make_pointclouds_tool(tmp_path):
    masks = tmp_path / "mask"
    os.makedirs(masks, exist_ok=True)
    m = np.zeros((256, 256, 1), np.uint8)
    m[60:180, 60:180] = 1
    np.save(masks / "slice0.npy", m)
    np.save(masks / "empty.npy", np.zeros((256, 256, 1), np.uint8))

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_pointclouds

    out = tmp_path / "vertices"
    plots = tmp_path / "plots"
    make_pointclouds.main(
        ["--masks", str(masks), "--out", str(out), "--plots", str(plots), "--seed", "0"]
    )
    v = np.load(out / "slice0.npy")
    assert v.shape == (300, 3)
    assert v.sum() > 0
    assert np.load(out / "empty.npy").sum() == 0
    plot = np.load(plots / "slice0.npy")
    assert plot.shape == (256, 256)
    assert plot.sum() > 0


def test_bench_infer_tool_runs_tiny():
    """tools/bench_infer.py wiring: tiny model on CPU, both layouts."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import bench_infer

    for flag in ("--packed", "--no-packed"):
        bench_infer.main(["--bs", "2", "--size", "96", "--filters", "4",
                          "--dtype", "float32", "--steps", "4", flag])
