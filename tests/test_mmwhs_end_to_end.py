"""End-to-end MM-WHS: fabricated npy dataset -> builders -> UDA training
with softmax-CE + D2 + d4aux (host augmentation with vertex regeneration)
-> validation with vertices."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mmwhs_root(tmp_path_factory):
    from pointcloududa_tpu.data.manifest import write_ids

    root = tmp_path_factory.mktemp("mmwhs_e2e")
    rng = np.random.default_rng(0)
    for split in ("mr_train", "mr_val", "ct_train", "ct_val"):
        base = root / "PnpAda_release_data" / split
        for sub in ("img", "mask", "vertices"):
            os.makedirs(base / sub, exist_ok=True)
        ids = []
        for i in range(6):
            _id = f"{split}_slice{i}.tfrecords"
            ids.append(_id)
            np.save(base / "img" / f"{_id}.npy", rng.normal(size=(32, 32, 3)).astype(np.float32))
            m = np.zeros((32, 32, 1), np.uint8)
            m[6:26, 6:26] = rng.integers(1, 5)
            np.save(base / "mask" / f"{_id}.npy", m)
            np.save(base / "vertices" / f"{_id}.npy", rng.integers(0, 32, (300, 3)).astype(np.float64))
        write_ids(str(root / f"{split}_list.csv"), ids)
    return str(root)


def test_mmwhs_trainer_end_to_end(mmwhs_root, tmp_path):
    import jax

    from pointcloududa_tpu.config import mmwhs_default
    from pointcloududa_tpu.data.build import build_mmwhs_pipelines
    from pointcloududa_tpu.train.loop import UDATrainer

    cfg = mmwhs_default(
        filters=4,
        n_block=2,
        crop_size=32,
        fc_inch=9,  # 32 -> bottleneck 8x8 -> k6 VALID -> 3x3
        bs=2,
        ns=4,
        epochs=1,
        softmax=True,
        etpls=True,
        d2=True,
        d4aux=True,
        aug="light",
        data_dir=mmwhs_root,
    )
    train_iter, val_iters, device_augment = build_mmwhs_pipelines(cfg, workers=2)
    assert device_augment is True  # default: warp + cloud regen on device
    trainer = UDATrainer(
        cfg,
        train_iter,
        val_iters,
        workdir=str(tmp_path / "w"),
        logdir=str(tmp_path / "runs"),
        device_augment=device_augment,
    )
    best = trainer.fit()
    assert best["epoch"] == 1
    assert np.isfinite(best["valid"]["val_lge_loss"])
    assert np.isfinite(best["train"]["entropy_loss"])
    # d4aux: chamfer supervised, so vert losses must be real numbers
    assert np.isfinite(best["train"]["ver_s_loss"])
    assert best["valid"]["valid_vert_loss"] != -1.0
