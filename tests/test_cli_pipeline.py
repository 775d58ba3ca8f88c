"""End-to-end test: fabricated MS-CMRSeg mini dataset -> build pipelines ->
UDA training with a discriminator + device augmentation -> checkpoint
restore. Also covers CLI arg parsing parity for both workloads."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("mscmrseg_mini")
    rng = np.random.default_rng(0)
    ids = {"trainA": [], "trainB": [], "testA": [], "testB": []}
    for split, img_dir, mask_dir, vert_dir, csv in (
        ("trainA", "processed/trainA", "processed/trainAmask", "vertices/trainA", "aug_trainA.csv"),
        ("trainB", "processed/trainB", "processed/trainBmask", "vertices/trainB", "aug_trainB.csv"),
        ("testA", "processed/testA", "processed/testAmask", "vertices/testA", "testA.csv"),
        ("testB", "processed/trainB_orig", "processed/trainBmask_orig", "vertices/trainB_orig", "testB.csv"),
    ):
        os.makedirs(root / img_dir, exist_ok=True)
        os.makedirs(root / mask_dir, exist_ok=True)
        os.makedirs(root / vert_dir, exist_ok=True)
        for i in range(6):
            _id = f"{split}_img_{i}"
            ids[split].append(_id)
            img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
            mask = np.zeros((64, 64), np.uint8)
            mask[20:40, 20:40] = 85
            mask[25:35, 25:35] = 212
            mask[28:32, 28:32] = 255
            cv2.imwrite(str(root / img_dir / f"{_id}.png"), img)
            cv2.imwrite(str(root / mask_dir / f"{_id}.png"), mask)
            np.save(str(root / vert_dir / f"{_id}.npy"), rng.integers(0, 64, size=(300, 3)))
        with open(root / csv, "w") as f:
            f.write("img\n" + "\n".join(ids[split]) + "\n")
    return str(root)


def test_mscmrseg_end_to_end(mini_dataset, tmp_path):
    import jax

    from pointcloududa_tpu.config import mscmrseg_default
    from pointcloududa_tpu.data.build import build_mscmrseg_pipelines
    from pointcloududa_tpu.train.checkpoint import restore_net_state
    from pointcloududa_tpu.train.loop import UDATrainer
    from pointcloududa_tpu.train.state import build_models
    from pointcloududa_tpu.train.step import make_eval_step

    cfg = mscmrseg_default(
        filters=4,
        n_block=2,
        crop_size=32,
        fc_inch=0,
        bs=2,
        ns=4,
        epochs=1,
        d2=True,
        aug="heavy",
        data_dir=mini_dataset,
    )
    train_iter, val_iters = build_mscmrseg_pipelines(cfg, workers=2, device_augment=True)
    trainer = UDATrainer(
        cfg,
        train_iter,
        val_iters,
        workdir=str(tmp_path / "w"),
        logdir=str(tmp_path / "runs"),
    )
    best = trainer.fit()
    assert best["epoch"] == 1
    assert np.isfinite(best["valid"]["val_lge_loss"])
    # checkpoint restore round-trips into the same pytree structure
    scored = trainer.ckpt_gen.final_best_path
    assert scored and os.path.exists(scored)
    net = restore_net_state(scored, trainer.state.gen)
    a = jax.tree.leaves(net.params)
    b = jax.tree.leaves(trainer.state.gen.params)
    assert len(a) == len(b) and a[0].shape == b[0].shape

    # the restored net runs evaluation
    gen, *_ = build_models(cfg)
    eval_step = make_eval_step(cfg, gen)
    batch = next(val_iters["val"]())
    out = eval_step(net, trainer.pre_eval(jax.device_put(batch)))
    assert np.isfinite(float(out["loss"]))


def test_mscmrseg_cli_resume_and_load_weight(mini_dataset, tmp_path, capsys):
    """Drive the real CLI main() three times: (1) a run writing periodic
    full snapshots via -resume, (2) a -resume continuation that must pick up
    at the next epoch, (3) a -load_weight warm restart that must restore the
    discriminators and run the pre-train validation
    (src/train_mscmrseg.py:503-533)."""
    from pointcloududa_tpu.cli.train_mscmrseg import main

    snap = str(tmp_path / "snap")
    common = [
        "-bs", "2", "-ns", "4", "-d2", "-aug",  # -aug is store_false: no augmentation
        "-data_dir", mini_dataset,
        "-workdir", str(tmp_path / "w"), "-logdir", str(tmp_path / "r"),
        "-dtype", "float32",
    ]
    main(common + ["-e", "1", "-resume", snap])
    assert os.path.exists(snap)

    main(common + ["-e", "2", "-resume", snap])
    out = capsys.readouterr().out
    assert "continuing at epoch 2" in out
    assert "[2/2]" in out and "[1/2]" not in out  # epoch 1 was NOT re-run

    main(common + ["-e", "1", "-load_weight"])
    out = capsys.readouterr().out
    assert "weights restored from" in out
    # the initial validation printed before training (reference format)
    pre = out.split("Training on")[0]
    assert "valid_lge_dice:" in pre and "test_lge_dice:" in pre


def test_mscmrseg_cli_config_parity():
    from pointcloududa_tpu.cli.train_mscmrseg import build_parser, config_from_args
    from pointcloududa_tpu.config import appendix

    args = build_parser().parse_args(
        ["-d1", "-d2", "-d4", "-lr", "1e-3", "-d2lr", "2.5e-05", "-aug2", "-wp", "2.0"]
    )
    cfg = config_from_args(args)
    assert cfg.d1 and cfg.d2 and cfg.d4
    assert cfg.aug == "aug2"
    assert cfg.wp == 2.0
    a = appendix(cfg)
    assert ".d1lr2.5e-05" in a and ".aug2" in a and ".wp2.0" in a
    # -aug is store_false: passing it disables augmentation
    args = build_parser().parse_args(["-aug"])
    assert config_from_args(args).aug == ""
    assert ".aug" in appendix(config_from_args(args))


def test_mmwhs_cli_config_parity():
    from pointcloududa_tpu.cli.train_mmwhs import build_parser, config_from_args
    from pointcloududa_tpu.config import appendix

    args = build_parser().parse_args(
        ["-softmax", "-d2", "-d4", "-ft", "-extd4", "-dr", "0.1", "-w2", "0.5", "-sgd"]
    )
    cfg = config_from_args(args)
    assert cfg.softmax and cfg.ft and cfg.extd4 and cfg.sgd
    assert cfg.entropy_norm and cfg.d1_on_probs  # workload invariants
    a = appendix(cfg)
    for tag in (".softmax", ".ft", ".extd4", ".dr0.1", ".w2_0.5", ".sgd", ".mh"):
        assert tag in a, tag
    # -no_vert_t_metric wires through on both trainers (default = parity on)
    assert cfg.vert_t_metric is True
    assert config_from_args(build_parser().parse_args(["-no_vert_t_metric"])).vert_t_metric is False
    from pointcloududa_tpu.cli.train_mscmrseg import build_parser as bp2
    from pointcloududa_tpu.cli.train_mscmrseg import config_from_args as cfa2

    assert cfa2(bp2().parse_args(["-no_vert_t_metric"])).vert_t_metric is False


def test_mmwhs_builder_vert_regen_paths(tmp_path):
    """aug + point head: device path (default) ships raw target masks for
    on-device cloud regen; host_cloud_regen=True falls back to cv2 + native
    FPS in the worker pool."""
    from pointcloududa_tpu.config import mmwhs_default
    from pointcloududa_tpu.data.build import build_mmwhs_pipelines
    from pointcloududa_tpu.data.manifest import write_ids

    root = tmp_path / "mmwhs"
    rng = np.random.default_rng(0)
    for split in ("mr_train", "mr_val", "ct_train", "ct_val"):
        base = root / "PnpAda_release_data" / split
        for sub in ("img", "mask", "vertices"):
            os.makedirs(base / sub, exist_ok=True)
        ids = []
        for i in range(4):
            _id = f"{split}_slice{i}"
            ids.append(_id)
            np.save(base / "img" / f"{_id}.npy", rng.normal(size=(32, 32, 3)).astype(np.float32))
            m = np.zeros((32, 32, 1), np.uint8)
            m[8:24, 8:24] = 1
            np.save(base / "mask" / f"{_id}.npy", m)
            np.save(base / "vertices" / f"{_id}.npy", rng.integers(0, 32, (300, 3)))
        write_ids(str(root / f"{split}_list.csv"), ids)

    cfg = mmwhs_default(d4=True, aug="light", bs=2, ns=4, data_dir=str(root), crop_size=32)

    # host fallback path: clouds regenerated in the worker pool
    train_iter, val_iters, device_augment = build_mmwhs_pipelines(
        cfg, workers=0, host_cloud_regen=True
    )
    assert device_augment is False
    batch = next(train_iter.epoch())
    assert batch["vert_s"].shape == (2, 300, 3)
    assert batch["img_s"].dtype == np.float32
    # validation batches still carry (precomputed) vertices
    vb = next(val_iters["val"]())
    assert vb["vert"].shape == (2, 300, 3)

    # default device path: raw masks ride along, clouds built in preprocess
    train_iter, _, device_augment = build_mmwhs_pipelines(cfg, workers=0)
    assert device_augment is True
    raw = next(train_iter.epoch())
    assert "mask_t" in raw and "vert_s" not in raw
    import jax

    from pointcloududa_tpu.train.loop import make_device_preprocess

    pre = make_device_preprocess(cfg, train=True, device_augment=True)
    out = pre(jax.random.PRNGKey(0), raw)
    assert out["vert_s"].shape == (2, 300, 3)
    assert out["vert_t"].shape == (2, 300, 3)
    assert float(np.array(out["vert_s"]).max()) <= 1.0  # /255 normalised
