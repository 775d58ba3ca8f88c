"""End-to-end smoke of the training loop on synthetic data (BASELINE
config 1: supervised U-Net train, CPU-runnable, SURVEY.md §7 step 3) plus
checkpoint semantics tests."""

import os

import numpy as np
import pytest

from pointcloududa_tpu.config import mscmrseg_default
from pointcloududa_tpu.train.checkpoint import (
    EarlyStoppingCallback,
    ModelCheckpointCallback,
    restore_pytree,
    save_pytree,
)

TINY = dict(filters=4, crop_size=32, fc_inch=0, bs=4, ns=8, epochs=2, aug="")


class _SynthTrainIter:
    def __init__(self, cfg, steps=2):
        self.cfg, self.steps = cfg, steps
        self.steps_per_epoch = steps

    def epoch(self):
        rng = np.random.default_rng(0)
        for _ in range(self.steps):
            hw = self.cfg.crop_size
            yield {
                "img_s": rng.integers(0, 255, size=(self.cfg.bs, hw, hw, 3)).astype(np.uint8),
                "mask_s": rng.integers(0, self.cfg.n_class, size=(self.cfg.bs, hw, hw)).astype(np.uint8),
                "img_t": rng.integers(0, 255, size=(self.cfg.bs, hw, hw, 3)).astype(np.uint8),
            }


def _synth_val(cfg, n=1):
    def make():
        rng = np.random.default_rng(1)
        hw = cfg.crop_size
        for _ in range(n):
            yield {
                "img": rng.integers(0, 255, size=(cfg.bs, hw, hw, 3)).astype(np.uint8),
                "mask": rng.integers(0, cfg.n_class, size=(cfg.bs, hw, hw)).astype(np.uint8),
            }

    return make


def test_trainer_fit_smoke(tmp_path):
    # n_block=2 keeps 32x32 valid (no point head at this size)
    cfg = mscmrseg_default(**TINY, n_block=2, decay_e=1)
    from pointcloududa_tpu.train.loop import UDATrainer

    trainer = UDATrainer(
        cfg,
        _SynthTrainIter(cfg),
        {"val": _synth_val(cfg), "val_lge": _synth_val(cfg), "test_lge": _synth_val(cfg)},
        workdir=str(tmp_path / "w"),
        logdir=str(tmp_path / "runs"),
    )
    best = trainer.fit()
    assert best["epoch"] >= 1
    assert 0.0 <= best["val_lge_dice"] <= 1.0
    # lr decayed twice (decay_e=1, 2 epochs -> one decay applied after e1)
    from pointcloududa_tpu.train.state import get_generator_lr

    assert get_generator_lr(trainer.state) < cfg.lr
    # best + scored-rename + last checkpoints exist
    names = os.listdir(tmp_path / "w")
    assert any(n.startswith("best_unet_model_checkpoint") and ".Scr" in n for n in names)
    assert any(n.startswith("unet_model_checkpoint") for n in names)
    # metrics were logged live
    logfiles = []
    for root, _, files in os.walk(tmp_path / "runs"):
        logfiles += files
    assert "metrics.jsonl" in logfiles


def test_checkpoint_best_and_rename(tmp_path):
    cb = ModelCheckpointCallback(
        mode="max",
        best_model_name=str(tmp_path / "best_model"),
        model_name=str(tmp_path / "model"),
        save_best=True,
        save_last_model=True,
        n_epochs=3,
    )
    tree = {"w": np.arange(4.0)}
    cb.step(0.5, tree, 1)
    assert os.path.exists(tmp_path / "best_model")
    cb.step(0.3, {"w": np.zeros(4)}, 2)  # worse: not overwritten
    restored = restore_pytree(str(tmp_path / "best_model"))
    np.testing.assert_array_equal(restored["state"]["w"], np.arange(4.0))
    cb.step(0.7, {"w": np.ones(4)}, 3)  # better + final: rename with score
    assert cb.final_best_path.endswith(".Scr0.7")
    assert os.path.exists(cb.final_best_path)
    assert os.path.exists(tmp_path / "model")  # last snapshot
    assert int(restore_pytree(cb.final_best_path)["epoch"]) == 3


def test_save_restore_roundtrip(tmp_path):
    tree = {"a": np.ones((2, 3), np.float32), "b": {"c": np.int32(7)}}
    save_pytree(str(tmp_path / "ck"), tree)
    out = restore_pytree(str(tmp_path / "ck"))
    np.testing.assert_array_equal(out["a"], tree["a"])
    assert out["b"]["c"] == 7


def test_early_stopping():
    es = EarlyStoppingCallback(patience=2, mode="max")
    es.step(0.5)
    es.step(0.4)
    assert not es.should_stop()
    es.step(0.3)
    assert es.should_stop()
    es.step(0.9)
    assert not es.should_stop()
