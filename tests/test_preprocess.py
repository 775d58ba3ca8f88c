"""Tests for the fused device preprocess (augment + normalise + crop +
one-hot) used by the trainer."""

import jax
import numpy as np

from pointcloududa_tpu.config import mmwhs_default, mscmrseg_default
from pointcloududa_tpu.train.loop import make_device_preprocess


def _raw_mscmrseg(bs=2, size=48, n_class=4, with_vert=True):
    rng = np.random.default_rng(0)
    raw = {
        "img_s": rng.integers(0, 255, size=(bs, size, size, 3)).astype(np.uint8),
        "mask_s": rng.integers(0, n_class, size=(bs, size, size)).astype(np.uint8),
        "img_t": rng.integers(0, 255, size=(bs, size, size, 3)).astype(np.uint8),
    }
    if with_vert:
        raw["vert_s"] = rng.integers(0, 255, size=(bs, 300, 3)).astype(np.float32)
        raw["vert_t"] = rng.integers(0, 255, size=(bs, 300, 3)).astype(np.float32)
    return raw


def test_preprocess_train_no_aug_values():
    cfg = mscmrseg_default(crop_size=32, aug="", d4=True)
    pre = make_device_preprocess(cfg, train=True, device_augment=True)
    raw = _raw_mscmrseg(size=48)
    out = pre(jax.random.PRNGKey(0), raw)
    assert out["img_s"].shape == (2, 32, 32, 3)
    # /255 normalisation and centre crop (48->32: offset 8)
    np.testing.assert_allclose(
        np.array(out["img_s"][0, 0, 0]), raw["img_s"][0, 8, 8] / 255.0, rtol=1e-6
    )
    assert out["mask_s"].shape == (2, 32, 32, 4)
    np.testing.assert_array_equal(
        np.argmax(np.array(out["mask_s"]), -1), raw["mask_s"][:, 8:40, 8:40]
    )
    np.testing.assert_allclose(np.array(out["vert_s"]), raw["vert_s"] / 255.0, rtol=1e-6)


def test_preprocess_train_with_device_aug():
    cfg = mscmrseg_default(crop_size=32, aug="heavy")
    pre = make_device_preprocess(cfg, train=True, device_augment=True)
    raw = _raw_mscmrseg(size=48, with_vert=False)
    out = pre(jax.random.PRNGKey(1), raw)
    assert out["img_s"].shape == (2, 32, 32, 3)
    assert float(out["img_s"].max()) <= 1.0 + 1e-6  # normalised after aug
    assert out["mask_s"].shape == (2, 32, 32, 4)
    # one-hot masks remain valid
    np.testing.assert_allclose(np.array(out["mask_s"]).sum(-1), 1.0)


def test_preprocess_mmwhs_floats_passthrough():
    cfg = mmwhs_default(crop_size=32, aug="")
    pre = make_device_preprocess(cfg, train=True, device_augment=True)
    rng = np.random.default_rng(2)
    raw = {
        "img_s": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
        "mask_s": rng.integers(0, 5, size=(2, 32, 32)).astype(np.uint8),
        "img_t": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
    }
    out = pre(jax.random.PRNGKey(0), raw)
    # volume-normalised floats pass through untouched (no /255, no crop)
    np.testing.assert_allclose(np.array(out["img_s"]), raw["img_s"], rtol=1e-6)
    assert out["mask_s"].shape == (2, 32, 32, 5)


def test_preprocess_eval():
    cfg = mscmrseg_default(crop_size=32, d4=True)
    pre = make_device_preprocess(cfg, train=False, device_augment=False)
    rng = np.random.default_rng(3)
    raw = {
        "img": rng.integers(0, 255, size=(2, 48, 48, 3)).astype(np.uint8),
        "mask": rng.integers(0, 4, size=(2, 48, 48)).astype(np.uint8),
        "vert": rng.integers(0, 255, size=(2, 300, 3)).astype(np.float32),
    }
    out = pre(raw)
    assert out["img"].shape == (2, 32, 32, 3)
    assert out["mask"].shape == (2, 32, 32, 4)
    assert float(out["vert"].max()) <= 1.0


def test_synthetic_raw_batch_feeds_e2e_chain():
    """Pins bench.py's BENCH_E2E contract: a synthetic RAW batch runs
    through the jitted device preprocess into the full triple-adversary
    train step (toy shapes) and yields finite metrics."""
    from pointcloududa_tpu.data.synthetic import synthetic_raw_batch
    from pointcloududa_tpu.train.state import (
        build_models,
        build_optimizers,
        create_train_state,
    )
    from pointcloududa_tpu.train.step import make_train_step

    cfg = mscmrseg_default(
        filters=4, n_block=2, crop_size=32, fc_inch=9,
        d1=True, d2=True, d4=True, aug="heavy", bs=2,
    )
    raw = synthetic_raw_batch(cfg, 2)
    assert raw["img_s"].dtype == np.uint8 and raw["img_s"].shape == (2, 32, 32, 3)
    assert raw["vert_s"].max() > 1.5  # 0..255 scale, NOT pre-normalised
    pre = make_device_preprocess(cfg, train=True, device_augment=True)
    batch = pre(jax.random.PRNGKey(0), raw)
    state = create_train_state(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))
    state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(np.array(v)).all(), k


def test_vert_t_metric_off_skips_target_regen():
    """cfg.vert_t_metric=False: the MM-WHS regen preprocess produces
    vert_s but NOT vert_t, and the step runs without the logged-only
    ``ver_t_loss`` (the reference's never-backpropped loss_vert_target,
    ``src/train_mmwhs.py:257-258``) — all other metrics unchanged keys."""
    from pointcloududa_tpu.train.state import (
        build_models,
        build_optimizers,
        create_train_state,
    )
    from pointcloududa_tpu.train.step import make_train_step

    kw = dict(filters=4, n_block=2, crop_size=32, fc_inch=9,
              d2=True, d4=True, softmax=True, aug="light", bs=2)
    rng = np.random.default_rng(7)
    raw = {
        "img_s": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
        "mask_s": rng.integers(0, 5, size=(2, 32, 32)).astype(np.uint8),
        "img_t": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
        "mask_t": rng.integers(0, 5, size=(2, 32, 32)).astype(np.uint8),
    }
    keysets = {}
    for vt in (True, False):
        cfg = mmwhs_default(vert_t_metric=vt, **kw)
        pre = make_device_preprocess(cfg, train=True, device_augment=True)
        batch = pre(jax.random.PRNGKey(0), raw)
        assert "vert_s" in batch
        assert ("vert_t" in batch) == vt
        state = create_train_state(cfg, jax.random.PRNGKey(1))
        step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))
        _, metrics = step(state, batch)
        assert ("ver_t_loss" in metrics) == vt
        for k, v in metrics.items():
            assert np.isfinite(np.array(v)).all(), k
        keysets[vt] = set(metrics) - {"ver_t_loss"}
    assert keysets[True] == keysets[False]


def test_vert_t_every_cadence_is_logged_only():
    """``vert_t_every=N``: the target chamfer diagnostic is computed only on
    steps where ``step % N == 0``, its sampled values are IDENTICAL to the
    every-step run's, and skipping it never changes the training trajectory
    (the reference ``.item()``-logs loss_vert_target without backward,
    ``src/train_mmwhs.py:257-258``)."""
    from pointcloududa_tpu.train.state import (
        build_models,
        build_optimizers,
        create_train_state,
    )
    from pointcloududa_tpu.train.step import make_train_step

    kw = dict(filters=4, n_block=2, crop_size=32, fc_inch=9,
              d2=True, d4=True, softmax=True, aug="light", bs=2)
    rng = np.random.default_rng(11)
    raws = []
    for _ in range(4):
        raws.append({
            "img_s": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
            "mask_s": rng.integers(0, 5, size=(2, 32, 32)).astype(np.uint8),
            "img_t": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
            "mask_t": rng.integers(0, 5, size=(2, 32, 32)).astype(np.uint8),
        })

    def run(every):
        cfg = mmwhs_default(vert_t_every=every, **kw)
        pre = make_device_preprocess(cfg, train=True, device_augment=True)
        state = create_train_state(cfg, jax.random.PRNGKey(1))
        step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))
        aug_rng = jax.random.PRNGKey(2)
        per_step = []
        for i, raw in enumerate(raws):
            aug_rng, r = jax.random.split(aug_rng)
            with_vt = every <= 1 or i % every == 0
            batch = pre(r, raw, with_vert_t=with_vt)
            assert ("vert_t" in batch) == with_vt
            state, metrics = step(state, batch)
            per_step.append(jax.device_get(metrics))
        return state, per_step

    state_1, steps_1 = run(1)
    state_3, steps_3 = run(3)
    # trajectory bit-identical: the diagnostic feeds no gradient
    for a, b in zip(jax.tree.leaves(state_1.gen.params), jax.tree.leaves(state_3.gen.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for i, (m1, m3) in enumerate(zip(steps_1, steps_3)):
        assert "ver_t_loss" in m1
        assert ("ver_t_loss" in m3) == (i % 3 == 0)
        for k in m3:
            np.testing.assert_array_equal(
                np.asarray(m1[k]), np.asarray(m3[k]), err_msg=f"step {i} {k}"
            )


def test_vert_t_every_trainer_epoch_mean(tmp_path):
    """Trainer-level wiring: with ``vert_t_every=2`` an epoch runs green and
    the returned ``ver_t_loss`` epoch metric averages ONLY the sampled steps
    (key-union aggregation); all other epoch keys are intact."""
    from pointcloududa_tpu.train.loop import UDATrainer

    cfg = mmwhs_default(
        filters=4, n_block=2, crop_size=32, fc_inch=9, d2=True, d4=True,
        softmax=True, aug="light", bs=2, ns=6, epochs=1, vert_t_every=2,
    )
    rng = np.random.default_rng(13)

    class _Iter:
        steps_per_epoch = 3

        def epoch(self):
            for _ in range(3):
                yield {
                    "img_s": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
                    "mask_s": rng.integers(0, 5, size=(2, 32, 32)).astype(np.uint8),
                    "img_t": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
                    "mask_t": rng.integers(0, 5, size=(2, 32, 32)).astype(np.uint8),
                }

    trainer = UDATrainer(
        cfg, _Iter(), {}, workdir=str(tmp_path / "w"), logdir=str(tmp_path / "r")
    )
    tr = trainer.train_epoch()
    assert np.isfinite(tr["ver_t_loss"])  # mean over steps 0 and 2 only
    for k in ("seg_loss", "adv_loss", "ver_s_loss", "seg_dice", "dis2_acc1"):
        assert k in tr and np.isfinite(tr[k]), k


def test_vert_t_every_validation():
    import pytest

    with pytest.raises(ValueError):
        mmwhs_default(vert_t_every=0)


def test_main_dispatcher_help():
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "pointcloududa_tpu", "--help"],
        capture_output=True,
        text=True,
    )
    assert "train-mscmrseg" in r.stdout
