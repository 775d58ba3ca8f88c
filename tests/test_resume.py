"""Full-state mid-run resume: a restored trainer continues with identical
state (params, optimizer, rng, lr, sampler cursors)."""

import numpy as np
import jax

from pointcloududa_tpu.config import mscmrseg_default
from pointcloududa_tpu.train.loop import UDATrainer

TINY = dict(filters=4, crop_size=32, fc_inch=0, bs=4, ns=8, epochs=2, aug="", n_block=2)


class _SynthIter:
    def __init__(self, cfg, steps=2):
        self.cfg, self.steps = cfg, steps
        self.steps_per_epoch = steps
        from pointcloududa_tpu.data.sampler import RingSampler

        self._src_sampler = RingSampler(10, cfg.bs, cfg.ns, shuffle_seed=0)
        self._tgt_sampler = RingSampler(10, cfg.bs, cfg.ns, shuffle_seed=1)

    def epoch(self):
        rng = np.random.default_rng(0)
        # advance the samplers so cursor state is non-trivial
        list(self._src_sampler.epoch())
        list(self._tgt_sampler.epoch())
        hw = self.cfg.crop_size
        for _ in range(self.steps):
            yield {
                "img_s": rng.integers(0, 255, size=(self.cfg.bs, hw, hw, 3)).astype(np.uint8),
                "mask_s": rng.integers(0, 4, size=(self.cfg.bs, hw, hw)).astype(np.uint8),
                "img_t": rng.integers(0, 255, size=(self.cfg.bs, hw, hw, 3)).astype(np.uint8),
            }


def _val(cfg):
    def make():
        rng = np.random.default_rng(1)
        hw = cfg.crop_size
        yield {
            "img": rng.integers(0, 255, size=(cfg.bs, hw, hw, 3)).astype(np.uint8),
            "mask": rng.integers(0, 4, size=(cfg.bs, hw, hw)).astype(np.uint8),
        }

    return make


def test_save_restore_full(tmp_path):
    cfg = mscmrseg_default(**TINY, d2=True)
    vals = {"val": _val(cfg), "val_lge": _val(cfg), "test_lge": _val(cfg)}
    t1 = UDATrainer(cfg, _SynthIter(cfg), vals, workdir=str(tmp_path / "w1"), logdir=str(tmp_path / "r1"))
    tr = t1.train_epoch()
    t1._lr = 123.0
    t1.best["val_lge_dice"] = 0.42
    t1.best["epoch"] = 1
    t1.save_full(str(tmp_path / "full"), epoch=1)

    t2 = UDATrainer(cfg, _SynthIter(cfg), vals, workdir=str(tmp_path / "w2"), logdir=str(tmp_path / "r2"))
    next_epoch = t2.restore_full(str(tmp_path / "full"))
    assert next_epoch == 2
    assert t2._lr == 123.0
    assert t2.best["val_lge_dice"] == 0.42
    # network + optimizer state identical
    a = jax.tree.leaves(t1.state)
    b = jax.tree.leaves(t2.state)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # sampler cursors carried over
    assert t2.train_iter._src_sampler.state()["cursor"] == t1.train_iter._src_sampler.state()["cursor"]
    # and both trainers produce identical next-epoch metrics
    m1 = t1.train_epoch()
    m2 = t2.train_epoch()
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-6, err_msg=k)
