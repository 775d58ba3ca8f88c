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


def _read_metrics(logdir):
    import json
    import os

    recs = {}
    for root, _, files in os.walk(logdir):
        for f in files:
            if f == "metrics.jsonl":
                with open(os.path.join(root, f)) as fh:
                    for line in fh:
                        r = json.loads(line)
                        recs.setdefault(r["step"], {}).update(
                            {k: v for k, v in r.items() if k not in ("step", "time")}
                        )
    return recs


def test_kill_and_resume_reproduces_trajectory(tmp_path):
    """A run killed after a periodic full snapshot and resumed via
    fit(start_epoch=...) must reproduce the uninterrupted run's per-epoch
    metric trajectory, including the lr-decay schedule (decay_e=2 fires at
    the snapshot epoch, so the resume must pick up the POST-decay lr)."""
    mk = lambda tag: UDATrainer(  # noqa: E731
        mscmrseg_default(**{**TINY, "epochs": 4}, d2=True, decay_e=2),
        _SynthIter(mscmrseg_default(**{**TINY, "epochs": 4})),
        {"val": _val(cfg_v), "val_lge": _val(cfg_v), "test_lge": _val(cfg_v)},
        workdir=str(tmp_path / f"w_{tag}"),
        logdir=str(tmp_path / f"r_{tag}"),
    )
    cfg_v = mscmrseg_default(**TINY)

    t_full = mk("full")
    t_full.fit()

    snap = str(tmp_path / "snap")
    t_a = mk("a")
    t_a.fit(epochs=2, save_full_every=2, save_full_path=snap)  # "killed" after e2

    t_b = mk("b")
    start = t_b.restore_full(snap)
    assert start == 3
    assert t_b._lr == t_a._lr  # post-decay lr carried over
    t_b.fit(start_epoch=start)

    want = _read_metrics(tmp_path / "r_full")
    got = _read_metrics(tmp_path / "r_b")
    assert sorted(got) == [3, 4]
    for epoch in (3, 4):
        for k, v in want[epoch].items():
            np.testing.assert_allclose(
                got[epoch][k], v, rtol=1e-5, atol=1e-6, err_msg=f"epoch {epoch} {k}"
            )
    # the resumed run's best matches the uninterrupted run's
    assert t_b.best["epoch"] == t_full.best["epoch"]
    np.testing.assert_allclose(t_b.best["val_lge_dice"], t_full.best["val_lge_dice"], rtol=1e-5)


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
