"""Quality-proxy gate: UDA (D1+D2) must beat no-UDA on target Dice.

The reference's headline result is that adversarial adaptation improves
target-domain Dice over source-only training (BASELINE.md: MS-CMRSeg
val-LGE 0.834 -> 0.849 with D1+D2, `src/evaluate_mscmrseg.py:251-253`).
The real datasets are unavailable in this environment, so this is the
closest runnable stand-in: a deterministic synthetic two-domain task
(bright nested disks; target = contrast-compressed + brightness-shifted +
noisier — tools/smoke_uda.py's family) where the source-only model
plateaus mid-range and output/entropy alignment recovers target accuracy.

Protocol mirrors the reference's evaluation: the score is the BEST probe
over training (the reference reports best-val-epoch checkpoints,
`src/utils/callbacks.py` mode=max). Calibration (r2, CPU, 400 steps,
dr=0.05): seed 0 no-UDA 0.508 vs UDA 0.564; seed 1 no-UDA 0.558 vs UDA
0.661. Everything is seeded, so CI reruns reproduce these values exactly
on the CPU backend; the asserted margin (+0.03) is well inside both.

dr=0.05 (not the real-data default 0.01) — the toy task needs a stronger
adversarial signal at this tiny scale; dr=0.2 destabilises (0.12).
Runtime: ~5-6 min on the 1-core CI box (the suite's longest test).
"""

import numpy as np
import pytest
import jax

from tools.smoke_train import make_batch
from pointcloududa_tpu.config import mscmrseg_default
from pointcloududa_tpu.train.state import build_models, build_optimizers, create_train_state
from pointcloududa_tpu.train.step import make_eval_step, make_train_step

SEED = 1
STEPS = 400
PROBES = (200, 300, 400)


def _style_target(imgs, rng):
    """Contrast compression + brightness shift + noise (milder than
    smoke_uda's full inversion, which zeroes both arms at this scale)."""
    return (imgs * 0.55 + 0.35 + rng.normal(0, 0.06, imgs.shape)).astype(np.float32)


def _run(uda: bool, size=32, bs=8):
    cfg = mscmrseg_default(
        crop_size=size, fc_inch=0, n_block=2, filters=8, bs=bs,
        d1=uda, d2=uda, dr=0.05,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(SEED))
    models = build_models(cfg)
    step = make_train_step(cfg, models, build_optimizers(cfg))
    ev = make_eval_step(cfg, models[0])
    rng = np.random.default_rng(SEED)
    pool = []
    for _ in range(6):
        img_s, mask_s = make_batch(rng, bs, size)
        img_t_src, mask_t = make_batch(rng, bs, size)
        pool.append(
            (
                {"img_s": img_s, "mask_s": mask_s, "img_t": _style_target(img_t_src, rng)},
                {"img": _style_target(img_t_src, rng), "mask": mask_t},
            )
        )
    best = 0.0
    for i in range(STEPS):
        batch, _ = pool[i % len(pool)]
        state, m = step(state, batch)
        assert np.isfinite(float(m["seg_loss"])), f"non-finite at step {i}"
        if i + 1 in PROBES:
            dice = float(np.mean([float(ev(state.gen, te)["dice"]) for _, te in pool]))
            best = max(best, dice)
    return best


@pytest.mark.slow
def test_uda_beats_no_uda_on_target_dice():
    no_uda = _run(False)
    uda = _run(True)
    # task sanity: source-only must land mid-range (not degenerate, not
    # saturated) for the comparison to mean anything
    assert 0.30 < no_uda < 0.80, f"task drifted: no-UDA best {no_uda:.3f}"
    assert uda > no_uda + 0.03, (
        f"UDA (D1+D2) best target dice {uda:.3f} does not beat "
        f"no-UDA {no_uda:.3f} by the calibrated margin"
    )
