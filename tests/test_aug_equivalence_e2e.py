"""Device-aug vs host-aug equivalence gates (r3 VERDICT item 5).

The two augmentation implementations — ``ops/augment.py`` (on-device, the
default) and ``ops/host_augment.py`` (the ``-host_aug`` CLI path, the
cv2/numpy twin of the reference's imgaug pipeline,
``src/data_generator_mscmrseg.py:20-84``) — share one ``AugmentConfig``
and per-op golden tests, but until r4 nothing compared them at the
DISTRIBUTION level. Two gates, strongest-available while the imgaug
golden A/B stays blocked (no package installs, no network egress —
TODO.md):

1. ``test_augment_twins_distribution_moments`` — training-free A/B
   (tools/calibrate_aug_equiv.py ``moment_probe``): N batches through
   both twins at the same heavy AugmentConfig, asserting every aggregate
   statistic (image mean/std, deformation magnitude, pixels-changed,
   foreground retention, mask-changed rate) agrees within a few standard
   errors of the two-sample mean gap. This is the gate with resolving
   power: a systematic mismatch (wrong gate probability, wrong parameter
   range, wrong order semantics) shifts at least one stat by many se.
   Measured (r4, N=150): worst stat gap 0.8 se.

2. ``test_device_vs_host_augment_e2e_band`` (slow) — the e2e training
   comparison the VERDICT asked for: same supervised task trained through
   both pipelines, seed-mean best-Dice gap inside the calibrated band.
   Measured honestly (tool docstring table): the toy task under heavy
   augmentation is chaotic (per-arm seed std ~0.3 — the same fp-epsilon
   chaos both quality gates document), so this band is wide; the
   distributional equivalence claim is carried by gate 1, this gate
   pins that both pipelines TRAIN equivalently well at the seed-mean
   level and would catch only gross divergence.

The arms draw from different RNG streams by construction (jax PRNG vs
numpy Generator) — per-seed/per-draw values can never be compared
directly; only aggregates can and must match.
"""

import numpy as np
import pytest

from tools.calibrate_aug_equiv import make_arm, moment_probe, run_arm

MOMENT_SE_BOUND = 4.0  # measured worst 0.8 se (N=150); bug-scale shifts are >> this
E2E_SEEDS = tuple(range(9))
E2E_STEPS = 400
# calibrated (r4, 9 seeds): means 0.628 (device) vs 0.656 (host), mean gap
# -0.028 with two-sample se 0.072 (the first 3 seeds alone read -0.161 —
# sign flips at seeds 3-8: chaos). Band = |gap| + 2 se, rounded up.
E2E_GAP_BAND = 0.18


def test_augment_twins_distribution_moments():
    table = moment_probe(n_batches=60)
    worst = {}
    for k, (dv, hv) in table.items():
        pooled = np.sqrt((dv.std() ** 2 + hv.std() ** 2) / 2) + 1e-12
        se = pooled * np.sqrt(2.0 / len(dv))
        worst[k] = abs(dv.mean() - hv.mean()) / se
    assert max(worst.values()) <= MOMENT_SE_BOUND, worst


@pytest.mark.slow
def test_device_vs_host_augment_e2e_band():
    arms = {True: make_arm(True), False: make_arm(False)}
    best = {}
    for device_aug in (True, False):
        for seed in E2E_SEEDS:
            b = run_arm(arms[device_aug], seed, E2E_STEPS)
            assert np.isfinite(b), (device_aug, seed)
            best[(device_aug, seed)] = b
    dev = float(np.mean([best[(True, s)] for s in E2E_SEEDS]))
    hst = float(np.mean([best[(False, s)] for s in E2E_SEEDS]))
    assert dev > 0.4 and hst > 0.4, (dev, hst, best)
    assert abs(dev - hst) <= E2E_GAP_BAND, (dev, hst, best)
