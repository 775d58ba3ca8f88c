#!/usr/bin/env python
"""Calibration harness for the D4 (point-cloud adversary) quality gate.

Searches for a synthetic two-domain task + hyperparameters where the
point-cloud adversary DEMONSTRABLY helps: best target Dice of
(D2+D4) > (D2) > (no UDA), mirroring the reference's MM-WHS headline
(D2 0.313 -> D2+D4 0.595, ``src/evaluate_mmwhs.py:221,224``).

Task design (geometry shift, not just intensity): both domains share the
same true-structure distribution (nested disks), but TARGET images also
contain a DISTRACTOR — a second nested-disk lookalike that is imaging
artifact, labelled background. Intensity/entropy alignment cannot reject
it (it is locally indistinguishable from the true structure), so
output/entropy-adapted models segment both blobs; the point-cloud
adversary sees the predicted target clouds as two-lobed — unlike the
compact single-structure source clouds — and pushes the features to
suppress the distractor. That is precisely the global-shape prior the
paper claims for its point-cloud alignment.

Usage (CPU, seeded):
  python tools/calibrate_d4.py --arms none d2 d2d4 --seeds 0 1 --steps 400
Prints one line per (arm, seed) with the best probe Dice.

Calibration record (r3, CPU backend, 400 steps, dr=0.05, best target Dice):

  disk distractor        seed0   seed1   seed2
    d2                   0.413   0.441   0.298
    d2d4                 0.547   0.730   0.330
    d4aux (no adversary) 0.812   0.811   0.499
  bar distractor (--shape bar)
    d2                   0.368   0.291
    d2d4                 0.384   0.841
    d4aux                0.820   0.750

(D2+D4) > (D2) on every seed/task/backend tested — the gate
(tests/test_d4_quality_gate.py) asserts the MEAN margin over disk
seeds 0 and 1. The d4aux control
usually scores higher still (source-side chamfer shaping transfers
strongly at this toy scale); the one case where the ADVERSARY beat
chamfer-only (bar/seed1: 0.841 vs 0.750) is the configuration whose
distractor shape signature lies entirely outside the source cloud
family — consistent with the paper's mechanism, but too seed-sensitive
at this scale to gate on.

--src_distractor attempt (r4, MEASURED REJECTION — the r3 VERDICT asked
whether the adversary can be shown to beat d4aux once source-transfer is
controlled for by rendering the lookalike in SOURCE images too, with
distractor-excluding GT masks and clouds). Best target Dice, 400 steps,
dr=0.05; TPU = dense probes every 50 from 100, CPU = sparse (200,300,400):

  TPU v5e (dense)       seed0   seed1   seed2   seed3   mean
    d2                  0.767   0.936   0.575   0.973   0.813
    d2d4                0.533   0.856   0.310   0.605   0.576
    d4aux               0.649   0.968   0.342   0.893   0.713
  CPU (sparse)
    d2                  0.757   0.935   0.581   0.837   0.778
    d2d4                0.888   0.110   0.287   0.707   0.498
    d4aux               0.670   0.863   0.460   0.478   0.618

Conclusion: the control variant REMOVES the mechanism the adversary is
for — once source GT itself teaches distractor rejection, the shape
prior is an ordinary supervised feature, plain d2 jumps (0.581-0.973 vs
0.298-0.441 on the original task), and the adversarial min-max pressure
only destabilizes (d2d4 loses to BOTH d2 and d4aux on the mean, on both
backends; seed1-CPU collapses outright, best 0.110). A (D2+D4) >
(D2+d4aux) margin cannot be isolated at toy scale this way; the
reference's real-data ablation (MM-WHS D2 0.313 -> D2+D4 0.595,
``src/evaluate_mmwhs.py:221,224``) remains the adversary's evidence.
Dense-vs-sparse probing was also controlled (--probe_every 50): it
rescues one trajectory's pre-collapse peak (CPU-style seed1 best 0.110
-> TPU 0.856) but does not change the ordering.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_shift_batch(rng, bs, size, distractor=True, shape="disk", n_class=4):
    """Source-style batch plus (optionally) a target-only distractor.

    Returns (imgs, onehot_mask, label_mask). The distractor reuses the
    true structure's rendering (same intensity profile) but is labelled
    background — only its GEOMETRY (a second blob => two-lobed shape)
    distinguishes it. ``shape="bar"`` renders the distractor as an
    elongated bar instead of a disk: a shape signature absent from the
    source cloud family entirely.
    """
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    imgs = np.empty((bs, size, size, 3), np.float32)
    masks = np.zeros((bs, size, size), np.int32)

    def render(lvl, cy, cx, r):
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        return lvl + 0.9 * (d < r) - 0.4 * (d < 0.6 * r) + 0.3 * (d < 0.3 * r), d

    def render_bar(lvl, cy, cx, r):
        # same nested intensity profile, anisotropic (4:1) support
        d = np.sqrt(((yy - cy) / 2.0) ** 2 + ((xx - cx) * 2.0) ** 2)
        return lvl + 0.9 * (d < r) - 0.4 * (d < 0.6 * r) + 0.3 * (d < 0.3 * r), d

    for b in range(bs):
        cy, cx = rng.uniform(0.30, 0.70, size=2) * size
        r = rng.uniform(0.12, 0.22) * size
        lvl = rng.normal(0.1, 0.05, size=(size, size)).astype(np.float32)
        lvl, d = render(lvl, cy, cx, r)
        if distractor:
            # distractor in the opposite half, same rendering, background GT
            dy = cy + (size / 2 if cy < size / 2 else -size / 2)
            dx = cx + (size / 2 if cx < size / 2 else -size / 2)
            dr_ = rng.uniform(0.10, 0.18) * size
            rfn = render_bar if shape == "bar" else render
            lvl, _ = rfn(lvl, dy, dx, dr_)
        imgs[b] = np.clip(lvl, 0, 1.3)[..., None].repeat(3, -1)
        masks[b][d < r] = 1
        masks[b][d < 0.6 * r] = 2
        masks[b][d < 0.3 * r] = 3
    onehot = np.eye(n_class, dtype=np.float32)[masks]
    return imgs, onehot, masks


def style_target(imgs, rng, contrast=0.55, shift=0.35, noise=0.06):
    return (imgs * contrast + shift + rng.normal(0, noise, imgs.shape)).astype(np.float32)


def run_arm(arm: str, seed: int, steps: int, size=32, bs=8, pool_n=6,
            dr=0.05, wp=1.0, d4lr=2.5e-5, shape="disk", probes=(200, 300, 400),
            src_distractor=False, verbose=False):
    import jax

    from pointcloududa_tpu.config import mscmrseg_default
    from pointcloududa_tpu.data.pointcloud import mask_to_point_cloud
    from pointcloududa_tpu.train.state import build_models, build_optimizers, create_train_state
    from pointcloududa_tpu.train.step import make_eval_step, make_train_step

    d2 = arm in ("d2", "d2d4", "d4aux")
    d4 = arm == "d2d4"
    cfg = mscmrseg_default(
        crop_size=size, fc_inch=9, n_block=2, filters=8, bs=bs,
        d2=d2, d4=d4, d4aux=(arm == "d4aux"), dr=dr, wp=wp, d4lr=d4lr,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(seed))
    models = build_models(cfg)
    step = make_train_step(cfg, models, build_optimizers(cfg))
    ev = make_eval_step(cfg, models[0])

    rng = np.random.default_rng(seed)
    point = cfg.point_head

    def clouds(label_masks):
        return (
            np.stack([mask_to_point_cloud(m, seed=0) for m in label_masks]).astype(np.float32)
            / 255.0
        )

    pool = []
    for _ in range(pool_n):
        # --src_distractor (r3 VERDICT item 3): the lookalike appears in the
        # SOURCE domain too, with correct distractor-excluding GT masks AND
        # clouds — so chamfer-aux supervision can no longer inject shape
        # information the segmentation CE doesn't already carry, and any
        # (d2d4 - d4aux) margin must come from the target-side adversary.
        img_s, mask_s, lab_s = make_shift_batch(
            rng, bs, size, distractor=src_distractor, shape=shape
        )
        img_t_src, mask_t, lab_t = make_shift_batch(rng, bs, size, distractor=True, shape=shape)
        img_t = style_target(img_t_src, rng)
        batch = {"img_s": img_s, "mask_s": mask_s, "img_t": img_t}
        tgt_eval = {"img": style_target(img_t_src, rng), "mask": mask_t}
        if point:
            batch["vert_s"] = clouds(lab_s)
            batch["vert_t"] = clouds(lab_t)
            tgt_eval["vert"] = batch["vert_t"]
        pool.append((batch, tgt_eval))

    best, last = 0.0, 0.0
    for i in range(steps):
        batch, _ = pool[i % len(pool)]
        state, m = step(state, batch)
        if not np.isfinite(float(m["seg_loss"])):
            return float("nan"), i
        if i + 1 in probes or i + 1 == steps:
            dice = float(np.mean([float(ev(state.gen, te)["dice"]) for _, te in pool]))
            best, last = max(best, dice), dice
            if verbose:
                extra = ""
                if d4:
                    extra = f" d4 {float(m['dis4_acc1']):.2f}/{float(m['dis4_acc2']):.2f}"
                print(f"  [{arm} s{seed}] step {i + 1} tgt_dice {dice:.3f} "
                      f"src_dice {float(m['seg_dice']):.3f}{extra}", flush=True)
    return best, last


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arms", nargs="+", default=["none", "d2", "d2d4"])
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1])
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--dr", type=float, default=0.05)
    p.add_argument("--wp", type=float, default=1.0)
    p.add_argument("--d4lr", type=float, default=2.5e-5)
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--shape", default="disk", choices=["disk", "bar"])
    p.add_argument(
        "--probe_every", type=int, default=0,
        help="probe every N steps from 100 (like the UDA gate's dense "
        "protocol — adversarial trajectories are non-monotone); default "
        "keeps the r3 sparse probes (200,300,400)",
    )
    p.add_argument(
        "--src_distractor", action="store_true",
        help="render the lookalike in SOURCE images too (GT-excluded): "
        "isolates the target-side adversary from source-transfer effects",
    )
    p.add_argument("-v", action="store_true")
    args = p.parse_args(argv)

    probes = (
        tuple(range(100, args.steps + 1, args.probe_every))
        if args.probe_every
        else (200, 300, 400)
    )
    for seed in args.seeds:
        for arm in args.arms:
            t0 = time.perf_counter()
            best, last = run_arm(
                arm, seed, args.steps, size=args.size, bs=args.bs,
                dr=args.dr, wp=args.wp, d4lr=args.d4lr, shape=args.shape,
                probes=probes,
                src_distractor=args.src_distractor, verbose=args.v,
            )
            print(
                f"arm={arm:5s} seed={seed} shape={args.shape} src_dis={int(args.src_distractor)} "
                f"dr={args.dr} wp={args.wp} d4lr={args.d4lr} "
                f"best={best:.3f} last={last:.3f} ({time.perf_counter() - t0:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
