#!/usr/bin/env python
"""Adversarial-path smoke: full UDA training mechanics on a synthetic
two-domain task.

Source domain: bright nested disks on dark noise (labelled). Target domain:
same geometry, inverted contrast + heavier noise (labels withheld from
training, used only to score target Dice). Runs the real triple-phase step
with D1+D2 (optionally +D4 with point clouds regenerated from masks) and
checks the mechanics:

- all losses stay finite through `--steps` steps,
- discriminators actually train (accuracy leaves 0.5 and stays in (0,1)),
- source Dice rises like the supervised smoke,
- target Dice is reported (expectation at this horizon is stability, not
  the paper's converged gains — those take the reference's 25k-step
  schedule).

  python tools/smoke_uda.py --steps 150 --d4
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.smoke_train import make_batch  # noqa: E402


def style_target(imgs, rng):
    """Invert contrast + extra noise: a crude 'other modality'."""
    out = 1.1 - imgs + rng.normal(0, 0.08, size=imgs.shape).astype(np.float32)
    return np.clip(out, 0, 1.3)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--pool", type=int, default=12, help="pre-generated batches to cycle")
    p.add_argument("--d4", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--packed", action=argparse.BooleanOptionalAction, default=True,
                   help="s2d-packed level-0 path (the production default; ops/packed.py)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointcloududa_tpu.config import mscmrseg_default
    from pointcloududa_tpu.data.pointcloud import mask_to_point_cloud
    from pointcloududa_tpu.train.state import build_models, build_optimizers, create_train_state
    from pointcloududa_tpu.train.step import make_eval_step, make_train_step

    cfg = mscmrseg_default(
        crop_size=args.size,
        fc_inch=81 if args.size == 224 else 1,
        bs=args.bs,
        d1=True,
        d2=True,
        d4=args.d4,
        compute_dtype=args.dtype,
        packed_level0=args.packed, packed_compute=args.packed,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    models = build_models(cfg)
    step = make_train_step(cfg, models, build_optimizers(cfg))
    eval_step = make_eval_step(cfg, models[0])

    rng = np.random.default_rng(0)
    pool = []
    for _ in range(args.pool):
        img_s, mask_s = make_batch(rng, args.bs, args.size)
        img_t_src, mask_t = make_batch(rng, args.bs, args.size)
        img_t = style_target(img_t_src, rng)
        batch = {"img_s": img_s, "mask_s": mask_s, "img_t": img_t}
        if args.d4:
            lab_s = np.argmax(mask_s, -1)
            lab_t = np.argmax(mask_t, -1)
            # this smoke feeds the step directly (no device preprocess), so
            # apply the /255 vertex normalisation here (the pipeline's job)
            batch["vert_s"] = (
                np.stack([mask_to_point_cloud(m, seed=0) for m in lab_s]).astype(np.float32) / 255.0
            )
            batch["vert_t"] = (
                np.stack([mask_to_point_cloud(m, seed=0) for m in lab_t]).astype(np.float32) / 255.0
            )
        tgt_eval = {"img": img_t, "mask": mask_t}
        if args.d4:
            tgt_eval["vert"] = batch["vert_t"]
        pool.append((batch, tgt_eval))

    t0 = time.perf_counter()
    ok = True
    for i in range(args.steps):
        batch, tgt_eval = pool[i % len(pool)]
        state, m = step(state, batch)
        if i % 25 == 0 or i == args.steps - 1:
            te = eval_step(state.gen, tgt_eval)
            vals = {k: float(v) for k, v in m.items()}
            tgt_dice = float(te["dice"])
            print(
                f"step {i:4d} seg_loss {vals['seg_loss']:.4f} adv {vals['adv_loss']:.4f} "
                f"src_dice {vals['seg_dice']:.3f} tgt_dice {tgt_dice:.3f} "
                f"d1 {vals['dis1_acc1']:.2f}/{vals['dis1_acc2']:.2f} "
                f"d2 {vals['dis2_acc1']:.2f}/{vals['dis2_acc2']:.2f}"
                + (f" d4 {vals['dis4_acc1']:.2f}/{vals['dis4_acc2']:.2f}" if args.d4 else "")
            )
            if not all(np.isfinite(v) for v in vals.values()):
                ok = False
                break
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt:.1f}s ({args.steps * args.bs / dt:.0f} slices/s)")
    src_dice = float(m["seg_dice"])
    if not ok:
        print("FAIL: non-finite metrics")
        sys.exit(1)
    if src_dice < 0.5:
        print(f"FAIL: source dice {src_dice:.3f} < 0.5")
        sys.exit(1)
    print(f"PASS: finite adversarial training, source dice {src_dice:.3f}")


if __name__ == "__main__":
    main()
