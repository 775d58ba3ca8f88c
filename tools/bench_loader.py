#!/usr/bin/env python
"""Host data-feed throughput: can the loader keep N chips fed?

The r2 VERDICT flagged the host feed as unmeasured risk: at ~340
slices/s/chip (bs16 packed MS-CMRSeg step), an 8-chip v5e needs ~2,700
decoded+assembled slices/s from the host. This tool measures the actual
feed rate of `data/loader.py`'s pipeline on fabricated-but-realistic data
(224x224 PNG slices / 256x256 float npys, the production formats) and
prints the feed-vs-demand headroom.

Paths measured (slices/s, per worker-count):
  png          MS-CMRSeg decode + assemble (device-augment fast path —
               the production default: host ships raw uint8)
  png+hostaug  + the cv2 host-augmentation twin (the -host_aug fallback)
  npy          MM-WHS float32 slice decode + assemble
  npy+regen    + host point-cloud regen (the host_cloud_regen fallback;
               the default regenerates on device)

Results land in docs/SCALING.md's feed-vs-demand table.

Usage: python tools/bench_loader.py [--workers 0 1 4 8] [--slices 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pointcloududa_tpu.data.loader import BatchAssembler  # noqa: E402
from pointcloududa_tpu.data.mscmrseg import MSCMRSegAdapter  # noqa: E402
from pointcloududa_tpu.data.mmwhs import MMWHSAdapter  # noqa: E402


def fabricate(root: str, n: int):
    """n MS-CMRSeg PNG slices + n MM-WHS npy slices with realistic content
    (structured masks, noisy anatomy — PNG deflate cost depends on entropy)."""
    import cv2

    rng = np.random.default_rng(0)
    for sub in ("processed/trainA", "processed/trainAmask", "vertices/trainA"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    mm = os.path.join(root, "PnpAda_release_data", "mr_train")
    for sub in ("img", "mask", "vertices"):
        os.makedirs(os.path.join(mm, sub), exist_ok=True)
    ids = []
    for i in range(n):
        _id = f"bench_{i}"
        ids.append(_id)
        img = rng.integers(0, 255, size=(224, 224, 3)).astype(np.uint8)
        img[60:160, 60:160] //= 2  # structure, so deflate finds runs
        mask = np.zeros((224, 224), np.uint8)
        mask[80:140, 80:140] = 85
        mask[95:125, 95:125] = 212
        mask[105:115, 105:115] = 255
        cv2.imwrite(os.path.join(root, "processed/trainA", f"{_id}.png"), img)
        cv2.imwrite(os.path.join(root, "processed/trainAmask", f"{_id}.png"), mask)
        np.save(os.path.join(root, "vertices/trainA", f"{_id}.npy"),
                rng.random((300, 3)).astype(np.float32) * 224)
        np.save(os.path.join(mm, "img", f"{_id}.npy"),
                rng.normal(size=(256, 256, 3)).astype(np.float32))
        m = np.zeros((256, 256, 1), np.uint8)
        m[90:160, 90:160] = 2
        np.save(os.path.join(mm, "mask", f"{_id}.npy"), m)
        np.save(os.path.join(mm, "vertices", f"{_id}.npy"),
                rng.random((300, 3)).astype(np.float32) * 255)
    return ids


def measure(assembler, n_items: int, bs: int, repeats: int = 3) -> float:
    """Best-of-repeats slices/s through the assembler."""
    rng = np.random.default_rng(1)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        done = 0
        while done < n_items:
            idx = [(done + j) % n_items for j in range(bs)]
            assembler(idx, rng)
            done += bs
        dt = time.perf_counter() - t0
        best = max(best, done / dt)
    return best


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workers", nargs="*", type=int, default=[0, 2, 4, 8])
    p.add_argument("--slices", type=int, default=256)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--demand-per-chip", type=float, default=340.0,
                   help="measured train slices/s/chip (bench.py)")
    p.add_argument("--chips", type=int, default=8)
    args = p.parse_args(argv)

    from pointcloududa_tpu.ops.host_augment import make_host_augment

    ncores = os.cpu_count() or 1
    print(f"host: {ncores} cores visible; measuring with --workers {args.workers}")
    with tempfile.TemporaryDirectory() as root:
        ids = fabricate(root, args.slices)
        ms_adapter = MSCMRSegAdapter(root, ids, source="source", phase="train")
        mm_adapter = MMWHSAdapter(root, ids, source="source", phase="train", load_vertices=True)
        aug_ms = make_host_augment("heavy")
        aug_mm = make_host_augment("light")
        rows = []
        for w in args.workers:
            rows.append((
                w,
                measure(BatchAssembler(ms_adapter, workers=w), args.slices, args.bs),
                measure(BatchAssembler(ms_adapter, workers=w, host_augment=aug_ms),
                        args.slices, args.bs),
                measure(BatchAssembler(mm_adapter, workers=w), args.slices, args.bs),
                measure(BatchAssembler(mm_adapter, workers=w, host_augment=aug_mm,
                                       regen_vertices=True), args.slices, args.bs),
            ))
        print(f"\n{'workers':>8} {'png':>9} {'png+aug':>9} {'npy':>9} {'npy+regen':>10}  (slices/s)")
        for w, a, b, c, d in rows:
            print(f"{w:>8} {a:>9.0f} {b:>9.0f} {c:>9.0f} {d:>10.0f}")
        demand = args.demand_per_chip * args.chips
        best_png = max(r[1] for r in rows)
        print(
            f"\ndemand at {args.chips} chips x {args.demand_per_chip:.0f} "
            f"slices/s/chip = {demand:.0f} slices/s (x2: each UDA step "
            f"consumes a source AND a target slice per sample -> "
            f"{2 * demand:.0f} decoded slices/s)"
        )
        print(
            f"best png feed on this host: {best_png:.0f} slices/s on {ncores} "
            f"core(s) = {best_png / ncores:.0f} slices/s/core; a typical "
            f"{args.chips}-chip host (>=112 cores) extrapolates to "
            f"{best_png / ncores * 112:.0f} slices/s"
        )


if __name__ == "__main__":
    main()
