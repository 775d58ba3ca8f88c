#!/usr/bin/env python
"""Convert the reference's released torch checkpoints to this framework.

The reference publishes its quality table as ``.pt`` files written by
``ModelCheckPointCallback`` (``src/utils/callbacks.py:75-80``) and keyed by
flag-encoding filenames (``src/evaluate_mscmrseg.py:244-256``). This tool
converts one (or a directory of) such files into Orbax checkpoint
directories that the evaluator CLIs and the trainers' warm-restart path
consume directly — so the author's own weights can be evaluated here
without retraining:

    python tools/import_torch_ckpt.py weights/best_..._Scr0.834.pt -out ckpt/
    python -m pointcloududa_tpu evaluate-mscmrseg -model_dir ckpt/ -klc

Network kind (generator / D1-D2 / D4) and every architecture flag are
inferred from the state_dict shapes; filename tags are parsed for
cross-checking and reported. The optimizer state is freshly initialised
(torch and optax moment layouts are not interchangeable; the evaluators
never read it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("pt", help=".pt file, or a directory of .pt files")
    p.add_argument("-out", required=True, help="output orbax dir (or parent dir when pt is a directory)")
    p.add_argument("-kind", choices=["auto", "generator", "discriminator", "pointnet"], default="auto")
    p.add_argument("-dtype", choices=["float32", "bfloat16"], default="float32")
    args = p.parse_args(argv)

    from pointcloududa_tpu.utils.torch_import import import_torch_checkpoint

    if os.path.isdir(args.pt):
        jobs = [
            (os.path.join(args.pt, f), os.path.join(args.out, os.path.splitext(f)[0]))
            for f in sorted(os.listdir(args.pt))
            if f.endswith(".pt")
        ]
        if not jobs:
            p.error(f"no .pt files in {args.pt}")
    else:
        jobs = [(args.pt, args.out)]

    for src, dst in jobs:
        summary = import_torch_checkpoint(
            src, dst, kind=None if args.kind == "auto" else args.kind, compute_dtype=args.dtype
        )
        print(f"imported {src} -> {dst}")
        print(json.dumps({k: v for k, v in summary.items() if k != "arch"}, indent=2, default=str))
        if "arch" in summary:
            print("inferred architecture:", summary["arch"])
        if "hint" in summary:
            print("evaluate with:", summary["hint"])


if __name__ == "__main__":
    main()
