"""MS-CMRSeg volume evaluation CLI (reference ``src/evaluate_mscmrseg.py``).

Evaluates a trained generator checkpoint on the 40 LGE test patients
(Dice/HD/ASD per structure). The checkpoint directory is the orbax dir
written by the trainer; model hyper-parameters come from flags (the
reference infers them by grepping the checkpoint FILENAME,
``evaluate_mscmrseg.py:249-259`` — supported here via ``-from_name``).
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-model_dir", type=str, required=True, help="orbax checkpoint dir")
    p.add_argument("-data_dir", type=str, default="./input")
    p.add_argument("-bs", type=int, default=8)
    p.add_argument("-klc", help="keep largest connected components", action="store_true")
    p.add_argument("-clahe", action="store_true")
    p.add_argument("-d4", help="checkpoint has the point head", action="store_true")
    p.add_argument("-from_name", help="infer flags from the checkpoint name", action="store_true")
    p.add_argument("-ifhd", type=int, default=1)
    p.add_argument("-ifasd", type=int, default=1)
    p.add_argument("-pat_lo", type=int, default=6)
    p.add_argument("-pat_hi", type=int, default=46)
    p.add_argument("-csv", type=str, default="")
    p.add_argument("-toplot", help="save input/pred/GT triptychs to this dir", type=str, default="")
    p.add_argument("-nf", type=int, default=32)
    p.add_argument("-dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument(
        "-no_packed",
        help="disable the s2d-packed level-0 layout (checkpoints are "
        "layout-independent; packed is faster on TPU)",
        action="store_true",
    )
    args = p.parse_args(argv)

    from pointcloududa_tpu.config import mscmrseg_default
    from pointcloududa_tpu.eval.volume import evaluate_mscmrseg
    from pointcloududa_tpu.train.checkpoint import restore_net_state
    from pointcloududa_tpu.train.state import build_models, create_train_state

    d4 = args.d4 or (args.from_name and ("d4lr" in args.model_dir or "d4aux" in args.model_dir))
    cfg = mscmrseg_default(
        filters=args.nf, d4=d4, compute_dtype=args.dtype, data_dir=args.data_dir,
        packed_level0=not args.no_packed,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    gen, *_ = build_models(cfg)
    net = restore_net_state(args.model_dir, state.gen)
    print("model loaded from", args.model_dir)
    evaluate_mscmrseg(
        cfg,
        gen,
        net,
        data_dir=args.data_dir,
        bs=args.bs,
        clahe=args.clahe,
        ifhd=bool(args.ifhd),
        ifasd=bool(args.ifasd),
        pat_id_range=(args.pat_lo, args.pat_hi),
        crop_size=cfg.crop_size,
        klc=args.klc,
        per_patient_csv=args.csv or None,
        plot_dir=args.toplot or None,
    )


if __name__ == "__main__":
    main()
