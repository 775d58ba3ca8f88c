"""MM-WHS CT volume evaluation CLI (reference ``src/evaluate_mmwhs.py``).

Evaluates a generator checkpoint on the 4 CT test patients
[1003, 1008, 1014, 1019] with 2.5-D stacking + KLC. Architecture flags can
be inferred from the checkpoint name (the reference parses the filename,
``evaluate_mmwhs.py:231-253``).
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-weight_dir", type=str, required=True, help="orbax checkpoint dir")
    p.add_argument("-data_dir", type=str, default="./input")
    p.add_argument("-bs", type=int, default=8)
    p.add_argument("-d4", action="store_true")
    p.add_argument("-extpn", action="store_true")
    p.add_argument("-from_name", action="store_true")
    p.add_argument("-ifhd", type=int, default=1)
    p.add_argument("-ifasd", type=int, default=1)
    p.add_argument("-nf", type=int, default=32)
    p.add_argument("-dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument(
        "-no_packed",
        help="disable the s2d-packed level-0 layout (checkpoints are "
        "layout-independent; packed is faster on TPU)",
        action="store_true",
    )
    p.add_argument("-save", help="append per-patient rows to a csv", action="store_true")
    p.add_argument("-model_name", type=str, default="")
    p.add_argument("-csv", type=str, default="evaluation_of_models_tf.csv")
    p.add_argument("-toplot", help="save input/pred/GT triptychs to this dir", type=str, default="")
    p.add_argument(
        "-pat_ids", nargs="+", type=int, default=[1003, 1008, 1014, 1019],
        help="CT test patient ids (the reference's fixed four, "
        "evaluate_mmwhs.py:60)",
    )
    args = p.parse_args(argv)

    from pointcloududa_tpu.config import mmwhs_default
    from pointcloududa_tpu.eval.volume import evaluate_mmwhs
    from pointcloududa_tpu.train.checkpoint import restore_net_state
    from pointcloududa_tpu.train.state import build_models, create_train_state

    name = args.weight_dir
    d4 = args.d4 or (args.from_name and "d4lr" in name)
    extpn = args.extpn or (args.from_name and "extpn" in name)
    if args.from_name:
        tags = [t for t in ("d1lr", "d2lr", "d4lr", "softmax", "etpls", "Tetpls") if t in name]
        print("model:", ".".join(tags) if tags else "(plain unet)")
    cfg = mmwhs_default(
        filters=args.nf, d4=d4, extpn=extpn, compute_dtype=args.dtype, data_dir=args.data_dir,
        packed_level0=not args.no_packed,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    gen, *_ = build_models(cfg)
    net = restore_net_state(args.weight_dir, state.gen)
    print("model loaded from", args.weight_dir)
    evaluate_mmwhs(
        cfg,
        gen,
        net,
        data_dir=args.data_dir,
        bs=args.bs,
        ifhd=bool(args.ifhd),
        ifasd=bool(args.ifasd),
        pat_ids=tuple(args.pat_ids),
        per_patient_csv=args.csv if args.save else None,
        model_name=args.model_name,
        plot_dir=args.toplot or None,
    )


if __name__ == "__main__":
    main()
