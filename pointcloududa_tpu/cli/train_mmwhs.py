"""MM-WHS (MR -> CT) whole-heart UDA training CLI.

Flag set mirrors reference ``src/train_mmwhs.py:815-872`` (~45 flags incl.
softmax-CE, per-loss adversarial weights, d4aux, etpls/Tetpls, ext* model
growth, per-discriminator momentum), plus TPU-native extras. The reference's
``-multicuda`` 2-GPU split is obsolete on TPU (SURVEY.md §2.6) — scale-out
is ``-ndev`` over the data mesh. After training, the best checkpoint is
auto-evaluated on the CT test volumes (``train_mmwhs.py:680-686``).
"""

from __future__ import annotations

import argparse

from pointcloududa_tpu import config as _config
from pointcloududa_tpu.config import appendix


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # general
    p.add_argument("-bs", type=int, default=16)
    p.add_argument("-ns", type=int, default=2000)
    p.add_argument("-e", type=int, default=200)
    p.add_argument("-offdecay", help="whether NOT to decay the unet lr", action="store_false")
    p.add_argument("-apdx", type=str, default="train_point_tpu")
    p.add_argument("-load_weight", action="store_true")
    p.add_argument("-he", help="He initialiser", action="store_true")
    p.add_argument("-cvinit", help="constant-variance initialiser", action="store_true")
    p.add_argument("-data_dir", type=str, default="./input")
    # data augmentation
    p.add_argument("-aug", help="'', 'heavy' or 'light'", type=str, default="")
    p.add_argument("-mh", help="histogram matching", action="store_true")
    # unet
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-lr_fix", type=float, default=1e-3)
    p.add_argument("-sgd", help="SGD for the unet instead of Adam", action="store_true")
    p.add_argument("-nf", help="base filters", type=int, default=32)
    p.add_argument("-d4aux", help="train the point head without D4", action="store_true")
    p.add_argument("-drop", help="decoder dropout", action="store_true")
    p.add_argument("-softmax", help="softmax+CE instead of sigmoid+BCE", action="store_true")
    p.add_argument("-etpls", help="entropy minimisation on source", action="store_true")
    p.add_argument("-Tetpls", help="entropy minimisation on target", action="store_true")
    p.add_argument("-mmt", help="unet SGD momentum", type=float, default=0.95)
    # discriminators
    p.add_argument("-d1", action="store_true")
    p.add_argument("-d2", action="store_true")
    p.add_argument("-d4", action="store_true")
    p.add_argument("-d1lr", type=float, default=2.5e-5)
    p.add_argument("-d2lr", type=float, default=2.5e-5)
    p.add_argument("-d4lr", type=float, default=2.5e-5)
    p.add_argument("-ft", help="feature transform in PointNet D4", action="store_true")
    p.add_argument("-dmmt", type=float, default=0.95)
    p.add_argument("-d1mmt", type=float, default=0.95)
    p.add_argument("-d2mmt", type=float, default=0.95)
    p.add_argument("-d4mmt", type=float, default=0.95)
    # model growth
    p.add_argument("-extpn", action="store_true")
    p.add_argument("-extd1", action="store_true")
    p.add_argument("-extd2", action="store_true")
    p.add_argument("-extd4", action="store_true")
    # loss weights
    p.add_argument("-dr", type=float, default=0.01)
    p.add_argument("-wp", type=float, default=1.0)
    p.add_argument("-w1", type=float, default=1.0)
    p.add_argument("-w2", type=float, default=1.0)
    p.add_argument("-w4", type=float, default=1.0)
    # TPU-native extras
    p.add_argument("-dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("-ndev", type=int, default=0)
    p.add_argument(
        "-no_vert_t_metric",
        help="skip the logged-only target-domain chamfer diagnostic (the "
        "reference's loss_vert_target is .item()-logged, never backpropped); "
        "with -aug and the point head on MM-WHS this also skips the per-step "
        "on-device TARGET cloud regen (~21 ms/batch, docs/SCALING.md)",
        action="store_true",
    )
    p.add_argument(
        "-vert_t_every",
        help="cadence of that diagnostic: compute it every N steps (1 = "
        "every step = reference parity; N=10 keeps a 1/N-subsampled log "
        "series at ~1/N of its cost — recommended MM-WHS production "
        "setting, docs/SCALING.md)",
        type=int,
        default=1,
    )
    p.add_argument(
        "-no_packed",
        help="disable the s2d-packed level-0 layout (ops/packed.py; numerically "
        "equivalent, measured +46%% step throughput on TPU)",
        action="store_true",
    )
    p.add_argument("-workdir", type=str, default="weights")
    p.add_argument("-logdir", type=str, default="runs")
    p.add_argument("-workers", type=int, default=4)
    p.add_argument(
        "-dist",
        help="multi-host: call jax.distributed.initialize() before building "
        "the mesh (see train_mscmrseg -dist)",
        action="store_true",
    )
    p.add_argument("-max_hours", type=float, default=24.0)
    p.add_argument("-patience", help="early stopping patience (0=off)", type=int, default=0)
    p.add_argument("-skip_final_eval", action="store_true")
    p.add_argument(
        "-resume",
        type=str,
        default="",
        help="path for periodic full train-state snapshots; restores from it "
        "when present (crash recovery)",
    )
    p.add_argument("-save_every", help="epochs between -resume snapshots", type=int, default=1)
    return p


def config_from_args(args) -> "UDAConfig":
    assert args.aug in ("", "heavy", "light")
    # late-bound through the config module (see train_mscmrseg.py note)
    return _config.mmwhs_default(
        bs=args.bs,
        ns=args.ns,
        epochs=args.e,
        offdecay=args.offdecay,
        apdx=args.apdx,
        load_weight=args.load_weight,
        heinit=args.he,
        cvinit=args.cvinit,
        data_dir=args.data_dir,
        aug=args.aug,
        mh=args.mh,
        lr=args.lr,
        lr_fix=args.lr_fix,
        sgd=args.sgd,
        filters=args.nf,
        d4aux=args.d4aux,
        drop=args.drop,
        softmax=args.softmax,
        etpls=args.etpls,
        Tetpls=args.Tetpls,
        mmt=args.mmt,
        d1=args.d1,
        d2=args.d2,
        d4=args.d4,
        d1lr=args.d1lr,
        d2lr=args.d2lr,
        d4lr=args.d4lr,
        ft=args.ft,
        dmmt=args.dmmt,
        d1mmt=args.d1mmt,
        d2mmt=args.d2mmt,
        d4mmt=args.d4mmt,
        extpn=args.extpn,
        extd1=args.extd1,
        extd2=args.extd2,
        extd4=args.extd4,
        dr=args.dr,
        wp=args.wp,
        w1=args.w1,
        w2=args.w2,
        w4=args.w4,
        compute_dtype=args.dtype,
        num_devices=args.ndev,
        max_hours=args.max_hours,
        patience=args.patience,
        vert_t_metric=not args.no_vert_t_metric,
        vert_t_every=args.vert_t_every,
        packed_level0=not args.no_packed,
        packed_compute=not args.no_packed,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    print(appendix(cfg))

    import jax

    from pointcloududa_tpu.data.build import build_mmwhs_pipelines
    from pointcloududa_tpu.parallel import create_mesh, init_distributed, trainer_row_shard
    from pointcloududa_tpu.train.checkpoint import restore_net_state
    from pointcloududa_tpu.train.loop import UDATrainer

    if args.dist:
        init_distributed()
    mesh = create_mesh(cfg.num_devices)
    row_shard = trainer_row_shard(mesh, cfg.bs)
    workdir, logdir = args.workdir, args.logdir
    if jax.process_count() > 1 and jax.process_index() != 0:
        # rank 0 owns the real dirs; the rest write identical checkpoints
        # to scratch so concurrent saves never collide (see train_mscmrseg)
        import os as _os

        workdir = _os.path.join(workdir, f".rank{jax.process_index()}")
        logdir = _os.path.join(logdir, f".rank{jax.process_index()}")
    train_iter, val_iters, device_augment = build_mmwhs_pipelines(
        cfg, workers=args.workers, row_shard=row_shard
    )
    trainer = UDATrainer(
        cfg,
        train_iter,
        val_iters,
        workdir=workdir,
        logdir=logdir,
        mesh=mesh,
        device_augment=device_augment,
    )
    if cfg.load_weight:
        trainer.state = trainer.state.replace(
            gen=restore_net_state(trainer.ckpt_gen.model_name, trainer.state.gen)
        )
        for cb, name in (
            (trainer.ckpt_d1, "d1"),
            (trainer.ckpt_d2, "d2"),
            (trainer.ckpt_d4, "d4"),
        ):
            if cb is not None:
                net = getattr(trainer.state, name)
                trainer.state = trainer.state.replace(
                    **{name: restore_net_state(cb.model_name, net)}
                )
        print("warm restart: model+optimizer states restored")
        # pre-train validation after the restore (train_mmwhs.py:584-600)
        trainer.initial_validation()
    import os

    start_epoch = 1
    if args.resume and os.path.exists(args.resume):
        start_epoch = trainer.restore_full(args.resume)
        print(f"full train state resumed from {args.resume}; continuing at epoch {start_epoch}")
    trainer.fit(
        start_epoch=start_epoch,
        save_full_every=args.save_every if args.resume else 0,
        save_full_path=args.resume or None,
    )

    if not args.skip_final_eval and trainer.ckpt_gen.final_best_path:
        # auto-evaluate the best checkpoint (train_mmwhs.py:680-686)
        from pointcloududa_tpu.eval.volume import evaluate_mmwhs

        best = restore_net_state(trainer.ckpt_gen.final_best_path, trainer.state.gen)
        print("Evaluate the best model:", trainer.ckpt_gen.final_best_path)
        evaluate_mmwhs(cfg, trainer.gen, best, data_dir=cfg.data_dir)


if __name__ == "__main__":
    main()
