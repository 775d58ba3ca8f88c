"""MS-CMRSeg (bSSFP -> LGE) UDA training CLI.

Flag set mirrors reference ``src/train_mscmrseg.py:675-697`` (including the
store_false semantics of ``-aug``/``-offdecay``), plus TPU-native extras
(``-dtype``, ``-ndev``, ``-workdir``, ``-logdir``, ``-host_aug``,
``-workers``).

Usage:
  python -m pointcloududa_tpu.cli.train_mscmrseg -bs 16 -ns 2000 -e 200 \
      -d1 -d2 -d4 -data_dir ./input_aug
"""

from __future__ import annotations

import argparse

from pointcloududa_tpu import config as _config
from pointcloududa_tpu.config import appendix


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-aug", help="whether NOT to augment the data", action="store_false")
    p.add_argument("-aug2", help="augment with the 2nd (medium) method", action="store_true")
    p.add_argument("-load_weight", action="store_true")
    p.add_argument("-bs", type=int, default=16)
    p.add_argument("-ns", help="samples per epoch", type=int, default=2000)
    p.add_argument("-e", help="number of epochs", type=int, default=200)
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-lr_fix", type=float, default=1e-3)
    p.add_argument("-offdecay", help="whether NOT to decay the unet lr", action="store_false")
    p.add_argument("-decay_e", type=int, default=50)
    p.add_argument("-apdx", type=str, default="train_point_tpu")
    p.add_argument("-d1", help="output-space discriminator", action="store_true")
    p.add_argument("-d2", help="entropy discriminator", action="store_true")
    p.add_argument("-d4", help="point-cloud discriminator", action="store_true")
    p.add_argument("-d1lr", type=float, default=2.5e-5)
    p.add_argument("-d2lr", type=float, default=2.5e-5)
    p.add_argument("-d4lr", type=float, default=2.5e-5)
    p.add_argument("-dr", help="discriminator loss ratio for the unet", type=float, default=0.01)
    p.add_argument("-wp", help="point-cloud loss weight", type=float, default=1.0)
    p.add_argument("-data_dir", type=str, default="./input_aug")
    # TPU-native extras
    p.add_argument("-dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("-ndev", help="devices in the data mesh (0=all)", type=int, default=0)
    p.add_argument("-workdir", type=str, default="weights")
    p.add_argument("-logdir", type=str, default="runs")
    p.add_argument("-host_aug", help="augment on host instead of device", action="store_true")
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
        "equivalent, measured +46%% step throughput on TPU; with -drop the "
        "dropout mask is drawn in the packed layout, so same-seed runs "
        "diverge across layouts — same distribution, different RNG alignment)",
        action="store_true",
    )
    p.add_argument("-workers", type=int, default=4)
    p.add_argument(
        "-dist",
        help="multi-host: call jax.distributed.initialize() (coordinator "
        "from the TPU pod metadata / JAX_COORDINATOR_ADDRESS env) before "
        "building the mesh; every process then runs identical samplers but "
        "decodes only its own global-batch rows (parallel.trainer_row_shard)",
        action="store_true",
    )
    p.add_argument("-max_hours", type=float, default=24.0)
    p.add_argument("-patience", help="early stopping patience (0=off)", type=int, default=0)
    p.add_argument(
        "-resume",
        type=str,
        default="",
        help="path for periodic full train-state snapshots (params, optimizers, "
        "rng, lr, best, sampler cursors); restores from it when present, so a "
        "killed run continues where it stopped",
    )
    p.add_argument("-save_every", help="epochs between -resume snapshots", type=int, default=1)
    return p


def config_from_args(args) -> "UDAConfig":
    aug = "aug2" if args.aug2 else ("heavy" if args.aug else "")
    # late-bound through the config module so test/runbook fixtures that
    # swap config.mscmrseg_default take effect regardless of import order
    return _config.mscmrseg_default(
        aug=aug,
        load_weight=args.load_weight,
        bs=args.bs,
        ns=args.ns,
        epochs=args.e,
        lr=args.lr,
        lr_fix=args.lr_fix,
        offdecay=args.offdecay,
        decay_e=args.decay_e,
        apdx=args.apdx,
        d1=args.d1,
        d2=args.d2,
        d4=args.d4,
        d1lr=args.d1lr,
        d2lr=args.d2lr,
        d4lr=args.d4lr,
        dr=args.dr,
        wp=args.wp,
        data_dir=args.data_dir,
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

    from pointcloududa_tpu.data.build import build_mscmrseg_pipelines
    from pointcloududa_tpu.parallel import create_mesh, init_distributed, trainer_row_shard
    from pointcloududa_tpu.train.loop import UDATrainer

    if args.dist:
        init_distributed()
    mesh = create_mesh(cfg.num_devices)
    row_shard = trainer_row_shard(mesh, cfg.bs)
    workdir, logdir = args.workdir, args.logdir
    if jax.process_count() > 1 and jax.process_index() != 0:
        # replicated state + identical sampler streams make every process's
        # checkpoints/logs byte-identical decisions; rank 0 owns the real
        # dirs, the rest write to scratch so concurrent saves never collide
        import os as _os

        workdir = _os.path.join(workdir, f".rank{jax.process_index()}")
        logdir = _os.path.join(logdir, f".rank{jax.process_index()}")
    device_augment = not args.host_aug
    train_iter, val_iters = build_mscmrseg_pipelines(
        cfg, workers=args.workers, device_augment=device_augment, row_shard=row_shard
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
        # warm restart restores the generator AND every enabled
        # discriminator, then validates before training resumes
        # (src/train_mscmrseg.py:503-533)
        from pointcloududa_tpu.train.checkpoint import restore_net_state

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
        print("weights restored from", trainer.ckpt_gen.model_name)
        trainer.initial_validation()
    print(
        f"Training on {len(train_iter._src_sampler)} trainA, "
        f"{len(train_iter._tgt_sampler)} trainB slices"
    )
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


if __name__ == "__main__":
    main()
