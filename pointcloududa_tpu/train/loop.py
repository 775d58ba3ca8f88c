"""The training loop: one engine for both workloads.

The reference duplicates ~80% of its logic between ``train_mscmrseg.py`` and
``train_mmwhs.py`` (SURVEY.md §1); here a single ``UDATrainer`` is
parameterised by :class:`UDAConfig` and the dataset adapters.

Pipeline shape per step (vs the reference's synchronous host loop with
per-step H2D copies, ``train_mscmrseg.py:183-330``):

  host workers decode raw arrays -> prefetch thread `device_put`s them
  (sharded over the data mesh) one batch ahead -> a jitted *device
  preprocess* (augment + normalise + crop + one-hot, fused by XLA) -> the
  jitted 5-phase UDA step. Host never blocks on device results inside the
  epoch: metrics stay on device and are fetched once per epoch.

Epoch cadence parity: validation over (source-val, target-val, target-train)
every epoch (``train_mscmrseg.py:102-139``), checkpoint monitor =
``val_lge_dice`` mode=max, generator lr x0.2 every ``decay_e`` epochs, and a
wall-clock stop with the MM-WHS adaptive margin (``train_mmwhs.py:673-675``).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointcloududa_tpu.config import UDAConfig, appendix
from pointcloududa_tpu.ops import augment as augment_lib
from pointcloududa_tpu.train import checkpoint as ckpt_lib
from pointcloududa_tpu.train.state import (
    build_models,
    build_optimizers,
    create_train_state,
    get_generator_lr,
    set_generator_lr,
)
from pointcloududa_tpu.train.step import make_eval_step, make_train_step
from pointcloududa_tpu.utils.logging import MetricWriter
from pointcloududa_tpu.utils.timer import trace_annotation


def make_device_preprocess(cfg: UDAConfig, train: bool, device_augment: bool):
    """Jitted raw-batch -> model-batch transform (runs on accelerator).

    Order of operations matches the reference data generators: augment (on
    0..255-scale values) -> normalise -> centre-crop -> one-hot
    (``data_generator_mscmrseg.py:305-317``). MM-WHS float slices are
    min-max mapped to 0..255 around augmentation and back
    (``data_generator_mmwhs.py:245-254``); without augmentation they pass
    through untouched (already volume-normalised upstream).
    """
    aug_cfg = {"heavy": augment_lib.heavy(), "aug2": augment_lib.medium(), "light": augment_lib.light()}.get(cfg.aug)
    aug_fn = (
        augment_lib.make_augment_fn(aug_cfg) if (train and device_augment and aug_cfg) else None
    )
    is_png = cfg.workload == "mscmrseg"
    # MM-WHS + augmentation + point head: regenerate clouds on device from
    # the warped masks (the reference does this per sample on the host via
    # mcubes+python FPS, data_generator_mmwhs.py:256-264 — its bottleneck).
    # MS-CMRSeg keeps precomputed clouds regardless of warping (parity:
    # its generator loads vertex files unconditionally).
    regen_verts = (
        train and aug_fn is not None and cfg.point_head and cfg.workload == "mmwhs"
    )

    def crop(x):
        h = x.shape[1]
        if h > cfg.crop_size:
            o = (h - cfg.crop_size) // 2
            return x[:, o : o + cfg.crop_size, o : o + cfg.crop_size]
        return x

    def norm_img(img):
        if is_png:
            return img.astype(jnp.float32) / 255.0
        return img.astype(jnp.float32)

    def aug_pair(rng, img, mask):
        if aug_fn is None:
            return img.astype(jnp.float32), mask
        if is_png:
            return aug_fn(rng, img, mask)
        lo, hi = jnp.min(img), jnp.max(img)
        scaled = (img - lo) * 255.0 / (hi - lo + 1e-12)
        out, mask = aug_fn(rng, scaled, mask)
        return lo + out * (hi - lo + 1e-12) / 255.0, mask

    # ``with_vert_t`` is the per-step cadence gate (cfg.vert_t_every): the
    # trainer passes False on off-cadence steps, which drops the logged-only
    # target cloud from the batch — the train step then traces (once) a
    # variant without the ver_t chamfer. Static so each variant is ONE
    # compilation; at the default vert_t_every=1 only the True variant ever
    # traces.
    @functools.partial(jax.jit, static_argnames="with_vert_t")
    def process_train(rng, raw, with_vert_t=True):
        vert_t_on = cfg.vert_t_metric and with_vert_t
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        img_s, mask_s = aug_pair(r1, raw["img_s"], raw["mask_s"].astype(jnp.int32))
        mask_t = raw["mask_t"].astype(jnp.int32) if (regen_verts and "mask_t" in raw) else None
        img_t, mask_t = aug_pair(r2, raw["img_t"], mask_t)
        batch = {
            "img_s": crop(norm_img(img_s)),
            "mask_s": jax.nn.one_hot(crop(mask_s), cfg.n_class, dtype=jnp.float32),
            "img_t": crop(norm_img(img_t)),
        }
        if regen_verts and mask_t is not None:
            from pointcloududa_tpu.ops.pointcloud_device import masks_to_point_clouds

            batch["vert_s"] = masks_to_point_clouds(mask_s, r3) / 255.0
            if vert_t_on:  # target clouds feed a logged-only metric
                batch["vert_t"] = masks_to_point_clouds(mask_t, r4) / 255.0
        else:
            if "vert_s" in raw:
                batch["vert_s"] = raw["vert_s"].astype(jnp.float32) / 255.0
            if "vert_t" in raw and vert_t_on:
                batch["vert_t"] = raw["vert_t"].astype(jnp.float32) / 255.0
        if "sample_mask" in raw:
            batch["sample_mask"] = raw["sample_mask"].astype(jnp.float32)
        return batch

    @jax.jit
    def process_eval(raw):
        batch = {
            "img": crop(norm_img(raw["img"])),
            "mask": jax.nn.one_hot(crop(raw["mask"].astype(jnp.int32)), cfg.n_class, dtype=jnp.float32),
        }
        if "vert" in raw:
            batch["vert"] = raw["vert"].astype(jnp.float32) / 255.0
        if "sample_mask" in raw:
            batch["sample_mask"] = raw["sample_mask"].astype(jnp.float32)
        return batch

    return process_train if train else process_eval


class UDATrainer:
    """End-to-end UDA training with validation, checkpoints and logging.

    ``train_iter``: object with ``.epoch()`` yielding raw host batches and
    ``.steps_per_epoch``. ``val_iters``: mapping of
    {"val": fn, "val_lge": fn, "test_lge": fn} each returning a fresh
    iterator of raw eval batches.
    """

    def __init__(
        self,
        cfg: UDAConfig,
        train_iter,
        val_iters: Dict[str, Callable[[], Iterable]],
        workdir: str = "weights",
        logdir: str = "runs",
        mesh=None,
        device_augment: bool = True,
        place: Optional[Callable] = None,
    ):
        self.cfg = cfg
        self.train_iter = train_iter
        self.val_iters = val_iters
        self.mesh = mesh
        # tail batches are wrap-padded to a multiple of the mesh (and to the
        # stream's full batch size) with a sample_mask; see data.loader.BatchPadder.
        # On a multi-process mesh padding already happened at index level
        # (loader.shard_index_batch wrap-pads the GLOBAL batch before slicing
        # this process's rows), so the host-side padder must stay a no-op —
        # padding the local slice to the global mesh multiple would corrupt
        # the row<->device mapping shard_batch assembles.
        self._pad_multiple = int(mesh.devices.size) if mesh is not None else 1
        if mesh is not None:
            from pointcloududa_tpu.parallel import mesh_is_multiprocess

            if mesh_is_multiprocess(mesh):
                self._pad_multiple = 1
        self.appendix = appendix(cfg)
        if cfg.debug_nans:
            # NaN guard — stand-in for the reference's always-on
            # torch.autograd.set_detect_anomaly (train_mscmrseg.py:703)
            jax.config.update("jax_debug_nans", True)

        models = build_models(cfg)
        self.gen = models[0]
        txs = build_optimizers(cfg)
        self.state = create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
        if mesh is not None:
            from pointcloududa_tpu.parallel import replicate

            self.state = replicate(self.state, mesh)
        self.train_step = make_train_step(cfg, models, txs)
        self.eval_step = make_eval_step(cfg, self.gen)
        self.pre_train = make_device_preprocess(cfg, train=True, device_augment=device_augment)
        self.pre_eval = make_device_preprocess(cfg, train=False, device_augment=False)
        if place is not None:
            self.place = place
        elif mesh is not None:
            from pointcloududa_tpu.parallel import shard_batch

            self.place = lambda b: shard_batch(b, mesh)
        else:
            self.place = jax.device_put
        self._aug_rng = jax.random.PRNGKey(cfg.seed + 17)

        self.writer = MetricWriter(logdir, comment=self.appendix)
        mk = lambda name, best: ckpt_lib.ModelCheckpointCallback(  # noqa: E731
            mode="max",
            best_model_name=f"{workdir}/best_{name}_{self.appendix}",
            model_name=f"{workdir}/{name}_{self.appendix}",
            save_best=best,
            save_last_model=True,
            n_epochs=cfg.epochs,
        )
        self.ckpt_gen = mk("unet_model_checkpoint", best=True)
        self.ckpt_d1 = mk("out_dis", best=False) if cfg.d1 else None
        self.ckpt_d2 = mk("entropy_dis", best=False) if cfg.d2 else None
        self.ckpt_d4 = mk("point_dis", best=False) if cfg.d4 else None

        self.best = {"epoch": 0, "val_lge_dice": -1.0, "train": {}, "valid": {}}
        self._lr = cfg.lr
        self.early_stop = (
            ckpt_lib.EarlyStoppingCallback(cfg.patience, mode="max") if cfg.patience > 0 else None
        )

    # ------------------------------------------------------------------ #
    def train_epoch(self) -> Dict[str, float]:
        from pointcloududa_tpu.data.loader import BatchPadder, DevicePrefetcher

        metrics_acc = []
        step = 0
        # background thread decodes + places the next batch while the device
        # runs the current step (vs the reference's blocking host loop);
        # tail batches are padded + masked to a single static shape
        prefetch = DevicePrefetcher(place=self.place, depth=2)
        padder = BatchPadder(self._pad_multiple)
        every = self.cfg.vert_t_every
        for raw in prefetch(map(padder, self.train_iter.epoch())):
            with trace_annotation("uda_train_step"):
                self._aug_rng, r = jax.random.split(self._aug_rng)
                # cadence of the logged-only target chamfer (vert_t_every):
                # off-cadence steps drop vert_t and run the (separately
                # compiled) step variant without the diagnostic
                with_vt = every <= 1 or step % every == 0
                batch = self.pre_train(r, raw, with_vert_t=with_vt)
                self.state, metrics = self.train_step(self.state, batch)
            metrics_acc.append(metrics)
            step += 1
        if not metrics_acc:
            return {}
        host = jax.device_get(metrics_acc)
        # key union: ver_t_loss is present only on cadence steps — its epoch
        # mean averages the sampled steps
        keys = set().union(*host)
        return {k: float(np.mean([m[k] for m in host if k in m])) for k in keys}

    def _validate_one(self, make_iter) -> Dict[str, float]:
        from pointcloududa_tpu.data.loader import BatchPadder

        outs = []
        padder = BatchPadder(self._pad_multiple)
        for raw in make_iter():
            batch = self.pre_eval(self.place(padder(raw)))
            out = self.eval_step(self.state.gen, batch)
            outs.append({k: v for k, v in out.items() if k != "logits"})
        host = jax.device_get(outs)
        return {k: float(np.mean([o[k] for o in host])) for k in host[0]}

    def validate(self) -> Dict[str, float]:
        r = {}
        a = self._validate_one(self.val_iters["val"])
        r["val_dice"], r["val_loss"], r["valid_vert_loss"] = a["dice"], a["loss"], a["vert_loss"]
        b = self._validate_one(self.val_iters["val_lge"])
        r["val_lge_dice"], r["val_lge_loss"] = b["dice"], b["loss"]
        r["val_lge_vert_loss"] = b["vert_loss"]
        c = self._validate_one(self.val_iters["test_lge"])
        r["test_lge_dice"], r["test_lge_loss"] = c["dice"], c["loss"]
        return r

    def print_epoch_result(self, tr, vr, epoch: int) -> None:
        cfg = self.cfg
        n = cfg.epochs
        line1 = (
            f"[{epoch}/{n}] train_loss: {tr.get('seg_loss', 0):.5f} "
            f"valid_loss: {vr['val_loss']:.5f} valid_lge_loss: {vr['val_lge_loss']:.5f} "
            f"test_lge_loss: {vr['test_lge_loss']:.5f} "
        )
        if cfg.point_head:
            line1 += f"vertex_s_loss: {tr.get('ver_s_loss', -1):.5f}, vertex_t_loss: {tr.get('ver_t_loss', -1):.5f} "
        line2 = (
            f"train_dice: {tr.get('seg_dice', 0):.5f} valid_dice: {vr['val_dice']:.5f} "
            f"valid_lge_dice: {vr['val_lge_dice']:.5f} test_lge_dice: {vr['test_lge_dice']:.5f} "
        )
        for d in ("1", "2", "4"):
            if tr.get(f"dis{d}_acc1") is not None:
                line2 += f"d{d}_acc1: {tr[f'dis{d}_acc1']:.5f} d{d}_acc2: {tr[f'dis{d}_acc2']:.5f} "
        print(line1)
        print(line2)

    # ------------------------------------------------------------------ #
    def save_full(self, path: str, epoch: int) -> None:
        """Snapshot EVERYTHING needed to resume mid-run: all four network
        states (params + BN stats + optimizer), the augmentation rng, the
        epoch counter, lr, best-so-far, and the samplers' ring cursors.

        Goes beyond the reference's warm restart (model+optimizer only,
        ``train_mmwhs.py:537-583``): a resumed run continues the exact
        data order and decay schedule.
        """
        payload = {
            "epoch": np.int64(epoch),
            "lr": np.float64(self._lr),
            "best_val_lge_dice": np.float64(self.best["val_lge_dice"]),
            "best_epoch": np.int64(self.best["epoch"]),
            "aug_rng": jax.device_get(self._aug_rng),
            "state": jax.device_get(self.state),
            # monitor state of the best-checkpoint callback + early stopping,
            # so a resumed run keeps the same best/patience decisions
            "ckpt_best": np.float64(self.ckpt_gen.best_result),
            "ckpt_epoch": np.int64(self.ckpt_gen.epoch),
            "es_counter": np.int64(self.early_stop.counter if self.early_stop else 0),
            "es_best": np.float64(
                self.early_stop.best_result if self.early_stop else -np.inf
            ),
        }
        if hasattr(self.train_iter, "_src_sampler"):
            payload["src_sampler"] = self.train_iter._src_sampler.state()
            payload["tgt_sampler"] = self.train_iter._tgt_sampler.state()
        ckpt_lib.save_pytree(path, payload)

    def restore_full(self, path: str) -> int:
        """Restore a :meth:`save_full` snapshot; returns the next epoch."""
        template = {
            "epoch": np.int64(0),
            "lr": np.float64(0.0),
            "best_val_lge_dice": np.float64(0.0),
            "best_epoch": np.int64(0),
            "aug_rng": jax.device_get(self._aug_rng),
            "state": jax.device_get(self.state),
            "ckpt_best": np.float64(0.0),
            "ckpt_epoch": np.int64(0),
            "es_counter": np.int64(0),
            "es_best": np.float64(0.0),
        }
        if hasattr(self.train_iter, "_src_sampler"):
            template["src_sampler"] = self.train_iter._src_sampler.state()
            template["tgt_sampler"] = self.train_iter._tgt_sampler.state()
        payload = ckpt_lib.restore_pytree(path, template)
        self.state = jax.tree.unflatten(
            jax.tree.structure(self.state), jax.tree.leaves(payload["state"])
        )
        if self.mesh is not None:
            from pointcloududa_tpu.parallel import replicate

            self.state = replicate(self.state, self.mesh)
        self._aug_rng = jnp.asarray(payload["aug_rng"])
        self._lr = float(payload["lr"])
        self.best["val_lge_dice"] = float(payload["best_val_lge_dice"])
        self.best["epoch"] = int(payload["best_epoch"])
        self.ckpt_gen.best_result = float(payload["ckpt_best"])
        self.ckpt_gen.epoch = int(payload["ckpt_epoch"])
        if self.early_stop is not None:
            self.early_stop.counter = int(payload["es_counter"])
            self.early_stop.best_result = float(payload["es_best"])
        if "src_sampler" in payload and hasattr(self.train_iter, "_src_sampler"):
            self.train_iter._src_sampler.restore(payload["src_sampler"])
            self.train_iter._tgt_sampler.restore(payload["tgt_sampler"])
        return int(payload["epoch"]) + 1

    def initial_validation(self) -> Dict[str, float]:
        """Warm-restart pre-train validation with the reference's print
        format (``train_mscmrseg.py:511-524``, ``train_mmwhs.py:584-600``)."""
        vr = self.validate()
        print(
            f"valid_loss: {vr['val_loss']:.5f} "
            f"valid_lge_loss: {vr['val_lge_loss']:.5f} "
            f"test_lge_loss: {vr['test_lge_loss']:.5f} "
        )
        print(
            f"valid_dice: {vr['val_dice']:.5f} "
            f"valid_lge_dice: {vr['val_lge_dice']:.5f} "
            f"test_lge_dice: {vr['test_lge_dice']:.5f} "
        )
        return vr

    def fit(
        self,
        epochs: Optional[int] = None,
        start_epoch: int = 1,
        save_full_every: int = 0,
        save_full_path: Optional[str] = None,
    ) -> Dict:
        """Run training. ``start_epoch`` > 1 continues a :meth:`restore_full`
        snapshot (decay schedule, best-so-far and checkpoint cadence all pick
        up where they left off); ``save_full_every``/``save_full_path``
        enable periodic full snapshots for crash recovery. The wall-clock
        budget counts from *this* process start (the reference has no mid-run
        resume; its 24h budget is per submission)."""
        cfg = self.cfg
        n_epochs = epochs or cfg.epochs
        budget = cfg.max_hours * 3600 - 10 * 60  # reference margin (:667)
        start = time.perf_counter()
        slowest_epoch = 0.0
        for epoch in range(start_epoch, n_epochs + 1):
            e0 = time.perf_counter()
            tr = self.train_epoch()
            vr = self.validate()
            self.print_epoch_result(tr, vr, epoch)
            self.writer.scalars(epoch, tr, prefix="train/")
            self.writer.scalars(epoch, vr, prefix="valid/")
            self.writer.scalars(epoch, {"lr": get_generator_lr(self.state)}, prefix="opt/")

            if vr["val_lge_dice"] > self.best["val_lge_dice"]:
                self.best = {
                    "epoch": epoch,
                    "val_lge_dice": vr["val_lge_dice"],
                    "train": tr,
                    "valid": vr,
                }
            out_of_time = (time.perf_counter() - start) > budget
            stop_early = False
            if self.early_stop is not None:
                self.early_stop.step(vr["val_lge_dice"])
                stop_early = self.early_stop.should_stop()
            # a terminal epoch (budget or patience) triggers the final-epoch
            # checkpoint behaviour (.Scr rename + last snapshot), like the
            # reference's epoch = n_epochs - 1 trick (train_mscmrseg.py:573-574)
            ckpt_epoch = n_epochs if (out_of_time or stop_early) else epoch
            monitor = vr["val_lge_dice"]
            self.ckpt_gen.step(monitor, {"net": self.state.gen, "config": None}, ckpt_epoch)
            for cb, net in ((self.ckpt_d1, self.state.d1), (self.ckpt_d2, self.state.d2), (self.ckpt_d4, self.state.d4)):
                if cb is not None:
                    cb.step(monitor, {"net": net, "config": None}, ckpt_epoch)
            if out_of_time:
                print("wall-clock budget reached; stopping")
                break
            if stop_early:
                print(f"early stopping: no val_lge_dice improvement for {cfg.patience} epochs")
                break
            if cfg.offdecay and epoch % cfg.decay_e == 0:
                self._lr *= 0.2
                self.state = set_generator_lr(self.state, self._lr)
            # full snapshot AFTER the decay so a resume continues the
            # uninterrupted run's schedule exactly
            if save_full_every and save_full_path and epoch % save_full_every == 0:
                self.save_full(save_full_path, epoch)
            # adaptive margin (train_mmwhs.py:673-675)
            slowest_epoch = max(slowest_epoch, time.perf_counter() - e0)
            budget = cfg.max_hours * 3600 - slowest_epoch - 25 * 60
        print(
            "Best model on epoch {}: train_dice {:.3f}, valid_dice {:.3f}, "
            "lge_dice {:.3f}, test_lge_dice {:.3f}".format(
                self.best["epoch"],
                self.best["train"].get("seg_dice", 0.0),
                self.best["valid"].get("val_dice", 0.0),
                self.best["valid"].get("val_lge_dice", 0.0),
                self.best["valid"].get("test_lge_dice", 0.0),
            )
        )
        self.writer.close()
        return self.best
