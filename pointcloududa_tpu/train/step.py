"""The 5-phase alternating UDA step as ONE jitted pure function.

Reference semantics (``src/train_mscmrseg.py:143-345``,
``src/train_mmwhs.py:145-377``), re-expressed functionally:

  phase 1  supervised source loss through the generator;
  phase 2  adversarial target loss through *frozen* discriminators;
           -> one gradient wrt the generator subtree only (the reference's
              two sequential ``backward()``s accumulate into the same grads
              before a single ``optim_gen.step()`` — identical to summing);
  phase 3  discriminators on source outputs vs label 1;
  phase 4  discriminators on target outputs vs label 0;
           -> per-discriminator gradients wrt that discriminator only,
              on the generator outputs computed with the *old* generator
              parameters (the reference detaches tensors produced before
              ``optim_gen.step()``, so the values match);
  phase 5  all optimiser updates.

PyTorch's ``requires_grad`` flipping disappears: each ``value_and_grad``
differentiates exactly one parameter subtree; everything else is a constant
of the trace. BatchNorm running-statistics update *order* is preserved:
generator stats see source then target (phase 1 then 2); the D4 PointNet's
stats see target (phase 2), source (phase 3), target (phase 4), exactly the
reference's three train-mode forwards.

Everything below is compiled once per static config (no recompiles across
steps); under a data mesh the same function runs SPMD — batch-dim reductions
inside losses and BatchNorm become cross-chip ``psum``s inserted by GSPMD,
so multi-chip training keeps single-device semantics over the global batch.
"""

from __future__ import annotations


from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from pointcloududa_tpu.config import UDAConfig
from pointcloududa_tpu.ops import losses
from pointcloududa_tpu.ops.packed import pixel_class_view, space_to_depth, unpixel_class_view
from pointcloududa_tpu.train.state import NetState, UDATrainState

SOURCE_LABEL = 1.0  # reference train_mscmrseg.py:160-161
TARGET_LABEL = 0.0


def _chamfer(cfg: UDAConfig):
    """Select the Chamfer implementation.

    ``auto`` picks the jnp decomposition: one batched einsum XLA fuses with
    the min/sqrt consumers, whereas the Pallas kernel's per-batch-element
    grid launches B tiny programs — at N=300 the matrix (360 KB/item) never
    spills to HBM either way, so fusion wins. The Pallas kernel stays
    available (``chamfer_impl="pallas"``) and is the right building block
    for clouds large enough that the (B, N, M) matrix would spill.
    """
    impl = cfg.chamfer_impl
    if impl == "auto":
        impl = "jnp"
    if impl == "pallas":
        from pointcloududa_tpu.ops.chamfer_pallas import chamfer_loss_pallas

        return chamfer_loss_pallas
    return losses.chamfer_loss


def _activate(cfg: UDAConfig, logits):
    if cfg.softmax:
        return jax.nn.softmax(logits, axis=-1)
    return jax.nn.sigmoid(logits)


def _supervised_loss(cfg: UDAConfig, logits, probs, mask_onehot, sample_mask=None):
    """Reference quirks preserved: MS-CMRSeg BCE on sigmoid probs
    (``train_mscmrseg.py:202``); MM-WHS ``-softmax`` feeds softmax outputs
    into CE — a double softmax (``train_mmwhs.py:213-214``)."""
    if cfg.softmax:
        labels = jnp.argmax(mask_onehot, axis=-1)
        # probs as CE input: parity
        l1 = losses.cross_entropy(probs, labels, sample_mask=sample_mask)
    else:
        l1 = losses.bce_from_probs(probs, mask_onehot, sample_mask=sample_mask)
    l2 = losses.jaccard_loss(mask_onehot, probs, sample_mask=sample_mask)
    return l1, l2


def _entropy_map(cfg: UDAConfig, probs):
    return losses.weighted_self_information(
        probs, num_classes=cfg.n_class if cfg.entropy_norm else None
    )


def _disc_accuracy(logits, is_source: bool, sample_mask=None):
    """Fraction classified as source; reference thresholds sigmoid at 0.5
    (``train_mscmrseg.py:270-272``) == logit >= 0."""
    frac_source = losses.masked_mean((logits >= 0.0).astype(jnp.float32), sample_mask)
    return frac_source if is_source else 1.0 - frac_source


def make_train_step(cfg: UDAConfig, models, optimizers):
    """Build the jitted train step.

    ``models`` = (gen, d1, d2, d4) flax modules (None where disabled);
    ``optimizers`` = matching optax transforms.
    Returns ``step(state, batch) -> (state, metrics)`` where ``batch`` has
    NHWC float32 ``img_s``, one-hot ``mask_s``, (B,300,3) ``vert_s``,
    ``img_t``, ``vert_t``.
    """
    gen, d1, d2, d4 = models
    gen_tx, d1_tx, d2_tx, d4_tx = optimizers
    chamfer = _chamfer(cfg)

    # packed-compute layout helpers (cfg.packed_compute): logits/probs/
    # entropy tensors stay in the c-major packed layout (B,h,w,4C); pv()
    # exposes the per-PIXEL class axis as a 5-D view (B,h,w,4,C) for the
    # class-sensitive reductions — every loss here is shape-generic with
    # class_axis=-1, and elementwise losses see the same element set either
    # way, so values are identical to the standard layout.
    pc = cfg.packed_compute
    n_cls = cfg.n_class

    def pv(t):
        return pixel_class_view(t, n_cls) if pc else t

    def ipv(t):
        return unpixel_class_view(t) if pc else t

    def activate(o):
        if cfg.softmax:
            return ipv(jax.nn.softmax(pv(o), axis=-1))
        return jax.nn.sigmoid(o)

    # only the packed-compute path passes the kwarg: custom generator
    # modules (e.g. the torch-twin parity tests') need not accept it
    gen_kwargs = {"emit_packed": True} if pc else {}

    def step(state: UDATrainState, batch: Dict[str, jnp.ndarray]):
        rng, r_drop_s, r_drop_t, r_d4a, r_d4b, r_d4c = jax.random.split(state.rng, 6)
        img_s, mask_s = batch["img_s"], batch["mask_s"].astype(jnp.float32)
        if pc:
            mask_s = space_to_depth(mask_s)
        img_t = batch["img_t"]
        vert_s = batch.get("vert_s")
        vert_t = batch.get("vert_t")
        # padded-tail validity mask (trainer pads ns%bs tails to the full
        # batch so shapes stay static and mesh-divisible); every loss/metric
        # reduction below excludes the pad. Full batches carry no mask and
        # trace exactly as before. BatchNorm statistics do see the wrap-pad
        # duplicates (documented deviation, PARITY.md — no reference config
        # has a train tail: 2000 % 16 == 0).
        sm = batch.get("sample_mask")
        chamfer_m = (
            chamfer
            if sm is None
            else (lambda a, b: losses.chamfer_loss(a, b, sample_mask=sm))
        )

        d1_params = state.d1.params if cfg.d1 else None
        d2_params = state.d2.params if cfg.d2 else None
        d4_params = state.d4.params if cfg.d4 else None
        d4_stats0 = state.d4.batch_stats if cfg.d4 else None

        # ---- phases 1+2: generator loss (supervised + adversarial) -------
        def gen_loss_fn(gen_params):
            aux: Dict[str, Any] = {}
            v = {"params": gen_params, "batch_stats": state.gen.batch_stats}
            (o_s, _, pv_s), m1 = gen.apply(
                v, img_s, train=True, mutable=["batch_stats"],
                rngs={"dropout": r_drop_s}, **gen_kwargs,
            )
            probs_s = activate(o_s)
            l1, l2 = _supervised_loss(cfg, pv(o_s), pv(probs_s), pv(mask_s), sm)
            l3 = 0.0
            if cfg.point_head:
                l3 = chamfer_m(pv_s, vert_s)
                aux["ver_s_loss"] = l3
            unc_s = _entropy_map(cfg, probs_s)
            ent_s = losses.masked_mean(jnp.sum(pv(unc_s), axis=-1), sm)
            sup = l1 + l2 + cfg.wp * l3
            if cfg.etpls and cfg.d2:
                sup = sup + ent_s  # train_mmwhs.py:227-230

            v = {"params": gen_params, "batch_stats": m1["batch_stats"]}
            (o_t, _, pv_t), m2 = gen.apply(
                v, img_t, train=True, mutable=["batch_stats"],
                rngs={"dropout": r_drop_t}, **gen_kwargs,
            )
            probs_t = activate(o_t)
            unc_t = _entropy_map(cfg, probs_t)
            ent_t = losses.masked_mean(jnp.sum(pv(unc_t), axis=-1), sm)

            adv = ent_t if cfg.Tetpls else 0.0
            d4_stats = d4_stats0
            if cfg.point_head and vert_t is not None:
                # logged only — the reference's loss_vert_target is
                # .item()-appended, never backpropped (train_mscmrseg.py:
                # 230-231); absent when cfg.vert_t_metric is off
                aux["ver_t_loss"] = chamfer_m(pv_t, vert_t)
            if cfg.d2:
                out2 = d2.apply({"params": d2_params}, unc_t)
                adv = adv + cfg.w2 * cfg.dr * losses.bce_with_logits(out2, SOURCE_LABEL, sm)
            if cfg.d4:
                (out4, _, _), m4 = d4.apply(
                    {"params": d4_params, "batch_stats": d4_stats0},
                    pv_t,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": r_d4a},
                )
                adv = adv + cfg.w4 * cfg.dr * losses.bce_with_logits(out4, SOURCE_LABEL, sm)
                d4_stats = m4["batch_stats"]
            if cfg.d1:
                d1_in = probs_t if cfg.d1_on_probs else o_t
                out1 = d1.apply({"params": d1_params}, d1_in)
                adv = adv + cfg.w1 * cfg.dr * losses.bce_with_logits(out1, SOURCE_LABEL, sm)

            aux.update(
                o_s=o_s,
                o_t=o_t,
                probs_s=probs_s,
                probs_t=probs_t,
                unc_s=unc_s,
                unc_t=unc_t,
                pv_s=pv_s,
                pv_t=pv_t,
                gen_stats=m2["batch_stats"],
                d4_stats=d4_stats,
                seg_loss=l1 + l2,
                adv_loss=adv,
                entropy_loss=ent_s,
                entropy_loss_T=ent_t,
            )
            return sup + adv, aux

        (gen_total, aux), gen_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen.params
        )
        gen_updates, gen_opt = gen_tx.update(gen_grads, state.gen.opt_state, state.gen.params)
        new_gen = NetState(
            params=optax.apply_updates(state.gen.params, gen_updates),
            batch_stats=aux["gen_stats"],
            opt_state=gen_opt,
        )

        metrics = {
            "seg_loss": aux["seg_loss"],
            "adv_loss": aux["adv_loss"],
            "gen_total_loss": gen_total,
            "entropy_loss": aux["entropy_loss"],
            "entropy_loss_T": aux["entropy_loss_T"],
        }
        if cfg.point_head:
            metrics["ver_s_loss"] = aux["ver_s_loss"]
            if "ver_t_loss" in aux:  # absent when cfg.vert_t_metric is off
                metrics["ver_t_loss"] = aux["ver_t_loss"]
        # train-time dice on hard predictions (soft_to_hard ties -> multi-hot,
        # reference utils.py:32-40 + metric.py:17-36 with its numLabels=4)
        o_s_pv = pv(aux["o_s"])
        hard = (o_s_pv == jnp.max(o_s_pv, axis=-1, keepdims=True)).astype(jnp.float32)
        metrics["seg_dice"] = losses.dice_coef_multilabel(
            pv(mask_s), hard, num_labels=4, sample_mask=sm
        )

        # ---- phases 3+4: discriminators on detached outputs --------------
        # (values from the OLD generator; no gradient flows back to it)
        new_d1 = state.d1
        if cfg.d1:
            src_in = aux["probs_s"] if cfg.d1_on_probs else aux["o_s"]
            tgt_in = aux["probs_t"] if cfg.d1_on_probs else aux["o_t"]

            def d1_loss_fn(p):
                out_src = d1.apply({"params": p}, src_in)
                out_tgt = d1.apply({"params": p}, tgt_in)
                loss = losses.bce_with_logits(out_src, SOURCE_LABEL, sm) + losses.bce_with_logits(
                    out_tgt, TARGET_LABEL, sm
                )
                return loss, (out_src, out_tgt)

            (d1_loss, (o1s, o1t)), d1_grads = jax.value_and_grad(d1_loss_fn, has_aux=True)(
                d1_params
            )
            upd, opt = d1_tx.update(d1_grads, state.d1.opt_state, d1_params)
            new_d1 = NetState(optax.apply_updates(d1_params, upd), state.d1.batch_stats, opt)
            metrics["dis1_acc1"] = _disc_accuracy(o1s, True, sm)
            metrics["dis1_acc2"] = _disc_accuracy(o1t, False, sm)
            metrics["d1_loss"] = d1_loss

        new_d2 = state.d2
        if cfg.d2:

            def d2_loss_fn(p):
                out_src = d2.apply({"params": p}, aux["unc_s"])
                out_tgt = d2.apply({"params": p}, aux["unc_t"])
                loss = losses.bce_with_logits(out_src, SOURCE_LABEL, sm) + losses.bce_with_logits(
                    out_tgt, TARGET_LABEL, sm
                )
                return loss, (out_src, out_tgt)

            (d2_loss, (o2s, o2t)), d2_grads = jax.value_and_grad(d2_loss_fn, has_aux=True)(
                d2_params
            )
            upd, opt = d2_tx.update(d2_grads, state.d2.opt_state, d2_params)
            new_d2 = NetState(optax.apply_updates(d2_params, upd), state.d2.batch_stats, opt)
            metrics["dis2_acc1"] = _disc_accuracy(o2s, True, sm)
            metrics["dis2_acc2"] = _disc_accuracy(o2t, False, sm)
            metrics["d2_loss"] = d2_loss

        new_d4 = state.d4
        if cfg.d4:
            # stats ordering parity: phase-2 stats (aux) -> source -> target
            def d4_loss_fn(p):
                (out_src, _, _), m_a = d4.apply(
                    {"params": p, "batch_stats": aux["d4_stats"]},
                    aux["pv_s"],
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": r_d4b},
                )
                (out_tgt, _, _), m_b = d4.apply(
                    {"params": p, "batch_stats": m_a["batch_stats"]},
                    aux["pv_t"],
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": r_d4c},
                )
                loss = losses.bce_with_logits(out_src, SOURCE_LABEL, sm) + losses.bce_with_logits(
                    out_tgt, TARGET_LABEL, sm
                )
                return loss, (out_src, out_tgt, m_b["batch_stats"])

            (d4_loss, (o4s, o4t, d4_stats_final)), d4_grads = jax.value_and_grad(
                d4_loss_fn, has_aux=True
            )(d4_params)
            upd, opt = d4_tx.update(d4_grads, state.d4.opt_state, d4_params)
            new_d4 = NetState(optax.apply_updates(d4_params, upd), d4_stats_final, opt)
            metrics["dis4_acc1"] = _disc_accuracy(o4s, True, sm)
            metrics["dis4_acc2"] = _disc_accuracy(o4t, False, sm)
            metrics["d4_loss"] = d4_loss

        new_state = state.replace(
            gen=new_gen, d1=new_d1, d2=new_d2, d4=new_d4, step=state.step + 1, rng=rng
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(cfg: UDAConfig, gen):
    """Jitted validation step mirroring ``valid_model_with_one_dataset``
    (``train_mscmrseg.py:53-99``, ``train_mmwhs.py:51-99``) — loss + mean
    foreground Dice of the batch, entirely on device (no HD at valid time,
    matching the reference's hd=False calls).
    """

    n_fg = cfg.n_class - 1
    chamfer = _chamfer(cfg)

    def binary_dice(pred_lbl, true_lbl, c, sm):
        p = (pred_lbl == c).astype(jnp.float32)
        t = (true_lbl == c).astype(jnp.float32)
        if sm is not None:
            m = sm.astype(jnp.float32).reshape((-1,) + (1,) * (p.ndim - 1))
            p = p * m
            t = t * m
        inter = jnp.sum(p * t)
        denom = jnp.sum(p) + jnp.sum(t)
        # medpy dc: 0 when both structures are empty
        return jnp.where(denom > 0, 2.0 * inter / jnp.maximum(denom, 1.0), 0.0)

    def eval_step(gen_state: NetState, batch):
        # validity mask of a padded tail batch (val sets are 78/77 slices at
        # bs 16 — the reference just runs the short final batch,
        # data_generator_mscmrseg.py:281-291; here it is padded to a static,
        # mesh-divisible shape and masked out of every reduction)
        sm = batch.get("sample_mask")
        v = {"params": gen_state.params, "batch_stats": gen_state.batch_stats}
        o, _, pv = gen.apply(v, batch["img"], train=False)
        mask = batch["mask"].astype(jnp.float32)
        probs = _activate(cfg, o)
        l1, l2 = _supervised_loss(cfg, o, probs, mask, sm)
        vert_loss = jnp.float32(-1.0)
        loss = l1 + l2
        if cfg.point_head:
            vert_loss = chamfer(pv, batch["vert"]) if sm is None else losses.chamfer_loss(
                pv, batch["vert"], sample_mask=sm
            )
            if cfg.workload == "mscmrseg" and cfg.d4:
                # MS-CMRSeg adds the chamfer term to the reported valid loss
                # (train_mscmrseg.py:72-78); MM-WHS does not (train_mmwhs.py:81)
                loss = loss + vert_loss
        pred_lbl = jnp.argmax(o, axis=-1)
        true_lbl = jnp.argmax(mask, axis=-1)
        dices = jnp.stack(
            [binary_dice(pred_lbl, true_lbl, c, sm) for c in range(1, cfg.n_class)]
        )
        return {
            "loss": loss,
            "dice": jnp.sum(dices) / n_fg,
            "vert_loss": vert_loss,
            "logits": o,
        }

    return jax.jit(eval_step)
