"""Train-state pytrees and reference-parity optimisers.

The reference juggles four ``torch.optim`` instances and freezes networks by
flipping ``requires_grad`` per-parameter every phase
(``src/train_mscmrseg.py:184-198,250-260``). In JAX that machinery
disappears: each network is a separate parameter subtree with its own optax
chain, and every phase takes gradients with respect to exactly one subtree —
"freezing" is simply not differentiating.

Optimiser parity:
- generator: Adam(lr, betas=(0.9, 0.99), eps=1e-8)
  (``train_mscmrseg.py:427-431``) or SGD(momentum=0.95, wd=5e-4) under the
  MM-WHS ``-sgd`` flag (``train_mmwhs.py:453-459``);
- discriminators: SGD(momentum=0.99 MS-CMRSeg / 0.95 MM-WHS, wd=5e-4)
  (``train_mscmrseg.py:432-455``, ``train_mmwhs.py:466-489``) — weight decay
  added to the gradient *before* the momentum trace, like torch.

The generator learning rate is exposed through ``optax.inject_hyperparams``
so the reference's host-side step decay (x0.2 every ``decay_e`` epochs,
``train_mscmrseg.py:585-589``) mutates state instead of rebuilding it.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pointcloududa_tpu.config import UDAConfig
from pointcloududa_tpu.models import (
    PointNetCls,
    SegmentationPointModel,
    UncertaintyDiscriminator,
)


class NetState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any


class UDATrainState(struct.PyTreeNode):
    gen: NetState
    d1: Optional[NetState]
    d2: Optional[NetState]
    d4: Optional[NetState]
    step: jnp.ndarray
    rng: jnp.ndarray


def adam_reference(lr: float) -> optax.GradientTransformation:
    return optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate, b1=0.9, b2=0.99, eps=1e-8)
    )(learning_rate=lr)


def sgd_reference(lr: float, momentum: float, weight_decay: float = 5e-4) -> optax.GradientTransformation:
    def make(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=False),
            optax.scale_by_learning_rate(learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=lr)


def build_models(cfg: UDAConfig):
    """Instantiate the generator and the enabled discriminators."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # "auto" kept as an alias of the measured in-step winner (see config.py)
    bn_pallas = cfg.bn_stats_impl == "pallas"
    if bn_pallas:
        # the Pallas stats kernel is opaque to GSPMD: on a batch-sharded
        # input the partitioner cannot propagate a sharding through the
        # pallas_call (verified: tests/test_bn_pallas.py mesh test), so the
        # opt-in is single-chip only — fail at build time, not mid-training
        n_dev = cfg.num_devices if cfg.num_devices else jax.device_count()
        if n_dev > 1:
            raise ValueError(
                "bn_stats_impl='pallas' is single-chip only (the kernel does "
                f"not partition under a {n_dev}-device mesh); use the default "
                "'xla' impl — it is also the measured in-step winner"
            )
    gen = SegmentationPointModel(
        filters=cfg.filters,
        in_channels=cfg.in_channels,
        n_block=cfg.n_block,
        bottleneck_depth=cfg.bottleneck_depth,
        n_class=cfg.n_class,
        pointnet=cfg.point_head,
        fc_inch=cfg.fc_inch,
        extpn=cfg.extpn,
        batchnorm=cfg.batchnorm,
        drop=cfg.drop,
        heinit=cfg.heinit,
        packed_level0=cfg.packed_level0,
        packed_level1=cfg.packed_level1,
        bn_pallas=bn_pallas,
        torch_bn_stats=cfg.torch_bn_stats,
        compute_dtype=dtype,
    )
    if cfg.packed_compute and not cfg.packed_level0:
        raise ValueError("packed_compute requires packed_level0")
    d1 = (
        UncertaintyDiscriminator(
            in_channel=cfg.n_class, heinit=cfg.heinit, ext=cfg.extd1,
            packed_input=cfg.packed_compute, compute_dtype=dtype,
        )
        if cfg.d1
        else None
    )
    d2 = (
        UncertaintyDiscriminator(
            in_channel=cfg.n_class, heinit=cfg.heinit, ext=cfg.extd2,
            packed_input=cfg.packed_compute, compute_dtype=dtype,
        )
        if cfg.d2
        else None
    )
    d4 = (
        PointNetCls(feature_transform=cfg.ft, ext=cfg.extd4, compute_dtype=dtype,
                    torch_bn_stats=cfg.torch_bn_stats)
        if cfg.d4
        else None
    )
    return gen, d1, d2, d4


def build_optimizers(cfg: UDAConfig):
    gen_tx = (
        # the reference hardcodes momentum .95 under -sgd; its -mmt flag
        # reaches only the appendix string, never the optimiser
        # (src/train_mmwhs.py:453-459 vs :744-745)
        sgd_reference(cfg.lr, momentum=0.95)
        if cfg.sgd
        else adam_reference(cfg.lr)
    )
    d1_tx = sgd_reference(cfg.d1lr, cfg.disc_momentum("d1")) if cfg.d1 else None
    d2_tx = sgd_reference(cfg.d2lr, cfg.disc_momentum("d2")) if cfg.d2 else None
    d4_tx = sgd_reference(cfg.d4lr, cfg.disc_momentum("d4")) if cfg.d4 else None
    return gen_tx, d1_tx, d2_tx, d4_tx


def _init_net(model, tx, rng, *example_inputs, **kwargs):
    variables = model.init(rng, *example_inputs, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return NetState(params=params, batch_stats=batch_stats, opt_state=tx.init(params))


def create_train_state(cfg: UDAConfig, rng: jax.Array) -> UDATrainState:
    """Initialise all networks + optimisers on example shapes from cfg."""
    gen, d1, d2, d4 = build_models(cfg)
    gen_tx, d1_tx, d2_tx, d4_tx = build_optimizers(cfg)
    rngs = jax.random.split(rng, 5)
    img = jnp.zeros((2, cfg.crop_size, cfg.crop_size, cfg.in_channels), jnp.float32)
    gen_state = _init_net(gen, gen_tx, rngs[0], img, train=False)
    d1_state = d2_state = d4_state = None
    # packed_compute: D1/D2 ingest the c-major packed layout; the param tree
    # is identical either way (the packed first conv declares the unpacked
    # (4,4,C,K) kernel), only the init example's shape differs
    if cfg.packed_compute:
        d_in = jnp.zeros(
            (2, cfg.crop_size // 2, cfg.crop_size // 2, 4 * cfg.n_class), jnp.float32
        )
    else:
        d_in = jnp.zeros((2, cfg.crop_size, cfg.crop_size, cfg.n_class), jnp.float32)
    if cfg.d1:
        d1_state = _init_net(d1, d1_tx, rngs[1], d_in)
    if cfg.d2:
        d2_state = _init_net(d2, d2_tx, rngs[2], d_in)
    if cfg.d4:
        d4_state = _init_net(d4, d4_tx, rngs[3], jnp.zeros((2, 300, 3), jnp.float32), train=False)
    return UDATrainState(
        gen=gen_state,
        d1=d1_state,
        d2=d2_state,
        d4=d4_state,
        step=jnp.zeros((), jnp.int32),
        rng=rngs[4],
    )


def set_generator_lr(state: UDATrainState, lr: float) -> UDATrainState:
    """Host-side lr mutation for the x0.2 step decay."""
    opt_state = state.gen.opt_state
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, dtype=hyper["learning_rate"].dtype)
    opt_state = opt_state._replace(hyperparams=hyper)
    return state.replace(gen=state.gen.replace(opt_state=opt_state))


def get_generator_lr(state: UDATrainState) -> float:
    return float(state.gen.opt_state.hyperparams["learning_rate"])
