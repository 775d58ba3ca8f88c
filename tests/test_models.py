"""Model parity tests: parameter counts and output shapes mirroring the
reference's __main__ smoke blocks (SURVEY.md §4), plus small real forwards.

Shape/count checks use jax.eval_shape (no FLOPs, no compile) so the full
224x224 configuration is testable on the 1-core CPU CI box.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloududa_tpu.models import (
    PointNetCls,
    SegmentationPointModel,
    UncertaintyDiscriminator,
)


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def _abstract_init(model, *args, **kwargs):
    return jax.eval_shape(
        lambda rng: model.init(rng, *args, **kwargs),
        jax.random.PRNGKey(0),
    )


def test_unet_param_count_parity():
    # 13,483,844 @ filters=32, n_block=4, pointnet off — reference
    # src/networks/unet.py:166 (includes the dead conv1_1: 9*32+32 params)
    model = SegmentationPointModel(filters=32, n_block=4, n_class=4, pointnet=False)
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = _abstract_init(model, x, train=False)
    assert _param_count(variables["params"]) == 13_483_844


def test_unet_output_shapes_224():
    model = SegmentationPointModel(filters=32, n_block=4, n_class=4, pointnet=True, fc_inch=81)
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = _abstract_init(model, x, train=False)
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), variables, x
    )
    logits, feat, points = out
    assert logits.shape == (2, 224, 224, 4)
    assert feat is None
    assert points.shape == (2, 300, 3)


def test_unet_output_shapes_256_mmwhs():
    # MM-WHS config: 256^2 input, 5 classes, fc_inch=121 (bottleneck 16->11)
    model = SegmentationPointModel(filters=32, n_block=4, n_class=5, pointnet=True, fc_inch=121)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = _abstract_init(model, x, train=False)
    logits, _, points = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), variables, x
    )
    assert logits.shape == (1, 256, 256, 5)
    assert points.shape == (1, 300, 3)


def test_unet_real_forward_small():
    # real numerics on a 96x96 input (bottleneck 6x6 -> fc_inch=1)
    model = SegmentationPointModel(filters=8, n_block=4, n_class=4, pointnet=True, fc_inch=1)
    x = jnp.array(np.random.default_rng(0).normal(size=(2, 96, 96, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, _, points = model.apply(variables, x, train=False)
    assert logits.shape == (2, 96, 96, 4)
    assert points.shape == (2, 300, 3)
    assert np.isfinite(np.array(logits)).all()
    assert np.isfinite(np.array(points)).all()
    # train-mode apply updates batch_stats
    (logits_t, _, _), mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert "batch_stats" in mutated
    stats0 = jax.tree.leaves(variables["batch_stats"])[0]
    stats1 = jax.tree.leaves(mutated["batch_stats"])[0]
    assert not np.allclose(np.array(stats0), np.array(stats1))


def test_unet_feature_dis_head():
    # subsumes the reference's Segmentation_model(feature_dis=True)
    # bottleneck classifier (unet.py:139-162)
    model = SegmentationPointModel(filters=8, n_block=2, n_class=4, feature_dis=True)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = _abstract_init(model, x, train=False)
    logits, feat, _ = jax.eval_shape(lambda v, x: model.apply(v, x, train=False), variables, x)
    assert logits.shape == (1, 32, 32, 4)
    assert feat.shape == (1, 8, 8, 4)  # bottleneck resolution


def test_discriminator_shapes():
    # patch sizes follow torch conv arithmetic: 224->113->57->29->15->8
    d = UncertaintyDiscriminator(in_channel=4)
    x = jnp.zeros((2, 224, 224, 4), jnp.float32)
    variables = _abstract_init(d, x)
    out = jax.eval_shape(lambda v, x: d.apply(v, x), variables, x)
    assert out.shape == (2, 8, 8, 1)
    # 256 input (MM-WHS, GAN.py smoke block): 256->129->65->33->17->9
    x = jnp.zeros((1, 256, 256, 5), jnp.float32)
    variables = _abstract_init(d, x)
    out = jax.eval_shape(lambda v, x: d.apply(v, x), variables, x)
    assert out.shape == (1, 9, 9, 1)


def test_discriminator_ext_shapes():
    d = UncertaintyDiscriminator(in_channel=5, ext=True)
    x = jnp.zeros((2, 256, 256, 5), jnp.float32)
    variables = _abstract_init(d, x)
    out = jax.eval_shape(lambda v, x: d.apply(v, x), variables, x)
    # 256->129->65->33->17 -> ext 9->5 -> conv5 -> 3
    assert out.shape == (2, 3, 3, 1)


def test_discriminator_real_forward():
    d = UncertaintyDiscriminator(in_channel=2)
    x = jnp.array(np.random.default_rng(1).normal(size=(2, 64, 64, 2)), jnp.float32)
    variables = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(variables, x)
    assert np.isfinite(np.array(out)).all()


def test_pointnetcls_shapes_and_forward():
    cls = PointNetCls()
    pts = jnp.array(np.random.default_rng(2).uniform(size=(2, 300, 3)), jnp.float32)
    variables = cls.init(jax.random.PRNGKey(0), pts, train=False)
    logit, trans, trans_feat = cls.apply(variables, pts, train=False)
    assert logit.shape == (2, 1)
    assert trans.shape == (2, 3, 3)
    assert trans_feat is None
    assert np.isfinite(np.array(logit)).all()


def test_pointnetcls_feature_transform():
    cls = PointNetCls(feature_transform=True)
    pts = jnp.zeros((2, 50, 3), jnp.float32)
    variables = _abstract_init(cls, pts, train=False)
    logit, trans, trans_feat = jax.eval_shape(
        lambda v, p: cls.apply(v, p, train=False), variables, pts
    )
    assert trans_feat.shape == (2, 64, 64)


def test_pointnetcls_batch_one():
    # reference switches BatchNorm->InstanceNorm at bs==1 (PointNetCls.py:40-55)
    cls = PointNetCls()
    pts = jnp.array(np.random.default_rng(3).uniform(size=(1, 100, 3)), jnp.float32)
    variables = cls.init(jax.random.PRNGKey(0), pts, train=False)
    logit, _, _ = cls.apply(variables, pts, train=False)
    assert logit.shape == (1, 1)
    assert np.isfinite(np.array(logit)).all()


def test_pointnetcls_ext_shapes():
    cls = PointNetCls(ext=True)
    pts = jnp.zeros((2, 300, 3), jnp.float32)
    variables = _abstract_init(cls, pts, train=False)
    logit, _, _ = jax.eval_shape(lambda v, p: cls.apply(v, p, train=False), variables, pts)
    assert logit.shape == (2, 1)


def test_feature_transform_regularizer():
    from pointcloududa_tpu.models import feature_transform_regularizer

    eye = jnp.broadcast_to(jnp.eye(64), (4, 64, 64))
    assert float(feature_transform_regularizer(eye)) < 1e-6
    notorth = eye * 2.0
    assert float(feature_transform_regularizer(notorth)) > 1.0


def test_init_distribution():
    # default conv init must be N(0, 0.02) (reference unet.py:203-208)
    model = SegmentationPointModel(filters=32, n_block=4, n_class=4)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(42), x, train=False)
    k = variables["params"]["bottleneck"]["bottleneck2"]["kernel"]
    std = float(jnp.std(k))
    assert 0.018 < std < 0.022
    assert abs(float(jnp.mean(k))) < 2e-3
