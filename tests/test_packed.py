"""Space-to-depth packed execution path (ops/packed.py, models/unet.py
``packed_level0``): exact op-level transforms + end-to-end model equivalence.

The packed path is a pure TPU execution-layout change of the level-0 U-Net
ops (reference ``src/networks/unet.py:23-51,100-136``); these tests pin that
it is numerically the standard path: identical param/state trees (checkpoint
interop) and matching logits/points/BN-stats/gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from pointcloududa_tpu.models.unet import SegmentationPointModel
from pointcloududa_tpu.ops import packed as P


def _conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _up2(x):
    b, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(
        b, 2 * h, 2 * w, c
    )


@pytest.fixture(scope="module")
def rnd():
    return np.random.RandomState(7)


def test_space_to_depth_roundtrip(rnd):
    x = jnp.asarray(rnd.randn(2, 8, 12, 5).astype(np.float32))
    assert jnp.array_equal(P.depth_to_space(P.space_to_depth(x)), x)


def test_packed_conv_matches_same_conv(rnd):
    x = jnp.asarray(rnd.randn(2, 12, 16, 5).astype(np.float32))
    w = jnp.asarray(rnd.randn(3, 3, 5, 7).astype(np.float32))
    b = jnp.asarray(rnd.randn(7).astype(np.float32))
    ref = _conv(x, w) + b
    got = P.depth_to_space(P.packed_conv(P.space_to_depth(x), P.pack_conv_kernel(w), P.pack_bias(b)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_packed_upconv_fuses_nearest_up_and_conv(rnd):
    x = jnp.asarray(rnd.randn(2, 6, 9, 5).astype(np.float32))
    w = jnp.asarray(rnd.randn(3, 3, 5, 4).astype(np.float32))
    b = jnp.asarray(rnd.randn(4).astype(np.float32))
    ref = _conv(_up2(x), w) + b
    got = P.depth_to_space(P.packed_conv(x, P.pack_upconv_kernel(w), P.pack_bias(b)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_packed_pointwise_matches_1x1(rnd):
    x = jnp.asarray(rnd.randn(2, 8, 8, 6).astype(np.float32))
    w = jnp.asarray(rnd.randn(1, 1, 6, 3).astype(np.float32))
    b = jnp.asarray(rnd.randn(3).astype(np.float32))
    ref = _conv(x, w) + b
    got = P.depth_to_space(
        P.packed_conv(P.space_to_depth(x), P.pack_pointwise_kernel(w), P.pack_bias(b))
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_packed_max_pool_matches_2x2(rnd):
    x = jnp.asarray(rnd.randn(2, 10, 14, 5).astype(np.float32))
    ref = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    assert jnp.array_equal(P.packed_max_pool(P.space_to_depth(x)), ref)


def test_packed_bn_stats_match_flax(rnd):
    from flax.linen import normalization as fnorm

    x = jnp.asarray(rnd.randn(3, 8, 8, 6).astype(np.float32))
    mean_ref, var_ref = fnorm._compute_stats(x, (0, 1, 2), dtype=jnp.float32)
    mean, var = P.packed_bn_stats(P.space_to_depth(x))
    np.testing.assert_allclose(mean, mean_ref, atol=1e-6)
    np.testing.assert_allclose(var, var_ref, atol=1e-5)


# ---------------------------------------------------------------- model level

_KW = dict(
    filters=8, n_block=2, n_class=4, pointnet=False, batchnorm=True, compute_dtype=jnp.float32
)
# every packed combination must be indistinguishable from the standard path
_PACKED_FLAGS = [
    dict(packed_level0=True),
    dict(packed_level1=True),
    dict(packed_level0=True, packed_level1=True),
]


@pytest.fixture(scope="module", params=range(len(_PACKED_FLAGS)), ids=["l0", "l1", "l0l1"])
def models_and_vars(rnd, request):
    m_std = SegmentationPointModel(**_KW)
    m_pkd = SegmentationPointModel(**_PACKED_FLAGS[request.param], **_KW)
    x = jnp.asarray(rnd.randn(2, 24, 24, 3).astype(np.float32))
    v = m_std.init(jax.random.PRNGKey(0), x, train=True)
    return m_std, m_pkd, v, x


def test_param_state_trees_identical(models_and_vars):
    m_std, m_pkd, v, x = models_and_vars
    v_pkd = m_pkd.init(jax.random.PRNGKey(0), x, train=True)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_pkd)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(v), jax.tree_util.tree_leaves_with_path(v_pkd)
    ):
        assert a.shape == b.shape and a.dtype == b.dtype, path


def test_train_forward_and_stats_equivalent(models_and_vars):
    m_std, m_pkd, v, x = models_and_vars
    (lg_s, _, _), mut_s = m_std.apply(v, x, train=True, mutable=["batch_stats"])
    (lg_p, _, _), mut_p = m_pkd.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(lg_p, lg_s, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(mut_s), jax.tree_util.tree_leaves(mut_p)):
        np.testing.assert_allclose(b, a, atol=1e-5)


def test_eval_forward_equivalent(models_and_vars):
    m_std, m_pkd, v, x = models_and_vars
    _, mut = m_std.apply(v, x, train=True, mutable=["batch_stats"])
    v2 = {"params": v["params"], "batch_stats": mut["batch_stats"]}
    lg_s, _, _ = m_std.apply(v2, x, train=False)
    lg_p, _, _ = m_pkd.apply(v2, x, train=False)
    np.testing.assert_allclose(lg_p, lg_s, atol=1e-4)


def test_gradients_equivalent(models_and_vars):
    m_std, m_pkd, v, x = models_and_vars

    def grads(m):
        def f(params):
            (lg, _, _), _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean(jnp.square(lg))

        return jax.grad(f)(v["params"])

    gs, gp = grads(m_std), grads(m_pkd)
    # per-leaf infinity error against the GLOBAL gradient scale: tiny leaves
    # (e.g. the classifier bias, whose true grad is ~0 here) carry fp-reorder
    # noise that a per-leaf relative test mistakes for signal
    gscale = max(float(jnp.abs(a).max()) for a in jax.tree_util.tree_leaves(gs))
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gs), jax.tree_util.tree_leaves_with_path(gp)
    ):
        err = float(jnp.abs(a - b).max()) / gscale
        assert err < 1e-4, (path, err)


def test_pointnet_head_unaffected(rnd):
    """The point head taps the bottleneck — packed levels must not move it."""
    kw = dict(
        filters=8, n_block=4, n_class=4, pointnet=True, fc_inch=1, batchnorm=True,
        compute_dtype=jnp.float32,
    )
    m_std = SegmentationPointModel(**kw)
    m_pkd = SegmentationPointModel(packed_level0=True, packed_level1=True, **kw)
    x = jnp.asarray(rnd.randn(1, 96, 96, 3).astype(np.float32))
    v = m_std.init(jax.random.PRNGKey(1), x, train=True)
    (_, _, pt_s), _ = m_std.apply(v, x, train=True, mutable=["batch_stats"])
    (_, _, pt_p), _ = m_pkd.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(pt_p, pt_s, atol=1e-4)


def test_odd_input_rejected():
    m = SegmentationPointModel(packed_level0=True, **_KW)
    with pytest.raises(ValueError, match="even"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 23, 24, 3)), train=True)


def test_checkpoint_interop_across_layouts(tmp_path, rnd):
    """A checkpoint written by the standard layout restores into the packed
    model (and vice versa) and predicts identically — parameters live in the
    unpacked shapes regardless of execution layout."""
    from pointcloududa_tpu.train import checkpoint as ckpt_lib

    m_std = SegmentationPointModel(**_KW)
    m_pkd = SegmentationPointModel(packed_level0=True, packed_level1=True, **_KW)
    x = jnp.asarray(rnd.randn(2, 24, 24, 3).astype(np.float32))
    v = m_std.init(jax.random.PRNGKey(2), x, train=True)

    path = str(tmp_path / "ckpt")
    ckpt_lib.save_pytree(path, {"params": v["params"], "batch_stats": v["batch_stats"]})
    v_template = m_pkd.init(jax.random.PRNGKey(3), x, train=True)  # different init
    restored = ckpt_lib.restore_pytree(path, {"params": v_template["params"],
                                              "batch_stats": v_template["batch_stats"]})

    lg_std, _, _ = m_std.apply(v, x, train=False)
    lg_pkd, _, _ = m_pkd.apply(restored, x, train=False)
    np.testing.assert_allclose(lg_pkd, lg_std, atol=1e-4)


def test_stride2_packed_conv_matches(rnd):
    x = jnp.asarray(rnd.randn(2, 24, 28, 5).astype(np.float32))
    w = jnp.asarray(rnd.randn(4, 4, 5, 7).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (2, 2), ((2, 2), (2, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = P.packed_stride2_conv(P.space_to_depth(x), P.pack_stride2_kernel(w))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_discriminator_packed_input_equivalent(rnd):
    from pointcloududa_tpu.models.discriminator import UncertaintyDiscriminator

    m_std = UncertaintyDiscriminator(in_channel=4, compute_dtype=jnp.float32)
    m_pkd = UncertaintyDiscriminator(in_channel=4, packed_input=True, compute_dtype=jnp.float32)
    x = jnp.asarray(rnd.randn(2, 48, 48, 4).astype(np.float32))
    v = m_std.init(jax.random.PRNGKey(0), x)
    v_p = m_pkd.init(jax.random.PRNGKey(0), P.space_to_depth(x))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_p)
    ref = m_std.apply(v, x)
    got = m_pkd.apply(v, P.space_to_depth(x))
    np.testing.assert_allclose(got, ref, atol=2e-4)
