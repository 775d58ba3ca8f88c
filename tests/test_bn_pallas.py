"""Pallas BN batch-statistics kernel (ops/bn_pallas.py): numerics vs flax,
custom-VJP gradients vs autodiff of the jnp formulation, divisibility
fallback, and end-to-end model equivalence with ``bn_stats_impl``.

Kernels run in TPU interpret mode on the CPU test backend (same pattern as
tests/test_chamfer_pallas.py); the compiled kernel is exercised on real
hardware by bench.py / tools/smoke_train.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloududa_tpu.ops import bn_pallas
from pointcloududa_tpu.ops.packed import space_to_depth


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_stats_match_flax():
    from flax.linen import normalization as fnorm

    x = jnp.asarray(np.random.RandomState(0).randn(4, 16, 16, 128).astype(np.float32))
    x = x.astype(jnp.bfloat16)
    mean_ref, var_ref = fnorm._compute_stats(x, (0, 1, 2), dtype=jnp.float32)
    mean, var = bn_pallas.batch_stats_nhwc(x)
    np.testing.assert_allclose(mean, mean_ref, atol=1e-3)
    np.testing.assert_allclose(var, var_ref, atol=1e-2)


def test_stats_exact_vs_jnp_f32():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 32, 128).astype(np.float32))
    m_ref, q_ref = bn_pallas._stats_jnp(x.reshape(-1, 128))
    m, q = bn_pallas.bn_stats(x.reshape(-1, 128))
    np.testing.assert_allclose(m, m_ref, atol=1e-6)
    np.testing.assert_allclose(q, q_ref, atol=1e-5)


def test_packed_stats_match_unpacked():
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 32).astype(np.float32))
    mean_u, var_u = bn_pallas.batch_stats_nhwc(x)
    mean_p, var_p = bn_pallas.batch_stats_packed(space_to_depth(x))
    np.testing.assert_allclose(mean_p, mean_u, atol=1e-6)
    np.testing.assert_allclose(var_p, var_u, atol=1e-5)


def test_gradients_match_jnp_autodiff():
    x = jnp.asarray(np.random.RandomState(3).randn(512, 128).astype(np.float32))

    def loss_pallas(x):
        m, q = bn_pallas.bn_stats(x)
        return jnp.sum(m * jnp.arange(128.0)) + jnp.sum(q * 0.5)

    def loss_jnp(x):
        m, q = bn_pallas._stats_jnp(x)
        return jnp.sum(m * jnp.arange(128.0)) + jnp.sum(q * 0.5)

    g_p = jax.grad(loss_pallas)(x)
    g_j = jax.grad(loss_jnp)(x)
    np.testing.assert_allclose(g_p, g_j, atol=1e-6)


def test_non_divisible_rows_fall_back():
    # 7 rows has no power-of-two divisor >= 8 -> jnp fallback, still correct
    x = jnp.asarray(np.random.RandomState(4).randn(7, 128).astype(np.float32))
    m, q = bn_pallas.bn_stats(x)
    m_ref, q_ref = bn_pallas._stats_jnp(x)
    np.testing.assert_allclose(m, m_ref, atol=1e-6)
    np.testing.assert_allclose(q, q_ref, atol=1e-5)


def test_interpret_mode_handle_still_exists():
    """_tpu_kernel_viable leans on a private jax config attribute to detect
    interpret mode; if a jax upgrade renames it, the kernel's interpret-mode
    test coverage would silently vanish — fail loudly instead."""
    assert bn_pallas._interpret_mode_ctx() is not None, (
        "jax._src.config.pallas_tpu_interpret_mode_context_manager is gone; "
        "update ops/bn_pallas.py for this jax version"
    )


def test_twin_bn_unbiased_matches_torch():
    """The torch-exact running-variance update (unbiased n/(n-1) batch
    variance, PARITY.md former deviation 0) vs torch.nn.BatchNorm2d."""
    import torch

    from pointcloududa_tpu.models.unet import _TwinBatchNorm

    x = np.random.RandomState(7).randn(4, 6, 6, 16).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(16, momentum=0.1, eps=1e-5)
    tbn.weight.data.uniform_(0.5, 1.5)
    tbn.bias.data.normal_(0.0, 0.3)
    tbn.running_mean.normal_(0.0, 0.3)
    tbn.running_var.uniform_(0.5, 1.5)
    m = _TwinBatchNorm(unbiased=True)
    # .copy(): jnp.asarray can zero-copy CPU numpy views, and torch mutates
    # the running buffers in place during the train-mode forward below
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy().copy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy().copy()),
        },
        "batch_stats": {
            "mean": jnp.asarray(tbn.running_mean.numpy().copy()),
            "var": jnp.asarray(tbn.running_var.numpy().copy()),
        },
    }
    tbn.train()
    ref = tbn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    out, mut = m.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(ref.detach().numpy(), (0, 2, 3, 1)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]), tbn.running_mean.numpy(), atol=1e-6
    )
    # fp-tolerance agreement of the running variance — the whole point of
    # the unbiased flag (biased update would be off by ~var/(n-1) ~ 7e-3
    # at n=144, two orders of magnitude above this tolerance)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]), tbn.running_var.numpy(), atol=5e-5
    )


def test_pallas_bn_impl_rejected_on_mesh():
    """bn_stats_impl='pallas' cannot partition under a data mesh (the
    pallas_call is opaque to GSPMD — verified: an 8-device batch-sharded
    run RET_CHECK-fails inside the SPMD partitioner). build_models must
    reject the combination at build time instead of mid-training."""
    from pointcloududa_tpu.config import mscmrseg_default
    from pointcloududa_tpu.train.state import build_models

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device backend")
    cfg = mscmrseg_default(bn_stats_impl="pallas")  # num_devices=0 -> all
    with pytest.raises(ValueError, match="single-chip"):
        build_models(cfg)
    # explicit single-chip opt-in still builds
    build_models(mscmrseg_default(bn_stats_impl="pallas", num_devices=1))


def test_model_equivalent_with_pallas_bn():
    """bn_stats_impl is a pure execution choice: same logits, same running
    stats as the flax BatchNorm path (both packed and standard layouts)."""
    from pointcloududa_tpu.models.unet import SegmentationPointModel

    kw = dict(filters=8, n_block=2, n_class=4, pointnet=False, compute_dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 24, 24, 3).astype(np.float32))
    m_ref = SegmentationPointModel(**kw)
    v = m_ref.init(jax.random.PRNGKey(0), x, train=True)
    (lg_ref, _, _), mut_ref = m_ref.apply(v, x, train=True, mutable=["batch_stats"])
    for flags in (dict(bn_pallas=True), dict(bn_pallas=True, packed_level0=True)):
        m = SegmentationPointModel(**flags, **kw)
        assert jax.tree_util.tree_structure(
            m.init(jax.random.PRNGKey(0), x, train=True)
        ) == jax.tree_util.tree_structure(v)
        (lg, _, _), mut = m.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(lg, lg_ref, atol=1e-4)
        for a, b in zip(
            jax.tree_util.tree_leaves(mut_ref), jax.tree_util.tree_leaves(mut)
        ):
            np.testing.assert_allclose(b, a, atol=1e-5)
