"""Pallas Chamfer kernel vs the jnp reference implementation — values and
gradients (interpret mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloududa_tpu.ops import losses
from pointcloududa_tpu.ops import chamfer_pallas


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # run pallas kernels interpreted on the CPU test backend
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_pallas_chamfer_matches_jnp():
    rng = np.random.default_rng(0)
    x = jnp.array(rng.uniform(size=(3, 40, 3)), jnp.float32)
    y = jnp.array(rng.uniform(size=(3, 40, 3)), jnp.float32)
    ours = float(chamfer_pallas.chamfer_loss_pallas(x, y))
    ref = float(losses.chamfer_loss(x, y))
    assert abs(ours - ref) < 1e-5


def test_pallas_chamfer_identical_sets():
    rng = np.random.default_rng(1)
    x = jnp.array(rng.uniform(size=(2, 30, 3)), jnp.float32)
    val = float(chamfer_pallas.chamfer_loss_pallas(x, x))
    assert abs(val - 2 * np.sqrt(1e-5)) < 1e-5


def test_pallas_chamfer_gradients_match():
    rng = np.random.default_rng(2)
    x = jnp.array(rng.uniform(size=(2, 24, 3)), jnp.float32)
    y = jnp.array(rng.uniform(size=(2, 24, 3)), jnp.float32)
    gx_p, gy_p = jax.grad(chamfer_pallas.chamfer_loss_pallas, argnums=(0, 1))(x, y)
    gx_j, gy_j = jax.grad(lambda a, b: losses.chamfer_loss(a, b), argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.array(gx_p), np.array(gx_j), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.array(gy_p), np.array(gy_j), rtol=1e-4, atol=1e-5)


def test_tiled_directional_nn_matches_bruteforce():
    """The streaming min/argmin accumulator (large-cloud path) against a
    dense numpy brute force, with non-tile-multiple row counts (pad rows
    must never win an argmin)."""
    rng = np.random.default_rng(5)
    x = jnp.array(rng.uniform(size=(2, 70, 3)), jnp.float32)
    y = jnp.array(rng.uniform(size=(2, 53, 3)), jnp.float32)
    mins, idxs = chamfer_pallas._nn_directional_tiled(x, y, tile=16)
    d2 = np.sum(
        (np.asarray(x)[:, :, None, :] - np.asarray(y)[:, None, :, :]) ** 2, axis=-1
    )
    np.testing.assert_allclose(np.asarray(mins), d2.min(axis=2), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idxs), d2.argmin(axis=2))


def test_large_cloud_path_value_and_grads_match_jnp():
    """Above the VMEM-matrix limit the tiled kernels + segment_sum backward
    take over; values and gradients must still match the jnp reference."""
    rng = np.random.default_rng(6)
    n, m = 600, 530  # n*m > _SMALL_LIMIT with tile=512 via monkey limit
    x = jnp.array(rng.uniform(size=(2, n, 3)), jnp.float32)
    y = jnp.array(rng.uniform(size=(2, m, 3)), jnp.float32)
    import pointcloududa_tpu.ops.chamfer_pallas as cp

    old = cp._SMALL_LIMIT
    cp._SMALL_LIMIT = 1  # force the tiled path at this test size
    try:
        val = float(cp.chamfer_loss_pallas(x, y))
        ref = float(losses.chamfer_loss(x, y))
        assert abs(val - ref) < 1e-5
        gx_p, gy_p = jax.grad(cp.chamfer_loss_pallas, argnums=(0, 1))(x, y)
        gx_j, gy_j = jax.grad(lambda a, b: losses.chamfer_loss(a, b), argnums=(0, 1))(x, y)
        np.testing.assert_allclose(np.array(gx_p), np.array(gx_j), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.array(gy_p), np.array(gy_j), rtol=1e-4, atol=1e-5)
    finally:
        cp._SMALL_LIMIT = old
