"""Tests for the jitted 5-phase UDA train step.

A tiny config (filters=4, 96x96) keeps single-core CPU compile times sane
while exercising every phase, including the full d1+d2+d4 triple-adversary
path and the data-mesh sharded variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloududa_tpu.config import mscmrseg_default, mmwhs_default
from pointcloududa_tpu.data.synthetic import synthetic_batch, synthetic_eval_batch
from pointcloududa_tpu.train.state import (
    build_models,
    build_optimizers,
    create_train_state,
    get_generator_lr,
    set_generator_lr,
)
from pointcloududa_tpu.train.step import make_eval_step, make_train_step

TINY = dict(filters=4, crop_size=96, fc_inch=1, bs=4)


def _setup(**overrides):
    cfg = mscmrseg_default(**{**TINY, **overrides})
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))
    return cfg, state, step


def _leaf_diff(a, b):
    return max(
        float(jnp.max(jnp.abs(x - y)))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def _snapshot(tree):
    # the step donates its input state; copy what we want to compare
    return jax.tree.map(lambda x: np.array(x), tree)


def test_supervised_only_step():
    cfg, state, step = _setup()
    batch = synthetic_batch(cfg, 4)
    params0 = _snapshot(state.gen.params)
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["seg_loss"]))
    assert 0.0 <= float(metrics["seg_dice"]) <= 1.0
    # generator params moved
    assert _leaf_diff(new_state.gen.params, params0) > 0


def test_full_triple_adversary_step():
    cfg, state, step = _setup(d1=True, d2=True, d4=True)
    batch = synthetic_batch(cfg, 4)
    state1, m1 = step(state, batch)
    del state
    for k in [
        "seg_loss",
        "adv_loss",
        "ver_s_loss",
        "ver_t_loss",
        "dis1_acc1",
        "dis1_acc2",
        "dis2_acc1",
        "dis2_acc2",
        "dis4_acc1",
        "dis4_acc2",
    ]:
        assert np.isfinite(float(m1[k])), k
    # second step must not recompile or fail and should use the new state
    state2, m2 = step(state1, synthetic_batch(cfg, 4, seed=1))
    assert int(state2.step) == 2
    assert np.isfinite(float(m2["adv_loss"]))


def test_disc_only_updates_disc():
    cfg, state, step = _setup(d2=True)
    batch = synthetic_batch(cfg, 4)
    d2_params0 = _snapshot(state.d2.params)
    new_state, _ = step(state, batch)
    assert _leaf_diff(new_state.d2.params, d2_params0) > 0


def test_d4aux_trains_point_head_without_d4():
    cfg, state, step = _setup(d4aux=True)
    assert state.d4 is None
    batch = synthetic_batch(cfg, 4)
    p0 = _snapshot(state.gen.params["pointNet"])
    new_state, metrics = step(state, batch)
    assert "ver_s_loss" in metrics and np.isfinite(float(metrics["ver_s_loss"]))
    # point head params must receive gradient (chamfer in supervised loss)
    p1 = new_state.gen.params["pointNet"]
    assert _leaf_diff(p1, p0) > 0


def test_mmwhs_softmax_variant():
    cfg = mmwhs_default(**{**TINY, "softmax": True, "etpls": True, "Tetpls": True, "d2": True})
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))
    batch = synthetic_batch(cfg, 4)
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["entropy_loss"]))
    assert np.isfinite(float(metrics["entropy_loss_T"]))
    # normalised entropy of a C-class distribution is <= 1 per pixel
    assert float(metrics["entropy_loss"]) <= 1.0 + 1e-5


def test_bn_stats_updated_in_order():
    cfg, state, step = _setup(d4=True)
    batch = synthetic_batch(cfg, 4)
    gen_stats0 = _snapshot(state.gen.batch_stats)
    d4_stats0 = _snapshot(state.d4.batch_stats)
    new_state, _ = step(state, batch)
    assert _leaf_diff(new_state.gen.batch_stats, gen_stats0) > 0
    assert _leaf_diff(new_state.d4.batch_stats, d4_stats0) > 0


def test_lr_decay_mutation():
    cfg, state, _ = _setup()
    assert get_generator_lr(state) == pytest.approx(1e-3)
    state = set_generator_lr(state, get_generator_lr(state) * 0.2)
    assert get_generator_lr(state) == pytest.approx(2e-4)


def test_eval_step():
    cfg, state, _ = _setup(d4=True)
    gen, *_ = build_models(cfg)
    eval_step = make_eval_step(cfg, gen)
    out = eval_step(state.gen, synthetic_eval_batch(cfg, 4))
    assert np.isfinite(float(out["loss"]))
    assert 0.0 <= float(out["dice"]) <= 1.0
    assert out["logits"].shape == (4, 96, 96, 4)
    assert np.isfinite(float(out["vert_loss"]))


def test_step_under_data_mesh():
    """The same step function runs SPMD over an 8-device mesh with the batch
    sharded on 'data' and the state replicated."""
    from pointcloududa_tpu.parallel import create_mesh, replicate, shard_batch

    cfg, state, step = _setup(d2=True)
    mesh = create_mesh(8)
    state = replicate(state, mesh)
    batch = shard_batch(synthetic_batch(cfg, 8), mesh)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["seg_loss"]))
    assert int(new_state.step) == 1
    # sharded batch really is distributed
    assert len(batch["img_s"].sharding.device_set) == 8


def test_packed_step_equivalent_and_sharded():
    """The s2d-packed layout (ops/packed.py) is a pure execution change: a
    full triple-adversary step from the SAME init must produce the same
    metrics as the standard path (f32), and it must run SPMD over the mesh."""
    from pointcloududa_tpu.parallel import create_mesh, replicate, shard_batch

    cfg_s, state_s, step_s = _setup(d1=True, d2=True, d4=True)
    cfg_p, state_p, step_p = _setup(d1=True, d2=True, d4=True, packed_level0=True)
    batch = synthetic_batch(cfg_s, 4)
    _, m_s = step_s(state_s, batch)
    _, m_p = step_p(state_p, batch)
    # fp-reorder noise amplifies through the adversarial chain (softmax ->
    # D1 -> BCE on a ~0.02 loss); single-forward logits agree to ~1e-5
    # (tests/test_packed.py) while composed metrics drift ~1e-3 relative.
    # Structural errors produce O(1) differences. Discriminator accuracies
    # are thresholded counts over 4 samples (one fp-marginal flip = 0.25)
    # and are only range-checked.
    for k in m_s:
        if "acc" in k:
            assert 0.0 <= float(m_p[k]) <= 1.0, k
            continue
        np.testing.assert_allclose(
            float(m_p[k]), float(m_s[k]), rtol=5e-3, atol=1e-4, err_msg=k
        )

    # and under the 8-device data mesh
    cfg, state, step = _setup(d1=True, d2=True, d4=True, packed_level0=True, bs=8)
    mesh = create_mesh(8)
    state = replicate(state, mesh)
    sbatch = shard_batch(synthetic_batch(cfg, 8), mesh)
    _, metrics = step(state, sbatch)
    assert np.isfinite(float(metrics["seg_loss"]))
    assert np.isfinite(float(metrics["d4_loss"]))


@pytest.mark.parametrize("softmax", [False, True], ids=["sigmoid", "softmax"])
def test_packed_compute_step_equivalent(softmax):
    """cfg.packed_compute keeps logits/probs/entropy packed through the
    losses and feeds D1/D2 packed — a pure layout change: metrics must match
    the standard step from the same init (discrete accuracies range-checked,
    as in the packed_level0 test)."""
    over = dict(d1=True, d2=True, d4=True)
    if softmax:
        over.update(softmax=True, etpls=True, Tetpls=True)
    cfg_s, state_s, step_s = _setup(**over)
    cfg_p, state_p, step_p = _setup(packed_level0=True, packed_compute=True, **over)
    batch = synthetic_batch(cfg_s, 4)
    _, m_s = step_s(state_s, batch)
    _, m_p = step_p(state_p, batch)
    for k in m_s:
        if "acc" in k:
            assert 0.0 <= float(m_p[k]) <= 1.0, k
            continue
        np.testing.assert_allclose(
            float(m_p[k]), float(m_s[k]), rtol=5e-3, atol=1e-4, err_msg=k
        )

    # and under the 8-device data mesh (sigmoid engine only, for time)
    if not softmax:
        from pointcloududa_tpu.parallel import create_mesh, replicate, shard_batch

        cfg, state, step = _setup(
            d1=True, d2=True, d4=True, packed_level0=True, packed_compute=True, bs=8
        )
        mesh = create_mesh(8)
        state = replicate(state, mesh)
        sbatch = shard_batch(synthetic_batch(cfg, 8), mesh)
        _, metrics = step(state, sbatch)
        assert np.isfinite(float(metrics["seg_loss"]))
        assert np.isfinite(float(metrics["d1_loss"]))
