"""Uneven tail batches: pad + mask semantics.

The reference's ring sampler yields a truncated final batch when
``n_samples`` is hit mid-batch and its validation sets (78/77 slices at
bs 16) always end in one (``src/data_generator_mscmrseg.py:281-291``).
Here every such tail is wrap-padded to a static, mesh-divisible shape with a
``sample_mask``, and every loss/metric reduction excludes the pad — so the
values equal the reference's short-batch means, and the multi-device mesh
never sees an indivisible leading dim.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloududa_tpu.config import mscmrseg_default
from pointcloududa_tpu.ops import losses
from pointcloududa_tpu.parallel import create_mesh, pad_batch, shard_batch


def _padded(rng, shape, n_valid):
    """Random array whose first n_valid rows are 'real'; pads wrap."""
    x = rng.uniform(size=shape).astype(np.float32)
    t = shape[0]
    idx = np.arange(t) % n_valid
    return x[idx]


@pytest.fixture
def mask_case():
    rng = np.random.default_rng(3)
    n, t = 5, 8
    sm = (np.arange(t) < n).astype(np.float32)
    return rng, n, t, sm


def test_masked_mean_equals_valid_slice(mask_case):
    rng, n, t, sm = mask_case
    x = rng.normal(size=(t, 3, 4)).astype(np.float32)
    got = losses.masked_mean(jnp.asarray(x), jnp.asarray(sm))
    np.testing.assert_allclose(float(got), x[:n].mean(), rtol=1e-6)


def test_masked_bce_from_probs_value_and_grad(mask_case):
    rng, n, t, sm = mask_case
    probs = rng.uniform(0.01, 0.99, size=(t, 6, 6, 4)).astype(np.float32)
    targets = (rng.uniform(size=(t, 6, 6, 4)) > 0.5).astype(np.float32)

    full = losses.bce_from_probs(jnp.asarray(probs[:n]), jnp.asarray(targets[:n]))
    masked = losses.bce_from_probs(
        jnp.asarray(probs), jnp.asarray(targets), sample_mask=jnp.asarray(sm)
    )
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)

    g_full = jax.grad(lambda p: losses.bce_from_probs(p, jnp.asarray(targets[:n])))(
        jnp.asarray(probs[:n])
    )
    g_masked = jax.grad(
        lambda p: losses.bce_from_probs(p, jnp.asarray(targets), sample_mask=jnp.asarray(sm))
    )(jnp.asarray(probs))
    np.testing.assert_allclose(np.asarray(g_masked)[:n], np.asarray(g_full), rtol=1e-5)
    # pad rows get exactly zero gradient
    assert np.all(np.asarray(g_masked)[n:] == 0.0)


def test_masked_bce_saturated_grads_finite(mask_case):
    """The torch backward-clamp must survive in the masked VJP too."""
    rng, n, t, sm = mask_case
    probs = np.zeros((t, 4), np.float32)  # fully saturated
    probs[:, 0] = 1.0
    targets = np.ones((t, 4), np.float32)
    g = jax.grad(
        lambda p: losses.bce_from_probs(p, jnp.asarray(targets), sample_mask=jnp.asarray(sm))
    )(jnp.asarray(probs))
    assert np.all(np.isfinite(np.asarray(g)))


def test_masked_bce_with_logits(mask_case):
    rng, n, t, sm = mask_case
    logits = rng.normal(size=(t, 5, 5, 1)).astype(np.float32)
    full = losses.bce_with_logits(jnp.asarray(logits[:n]), 1.0)
    masked = losses.bce_with_logits(jnp.asarray(logits), 1.0, jnp.asarray(sm))
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)


def test_masked_cross_entropy(mask_case):
    rng, n, t, sm = mask_case
    x = rng.normal(size=(t, 6, 6, 5)).astype(np.float32)
    lbl = rng.integers(0, 5, size=(t, 6, 6))
    full = losses.cross_entropy(jnp.asarray(x[:n]), jnp.asarray(lbl[:n]))
    masked = losses.cross_entropy(
        jnp.asarray(x), jnp.asarray(lbl), sample_mask=jnp.asarray(sm)
    )
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)


def test_masked_jaccard(mask_case):
    rng, n, t, sm = mask_case
    probs = rng.uniform(size=(t, 6, 6, 4)).astype(np.float32)
    true = (rng.uniform(size=(t, 6, 6, 4)) > 0.5).astype(np.float32)
    full = losses.jaccard_loss(jnp.asarray(true[:n]), jnp.asarray(probs[:n]))
    masked = losses.jaccard_loss(
        jnp.asarray(true), jnp.asarray(probs), sample_mask=jnp.asarray(sm)
    )
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)


def test_masked_chamfer(mask_case):
    rng, n, t, sm = mask_case
    x = rng.normal(size=(t, 20, 3)).astype(np.float32)
    y = rng.normal(size=(t, 24, 3)).astype(np.float32)
    full = losses.chamfer_loss(jnp.asarray(x[:n]), jnp.asarray(y[:n]))
    masked = losses.chamfer_loss(jnp.asarray(x), jnp.asarray(y), sample_mask=jnp.asarray(sm))
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)


def test_masked_dice_coef(mask_case):
    rng, n, t, sm = mask_case
    true = jax.nn.one_hot(rng.integers(0, 4, size=(t, 6, 6)), 4).astype(np.float32)
    pred = jax.nn.one_hot(rng.integers(0, 4, size=(t, 6, 6)), 4).astype(np.float32)
    full = losses.dice_coef_multilabel(jnp.asarray(true[:n]), jnp.asarray(pred[:n]))
    masked = losses.dice_coef_multilabel(
        jnp.asarray(true), jnp.asarray(pred), sample_mask=jnp.asarray(sm)
    )
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)


# --------------------------------------------------------------------- #
def test_pad_batch_wraps_and_masks():
    raw = {"img": np.arange(14 * 2, dtype=np.float32).reshape(14, 2)}
    out = pad_batch(raw, 8)
    assert out["img"].shape == (16, 2)
    np.testing.assert_array_equal(out["img"][14], raw["img"][0])  # wrap
    np.testing.assert_array_equal(out["sample_mask"], [1.0] * 14 + [0.0] * 2)
    # divisible batches pass through untouched
    ok = {"img": np.zeros((16, 2), np.float32)}
    assert pad_batch(ok, 8) is ok
    # an existing mask is extended, not overwritten
    pre = {"img": np.zeros((6, 2), np.float32), "sample_mask": np.array([1, 1, 1, 1, 0, 0], np.float32)}
    out2 = pad_batch(pre, 8)
    np.testing.assert_array_equal(out2["sample_mask"], [1, 1, 1, 1, 0, 0, 0, 0])


def test_shard_batch_accepts_indivisible_dict():
    mesh = create_mesh(8)
    batch = {"x": np.ones((14, 3), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["x"].shape == (16, 3)
    np.testing.assert_array_equal(
        np.asarray(out["sample_mask"]), [1.0] * 14 + [0.0] * 2
    )
    with pytest.raises(ValueError):
        shard_batch(np.ones((14, 3), np.float32), mesh)


# --------------------------------------------------------------------- #
class _UnevenTrainIter:
    """ns=10, bs=4 -> batches of 4, 4, 2 (reference ring-tail semantics)."""

    def __init__(self, cfg, seed=0):
        self.cfg = cfg
        self.seed = seed
        self.steps_per_epoch = 3

    def epoch(self):
        rng = np.random.default_rng(self.seed)
        hw = self.cfg.crop_size
        for n in (4, 4, 2):
            yield {
                "img_s": rng.integers(0, 255, size=(n, hw, hw, 3)).astype(np.uint8),
                "mask_s": rng.integers(0, self.cfg.n_class, size=(n, hw, hw)).astype(np.uint8),
                "img_t": rng.integers(0, 255, size=(n, hw, hw, 3)).astype(np.uint8),
            }


def _uneven_val(cfg, seed=1):
    def make():
        rng = np.random.default_rng(seed)
        hw = cfg.crop_size
        for n in (4, 2):  # 6 items at bs 4: short tail
            yield {
                "img": rng.integers(0, 255, size=(n, hw, hw, 3)).astype(np.uint8),
                "mask": rng.integers(0, cfg.n_class, size=(n, hw, hw)).astype(np.uint8),
            }

    return make


def _make_trainer(cfg, mesh, tmp_path, tag):
    from pointcloududa_tpu.train.loop import UDATrainer

    return UDATrainer(
        cfg,
        _UnevenTrainIter(cfg),
        {"val": _uneven_val(cfg), "val_lge": _uneven_val(cfg, 2), "test_lge": _uneven_val(cfg, 3)},
        workdir=str(tmp_path / f"w{tag}"),
        logdir=str(tmp_path / f"r{tag}"),
        mesh=mesh,
    )


def test_trainer_uneven_tails_mesh_matches_single_device(tmp_path):
    """Full UDATrainer (d1+d2) on an 8-device mesh with indivisible train
    AND validation tails must run and reproduce the single-device metrics
    (GSPMD psums over the masked global batch == local masked reductions)."""
    cfg = mscmrseg_default(
        filters=4, crop_size=32, fc_inch=0, n_block=2, bs=4, ns=10,
        epochs=1, aug="", d1=True, d2=True,
    )
    t_mesh = _make_trainer(cfg, create_mesh(8), tmp_path, "m")
    t_solo = _make_trainer(cfg, None, tmp_path, "s")

    tr_m = t_mesh.train_epoch()
    tr_s = t_solo.train_epoch()
    assert tr_m and tr_s
    for k in tr_s:
        np.testing.assert_allclose(tr_m[k], tr_s[k], rtol=2e-3, atol=2e-3, err_msg=k)

    vr_m = t_mesh.validate()
    vr_s = t_solo.validate()
    for k in vr_s:
        np.testing.assert_allclose(vr_m[k], vr_s[k], rtol=2e-3, atol=2e-3, err_msg=k)


def test_validation_tail_matches_unpadded_reference_semantics(tmp_path):
    """The padded+masked tail batch must produce the same per-batch metric
    values the reference gets from just running the short batch."""
    cfg = mscmrseg_default(filters=4, crop_size=32, fc_inch=0, n_block=2, bs=4, epochs=1, aug="")
    from pointcloududa_tpu.train.loop import UDATrainer

    tr = _make_trainer(cfg, None, tmp_path, "v")

    # hand-compute: eval_step on the raw short batch (no pad) per batch
    outs = []
    for raw in _uneven_val(cfg)():
        batch = tr.pre_eval(jax.device_put(raw))
        out = tr.eval_step(tr.state.gen, batch)
        outs.append({k: float(v) for k, v in out.items() if k != "logits"})
    expect = {k: float(np.mean([o[k] for o in outs])) for k in outs[0]}

    got = tr._validate_one(_uneven_val(cfg))
    for k in expect:
        np.testing.assert_allclose(got[k], expect[k], rtol=1e-4, err_msg=k)
