"""Serving predictor + StableHLO export tests, and train-step determinism."""

import numpy as np
import jax

from pointcloududa_tpu.config import mscmrseg_default
from pointcloududa_tpu.eval.predictor import Predictor, export_predictor, load_exported
from pointcloududa_tpu.train.state import build_models, build_optimizers, create_train_state
from pointcloududa_tpu.train.step import make_train_step

TINY = dict(filters=4, n_block=2, crop_size=32, fc_inch=0)


def test_predictor_tail_padding():
    cfg = mscmrseg_default(**TINY)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    pred = Predictor(cfg, state.gen, batch_size=4)
    x = np.random.default_rng(0).uniform(size=(6, 32, 32, 3)).astype(np.float32)
    logits, points = pred(x)
    assert logits.shape == (6, 32, 32, 4)
    assert points is None
    # padding must not change per-sample outputs
    logits2, _ = pred(x[:3])
    np.testing.assert_allclose(logits2, logits[:3], rtol=2e-5, atol=1e-5)


def test_export_roundtrip():
    cfg = mscmrseg_default(**TINY)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    blob = export_predictor(cfg, state.gen, batch_size=2)
    assert isinstance(blob, bytes) and len(blob) > 1000
    runner = load_exported(blob)
    x = np.random.default_rng(1).uniform(size=(2, 32, 32, 3)).astype(np.float32)
    out = np.asarray(runner(x))
    pred = Predictor(cfg, state.gen, batch_size=2)
    ref, _ = pred(x)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-5)


def test_train_step_deterministic():
    cfg = mscmrseg_default(**TINY, bs=2, d2=True)
    from pointcloududa_tpu.data.synthetic import synthetic_batch

    batch = synthetic_batch(cfg, 2)
    runs = []
    for _ in range(2):
        state = create_train_state(cfg, jax.random.PRNGKey(7))
        step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))
        _, m = step(state, dict(batch))
        runs.append({k: float(v) for k, v in m.items()})
    assert runs[0] == runs[1]
