"""GSPMD correctness: the sharded train step must reproduce single-device
numerics over the same global batch (global-batch BN + psum'd gradients,
docs/SCALING.md), up to reduction-order fp noise."""

import jax
import numpy as np

from pointcloududa_tpu.config import mscmrseg_default
from pointcloududa_tpu.data.synthetic import synthetic_batch
from pointcloududa_tpu.parallel import create_mesh, replicate, shard_batch
from pointcloududa_tpu.train.state import build_models, build_optimizers, create_train_state
from pointcloududa_tpu.train.step import make_train_step


def test_mesh_step_matches_single_device():
    cfg = mscmrseg_default(filters=4, n_block=2, crop_size=32, fc_inch=0, bs=8, d2=True)
    batch = synthetic_batch(cfg, 8)

    def run(mesh):
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))
        if mesh is not None:
            state = replicate(state, mesh)
            b = shard_batch(dict(batch), mesh)
        else:
            b = jax.device_put(dict(batch))
        metrics = None
        for _ in range(3):
            state, metrics = step(state, b)
        out = {k: float(v) for k, v in metrics.items()}
        out["param_norm"] = float(
            sum(jax.numpy.sum(x.astype(jax.numpy.float32) ** 2) for x in jax.tree.leaves(state.gen.params))
        )
        return out

    single = run(None)
    sharded = run(create_mesh(8))
    for k in single:
        np.testing.assert_allclose(single[k], sharded[k], rtol=5e-4, atol=1e-5, err_msg=k)
