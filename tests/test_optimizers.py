"""Optimizer parity: the optax chains must reproduce torch.optim
trajectories step-for-step (the reference's Adam(0.9,0.99) generator and
SGD(momentum, wd=5e-4) discriminators, SURVEY.md §2.3)."""

import numpy as np
import pytest
import jax.numpy as jnp
import optax

from pointcloududa_tpu.train.state import adam_reference, sgd_reference

torch = pytest.importorskip("torch")


def _run_optax(tx, w0, grads):
    w = jnp.asarray(w0)
    state = tx.init(w)
    out = []
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, updates)
        out.append(np.asarray(w).copy())
    return out


def _run_torch(opt_ctor, w0, grads):
    w = torch.tensor(np.asarray(w0), requires_grad=True)
    opt = opt_ctor([w])
    out = []
    for g in grads:
        opt.zero_grad()
        w.grad = torch.tensor(np.asarray(g))
        opt.step()
        out.append(w.detach().numpy().copy())
    return out


@pytest.fixture
def traj():
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(7,)).astype(np.float32)
    grads = [rng.normal(size=(7,)).astype(np.float32) for _ in range(10)]
    return w0, grads


def test_adam_matches_torch(traj):
    w0, grads = traj
    ours = _run_optax(adam_reference(1e-3), w0, grads)
    ref = _run_torch(lambda p: torch.optim.Adam(p, lr=1e-3, betas=(0.9, 0.99)), w0, grads)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_sgd_momentum_wd_matches_torch(traj):
    w0, grads = traj
    ours = _run_optax(sgd_reference(2.5e-2, momentum=0.99, weight_decay=5e-4), w0, grads)
    ref = _run_torch(
        lambda p: torch.optim.SGD(p, lr=2.5e-2, momentum=0.99, weight_decay=5e-4), w0, grads
    )
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_sgd_momentum_095_matches_torch(traj):
    # the MM-WHS discriminator default momentum (train_mmwhs.py:466-489)
    w0, grads = traj
    ours = _run_optax(sgd_reference(1e-4, momentum=0.95), w0, grads)
    ref = _run_torch(
        lambda p: torch.optim.SGD(p, lr=1e-4, momentum=0.95, weight_decay=5e-4), w0, grads
    )
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


def test_per_workload_disc_momentum_defaults():
    """MS-CMRSeg hardcodes .99 (src/train_mscmrseg.py:434-454); MM-WHS
    defaults its flags to .95 (src/train_mmwhs.py:466-489,856-859)."""
    from pointcloududa_tpu.config import mmwhs_default, mscmrseg_default

    ms = mscmrseg_default()
    assert [ms.disc_momentum(d) for d in ("d1", "d2", "d4")] == [0.99] * 3
    mm = mmwhs_default()
    assert [mm.disc_momentum(d) for d in ("d1", "d2", "d4")] == [0.95] * 3
    # MM-WHS -dmmt overrides all three; per-disc flags apply only at the
    # default sentinel (train_mmwhs.py:471,479,487)
    mm2 = mmwhs_default(dmmt=0.8, d1mmt=0.7)
    assert [mm2.disc_momentum(d) for d in ("d1", "d2", "d4")] == [0.8] * 3
    mm3 = mmwhs_default(d1mmt=0.7)
    assert [mm3.disc_momentum(d) for d in ("d1", "d2", "d4")] == [0.7, 0.95, 0.95]


def test_built_disc_optimizer_momentum_mscmrseg(traj):
    """End-to-end: the tx build_optimizers() actually hands the MS-CMRSeg
    trainer steps like torch SGD(momentum=.99, wd=5e-4)."""
    from pointcloududa_tpu.config import mscmrseg_default
    from pointcloududa_tpu.train.state import build_optimizers

    w0, grads = traj
    cfg = mscmrseg_default(d1=True)
    _, d1_tx, _, _ = build_optimizers(cfg)
    ours = _run_optax(d1_tx, w0, grads)
    ref = _run_torch(
        lambda p: torch.optim.SGD(p, lr=cfg.d1lr, momentum=0.99, weight_decay=5e-4), w0, grads
    )
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


def test_generator_sgd_ignores_mmt_flag(traj):
    """Reference quirk: -mmt reaches only the appendix string; the -sgd
    generator optimiser hardcodes momentum .95 (src/train_mmwhs.py:453-459
    vs :744-745)."""
    from pointcloududa_tpu.config import mmwhs_default
    from pointcloududa_tpu.train.state import build_optimizers

    w0, grads = traj
    cfg = mmwhs_default(sgd=True, mmt=0.5)
    gen_tx, _, _, _ = build_optimizers(cfg)
    ours = _run_optax(gen_tx, w0, grads)
    ref = _run_torch(
        lambda p: torch.optim.SGD(p, lr=cfg.lr, momentum=0.95, weight_decay=5e-4), w0, grads
    )
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)