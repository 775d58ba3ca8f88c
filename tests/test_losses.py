"""Golden-value tests for the loss functions.

Strategy (SURVEY.md §4): every loss is validated against an independent
implementation — either hand-derived numpy or torch.nn.functional (the same
functional ops the reference composes), never against the reference code
itself.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pointcloududa_tpu.ops import losses

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

RNG = np.random.default_rng(0)


def test_bce_from_probs_matches_torch():
    probs = RNG.uniform(1e-4, 1 - 1e-4, size=(4, 8, 8, 3)).astype(np.float32)
    targets = (RNG.uniform(size=(4, 8, 8, 3)) > 0.5).astype(np.float32)
    ours = float(losses.bce_from_probs(jnp.array(probs), jnp.array(targets)))
    ref = float(torch.nn.BCELoss()(torch.tensor(probs), torch.tensor(targets)))
    assert abs(ours - ref) < 1e-5


def test_bce_from_probs_clamps_like_torch():
    # torch clamps log at -100; saturated probabilities must not produce inf
    probs = np.array([[0.0, 1.0, 0.5]], dtype=np.float32)
    targets = np.array([[1.0, 0.0, 1.0]], dtype=np.float32)
    ours = float(losses.bce_from_probs(jnp.array(probs), jnp.array(targets)))
    ref = float(torch.nn.BCELoss()(torch.tensor(probs), torch.tensor(targets)))
    assert np.isfinite(ours)
    assert abs(ours - ref) < 1e-4


def test_bce_from_probs_grad_matches_torch_and_is_finite_at_saturation():
    import jax

    probs = np.array([[0.0, 1.0, 0.3, 1e-20, 1.0 - 1e-7]], dtype=np.float32)
    targets = np.array([[1.0, 0.0, 1.0, 1.0, 0.0]], dtype=np.float32)
    g = np.array(jax.grad(losses.bce_from_probs)(jnp.array(probs), jnp.array(targets)))
    assert np.isfinite(g).all()  # plain autodiff would NaN at p in {0, 1}
    tp = torch.tensor(probs, requires_grad=True)
    torch.nn.BCELoss()(tp, torch.tensor(targets)).backward()
    np.testing.assert_allclose(g, tp.grad.numpy(), rtol=1e-4)


def test_bce_with_logits_matches_torch():
    logits = RNG.normal(size=(2, 15, 15, 1)).astype(np.float32) * 5
    for label in (0.0, 1.0):
        ours = float(losses.bce_with_logits(jnp.array(logits), label))
        ref = float(
            F.binary_cross_entropy_with_logits(
                torch.tensor(logits), torch.full(logits.shape, label)
            )
        )
        assert abs(ours - ref) < 1e-5


def test_cross_entropy_matches_torch():
    x = RNG.normal(size=(3, 5, 6, 6)).astype(np.float32)  # NCHW for torch
    labels = RNG.integers(0, 5, size=(3, 6, 6))
    ref = float(F.cross_entropy(torch.tensor(x), torch.tensor(labels)))
    x_nhwc = np.moveaxis(x, 1, -1)
    ours = float(losses.cross_entropy(jnp.array(x_nhwc), jnp.array(labels)))
    assert abs(ours - ref) < 1e-5


def _jaccard_numpy(true, probs, eps=1e-7):
    # independent hand-derivation of loss.py:27-37 semantics (channel-last)
    dims = (0, 1, 2)
    inter = np.sum(probs * true, axis=dims)
    card = np.sum(probs + true, axis=dims)
    union = card - inter
    return 1 - np.mean(inter / (union + eps))


def test_jaccard_loss_golden():
    probs = RNG.uniform(size=(2, 7, 7, 4)).astype(np.float32)
    probs = probs / probs.sum(-1, keepdims=True)
    labels = RNG.integers(0, 4, size=(2, 7, 7))
    true = np.eye(4, dtype=np.float32)[labels]
    ours = float(losses.jaccard_loss(jnp.array(true), jnp.array(probs)))
    expected = _jaccard_numpy(true, probs)
    assert abs(ours - expected) < 1e-5


def test_jaccard_loss_with_logits_softmax():
    logits = RNG.normal(size=(2, 7, 7, 4)).astype(np.float32)
    labels = RNG.integers(0, 4, size=(2, 7, 7))
    true = np.eye(4, dtype=np.float32)[labels]
    ours = float(losses.jaccard_loss(jnp.array(true), logits=jnp.array(logits)))
    probs = np.array(torch.softmax(torch.tensor(logits), dim=-1))
    assert abs(ours - _jaccard_numpy(true, probs)) < 1e-5


def test_entropy_map_values():
    p = np.array([[0.5, 0.25, 0.25]], dtype=np.float32)
    out = np.array(losses.weighted_self_information(jnp.array(p)))
    expected = -p * np.log(p + 1e-7)
    np.testing.assert_allclose(out, expected, rtol=1e-6)
    # normalised variant (MM-WHS): divided by log(C)
    out_n = np.array(losses.weighted_self_information(jnp.array(p), num_classes=3))
    np.testing.assert_allclose(out_n, expected / np.log(3), rtol=1e-6)


def _chamfer_numpy(x, y, eps=1e-5):
    # brute-force O(N^2) double loop, independent of the bmm decomposition
    total = 0.0
    for b in range(x.shape[0]):
        d = np.sqrt(((x[b][:, None, :] - y[b][None, :, :]) ** 2).sum(-1) + eps)
        total += d.min(axis=1).mean() / x.shape[0] + d.min(axis=0).mean() / x.shape[0]
    return total


def test_chamfer_loss_golden():
    x = RNG.uniform(size=(3, 30, 3)).astype(np.float32)
    y = RNG.uniform(size=(3, 30, 3)).astype(np.float32)
    ours = float(losses.chamfer_loss(jnp.array(x), jnp.array(y)))
    assert abs(ours - _chamfer_numpy(x, y)) < 1e-4


def test_chamfer_loss_zero_for_identical_sets():
    x = RNG.uniform(size=(2, 50, 3)).astype(np.float32)
    val = float(losses.chamfer_loss(jnp.array(x), jnp.array(x)))
    # identical sets: distance is sqrt(eps) per point, both directions
    assert abs(val - 2 * np.sqrt(1e-5)) < 1e-4


def test_dice_coef_multilabel_golden():
    labels = RNG.integers(0, 4, size=(2, 9, 9))
    pred_labels = labels.copy()
    pred_labels[0, :3] = 0  # perturb
    t = np.eye(4, dtype=np.float32)[labels]
    p = np.eye(4, dtype=np.float32)[pred_labels]
    ours = float(losses.dice_coef_multilabel(jnp.array(t), jnp.array(p)))
    # independent: per foreground class (1..3), (2*inter+1)/(sums+1)
    acc = []
    for c in range(1, 4):
        tc, pc = t[..., c].ravel(), p[..., c].ravel()
        acc.append((2 * (tc * pc).sum() + 1) / (tc.sum() + pc.sum() + 1))
    assert abs(ours - np.mean(acc)) < 1e-5
