"""Numeric step-level parity against a torch twin of the reference loop.

The loss-level golden tests (tests/test_losses.py) pin each formula; this
file pins the *composition*: a torch implementation of the reference's
5-phase alternating step (``src/train_mscmrseg.py:183-345``,
``src/train_mmwhs.py:195-377`` — double backward accumulation, detach
placement, dr/w* weighting, per-net optimizers) is run side by side with
``make_train_step`` on tiny twin networks whose weights are copied from the
flax init. Per-step losses/metrics and the post-step parameters must agree
to fp tolerance for both workloads' loss paths.

The twin networks are deliberately small but hit every structural feature
the step interacts with: conv+BatchNorm generator with a point head
producing (logits, features, vertices); strided-conv patch discriminators;
a Conv1d+BN+maxpool point discriminator returning a tuple like PointNetCls.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from pointcloududa_tpu.config import mmwhs_default, mscmrseg_default
from pointcloududa_tpu.train.state import NetState, UDATrainState, build_optimizers
from pointcloududa_tpu.train.step import make_train_step

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

N_POINTS = 16
HW = 8
BS = 4
PAD1 = ((1, 1), (1, 1))


# --------------------------------------------------------------------- #
# flax twins
class TinyGen(nn.Module):
    n_class: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.Conv(8, (3, 3), padding=PAD1)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        logits = nn.Conv(self.n_class, (3, 3), padding=PAD1)(h)
        pooled = jnp.mean(h, axis=(1, 2))
        pv = nn.Dense(N_POINTS * 3)(pooled).reshape(-1, N_POINTS, 3)
        return logits, h, pv


class TinyDisc(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(8, (3, 3), strides=2, padding=PAD1)(x))
        return nn.Conv(1, (3, 3), strides=2, padding=PAD1)(h)


class TinyPointDisc(nn.Module):
    @nn.compact
    def __call__(self, points, train: bool):
        h = nn.Dense(16)(points)  # == Conv1d(3,16,1) on (B,3,N)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        g = jnp.max(h, axis=1)
        return nn.Dense(1)(g), None, None


# --------------------------------------------------------------------- #
# torch twins (NCHW)
class TinyGenTorch(torch.nn.Module):
    def __init__(self, n_class=4):
        super().__init__()
        self.c1 = torch.nn.Conv2d(3, 8, 3, padding=1)
        self.bn = torch.nn.BatchNorm2d(8, momentum=0.1)
        self.c2 = torch.nn.Conv2d(8, n_class, 3, padding=1)
        self.fc = torch.nn.Linear(8, N_POINTS * 3)

    def forward(self, x):
        h = torch.relu(self.bn(self.c1(x)))
        logits = self.c2(h)
        pv = self.fc(h.mean(dim=(2, 3))).view(-1, N_POINTS, 3)
        return logits, h, pv


class TinyDiscTorch(torch.nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.c1 = torch.nn.Conv2d(in_ch, 8, 3, stride=2, padding=1)
        self.c2 = torch.nn.Conv2d(8, 1, 3, stride=2, padding=1)

    def forward(self, x):
        return self.c2(torch.relu(self.c1(x)))


class TinyPointDiscTorch(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = torch.nn.Conv1d(3, 16, 1)
        self.bn = torch.nn.BatchNorm1d(16, momentum=0.1)
        self.fc = torch.nn.Linear(16, 1)

    def forward(self, x):  # x: (B, 3, N) like PointNetCls
        h = torch.relu(self.bn(self.c1(x)))
        return self.fc(h.max(dim=2)[0]), None, None


# --------------------------------------------------------------------- #
def _t(kernel):  # flax conv HWIO -> torch OIHW
    return torch.tensor(np.asarray(kernel).transpose(3, 2, 0, 1))


def copy_gen(params, m: TinyGenTorch):
    with torch.no_grad():
        m.c1.weight.copy_(_t(params["Conv_0"]["kernel"]))
        m.c1.bias.copy_(torch.tensor(np.asarray(params["Conv_0"]["bias"])))
        m.bn.weight.copy_(torch.tensor(np.asarray(params["BatchNorm_0"]["scale"])))
        m.bn.bias.copy_(torch.tensor(np.asarray(params["BatchNorm_0"]["bias"])))
        m.c2.weight.copy_(_t(params["Conv_1"]["kernel"]))
        m.c2.bias.copy_(torch.tensor(np.asarray(params["Conv_1"]["bias"])))
        m.fc.weight.copy_(torch.tensor(np.asarray(params["Dense_0"]["kernel"]).T))
        m.fc.bias.copy_(torch.tensor(np.asarray(params["Dense_0"]["bias"])))


def copy_disc(params, m: TinyDiscTorch):
    with torch.no_grad():
        m.c1.weight.copy_(_t(params["Conv_0"]["kernel"]))
        m.c1.bias.copy_(torch.tensor(np.asarray(params["Conv_0"]["bias"])))
        m.c2.weight.copy_(_t(params["Conv_1"]["kernel"]))
        m.c2.bias.copy_(torch.tensor(np.asarray(params["Conv_1"]["bias"])))


def copy_pdisc(params, m: TinyPointDiscTorch):
    with torch.no_grad():
        m.c1.weight.copy_(torch.tensor(np.asarray(params["Dense_0"]["kernel"]).T[..., None]))
        m.c1.bias.copy_(torch.tensor(np.asarray(params["Dense_0"]["bias"])))
        m.bn.weight.copy_(torch.tensor(np.asarray(params["BatchNorm_0"]["scale"])))
        m.bn.bias.copy_(torch.tensor(np.asarray(params["BatchNorm_0"]["bias"])))
        m.fc.weight.copy_(torch.tensor(np.asarray(params["Dense_1"]["kernel"]).T))
        m.fc.bias.copy_(torch.tensor(np.asarray(params["Dense_1"]["bias"])))


def gen_params_to_numpy(params):
    return {
        "c1.weight": np.asarray(params["Conv_0"]["kernel"]).transpose(3, 2, 0, 1),
        "c1.bias": np.asarray(params["Conv_0"]["bias"]),
        "bn.weight": np.asarray(params["BatchNorm_0"]["scale"]),
        "bn.bias": np.asarray(params["BatchNorm_0"]["bias"]),
        "c2.weight": np.asarray(params["Conv_1"]["kernel"]).transpose(3, 2, 0, 1),
        "c2.bias": np.asarray(params["Conv_1"]["bias"]),
        "fc.weight": np.asarray(params["Dense_0"]["kernel"]).T,
        "fc.bias": np.asarray(params["Dense_0"]["bias"]),
    }


# --------------------------------------------------------------------- #
# torch implementations of the reference loss formulas (independent twins
# of src/utils/loss.py — batch_NN_loss itself is CUDA-only)
def torch_jaccard(true, probs, eps=1e-7):
    dims = (0,) + tuple(range(2, true.dim()))  # sum over B + spatial, per class
    inter = torch.sum(probs * true, dims)
    card = torch.sum(probs + true, dims)
    union = card - inter
    return 1.0 - torch.mean(inter / (union + eps))


def torch_chamfer(x, y, eps=1e-5):
    d2 = torch.sum((x[:, :, None, :] - y[:, None, :, :]) ** 2, dim=-1)
    d = torch.sqrt(d2 + eps)
    return d.min(dim=2)[0].mean(dim=1).mean() + d.min(dim=1)[0].mean(dim=1).mean()


def _bce_logits_fill(out, label):
    return F.binary_cross_entropy_with_logits(out, torch.full_like(out, float(label)))


def torch_reference_step(cfg, nets, opts, batch):
    """One step of the reference 5-phase loop (union of the two trainers,
    gated exactly like the sources; see module docstring for line cites)."""
    import math

    gen, d1, d2, d4 = nets
    optim_gen, optim_d1, optim_d2, optim_d4 = opts
    smooth = 1e-7
    gen.train()
    for m in (d1, d2, d4):
        if m is not None:
            m.train()

    imgA = torch.tensor(batch["img_s"].transpose(0, 3, 1, 2))
    maskA = torch.tensor(batch["mask_s"].transpose(0, 3, 1, 2))
    imgB = torch.tensor(batch["img_t"].transpose(0, 3, 1, 2))
    vertexA = torch.tensor(batch["vert_s"])
    vertexB = torch.tensor(batch["vert_t"])

    for opt in (optim_d1, optim_d2, optim_d4):
        if opt is not None:
            opt.zero_grad()
    optim_gen.zero_grad()
    for m, on in ((d1, cfg.d1), (d2, cfg.d2), (d4, cfg.d4)):
        if on:
            for p in m.parameters():
                p.requires_grad = False

    metrics = {}
    # 1. supervised source
    oS, _, vertS = gen(imgA)
    if cfg.softmax:
        predS = F.softmax(oS, dim=1)
        loss_seg = F.cross_entropy(predS, torch.argmax(maskA, dim=1))
    else:
        predS = torch.sigmoid(oS)
        loss_seg = torch.nn.BCELoss()(predS, maskA)
    loss_seg2 = torch_jaccard(true=maskA, probs=predS)
    loss_seg3 = 0
    if cfg.point_head:
        loss_seg3 = torch_chamfer(vertS, vertexA)
        metrics["ver_s_loss"] = loss_seg3.item()
    norm = math.log(predS.size(1)) if cfg.entropy_norm else 1.0
    uncertainty_mapS = -1.0 * predS * torch.log(predS + smooth) / norm
    ent_s = torch.mean(torch.sum(uncertainty_mapS, dim=1))
    loss_entropy = ent_s if (cfg.etpls and cfg.d2) else 0
    loss_seg1 = loss_seg + loss_seg2 + cfg.wp * loss_seg3 + loss_entropy
    metrics["seg_loss"] = (loss_seg + loss_seg2).item()
    metrics["entropy_loss"] = ent_s.item()
    loss_seg1.backward()

    # 2. adversarial target
    oT, _, vertT = gen(imgB)
    predT = F.softmax(oT, dim=1) if cfg.softmax else torch.sigmoid(oT)
    uncertainty_mapT = -1.0 * predT * torch.log(predT + smooth) / norm
    ent_t = torch.mean(torch.sum(uncertainty_mapT, dim=1))
    metrics["entropy_loss_T"] = ent_t.item()
    loss_adv_diff = ent_t if cfg.Tetpls else 0
    if cfg.d2:
        D_out2 = d2(uncertainty_mapT)
        loss_adv_diff = loss_adv_diff + cfg.w2 * (cfg.dr * _bce_logits_fill(D_out2, 1))
    if cfg.point_head:
        metrics["ver_t_loss"] = torch_chamfer(vertT, vertexB).item()
    if cfg.d4:
        D_out4 = d4(vertT.transpose(2, 1))[0]
        loss_adv_diff = loss_adv_diff + cfg.w4 * (cfg.dr * _bce_logits_fill(D_out4, 1))
    if cfg.d1:
        D_out1 = d1(predT if cfg.d1_on_probs else oT)
        loss_adv_diff = loss_adv_diff + cfg.w1 * (cfg.dr * _bce_logits_fill(D_out1, 1))
    if isinstance(loss_adv_diff, torch.Tensor):
        metrics["adv_loss"] = loss_adv_diff.item()
        loss_adv_diff.backward()
    else:
        metrics["adv_loss"] = 0.0
    optim_gen.step()

    # 3+4. discriminators on detached outputs
    for m, on in ((d1, cfg.d1), (d2, cfg.d2), (d4, cfg.d4)):
        if on:
            for p in m.parameters():
                p.requires_grad = True
    for p in gen.parameters():
        p.requires_grad = False

    oS, oT = oS.detach(), oT.detach()
    predS, predT = predS.detach(), predT.detach()
    if cfg.d2:
        uncertainty_mapS_d = (-1.0 * predS * torch.log(predS + smooth) / norm)
        out = d2(uncertainty_mapS_d)
        same = _bce_logits_fill(out, 1)
        same.backward()
        metrics["dis2_acc1"] = float(np.mean(torch.sigmoid(out.detach()).numpy() >= 0.5))
        out = d2(uncertainty_mapT.detach())
        diff = _bce_logits_fill(out, 0)
        diff.backward()
        metrics["dis2_acc2"] = 1.0 - float(np.mean(torch.sigmoid(out.detach()).numpy() >= 0.5))
        metrics["d2_loss"] = (same + diff).item()
    if cfg.d1:
        inS = predS if cfg.d1_on_probs else oS
        inT = predT if cfg.d1_on_probs else oT
        out = d1(inS)
        same = _bce_logits_fill(out, 1)
        same.backward()
        metrics["dis1_acc1"] = float(np.mean(torch.sigmoid(out.detach()).numpy() >= 0.5))
        out = d1(inT)
        diff = _bce_logits_fill(out, 0)
        diff.backward()
        metrics["dis1_acc2"] = 1.0 - float(np.mean(torch.sigmoid(out.detach()).numpy() >= 0.5))
        metrics["d1_loss"] = (same + diff).item()
    if cfg.d4:
        out = d4(vertS.detach().transpose(2, 1))[0]
        same = _bce_logits_fill(out, 1)
        same.backward()
        metrics["dis4_acc1"] = float(np.mean(torch.sigmoid(out.detach()).numpy() >= 0.5))
        out = d4(vertT.detach().transpose(2, 1))[0]
        diff = _bce_logits_fill(out, 0)
        diff.backward()
        metrics["dis4_acc2"] = 1.0 - float(np.mean(torch.sigmoid(out.detach()).numpy() >= 0.5))
        metrics["d4_loss"] = (same + diff).item()

    # 5. update discriminators
    for opt in (optim_d1, optim_d2, optim_d4):
        if opt is not None:
            opt.step()
    for p in gen.parameters():
        p.requires_grad = True
    return metrics


# --------------------------------------------------------------------- #
def _batches(seed, n_class, steps):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(steps):
        mask = jax.nn.one_hot(rng.integers(0, n_class, size=(BS, HW, HW)), n_class)
        out.append(
            {
                "img_s": rng.normal(size=(BS, HW, HW, 3)).astype(np.float32),
                "mask_s": np.asarray(mask, np.float32),
                "img_t": rng.normal(size=(BS, HW, HW, 3)).astype(np.float32),
                "vert_s": rng.normal(size=(BS, N_POINTS, 3)).astype(np.float32),
                "vert_t": rng.normal(size=(BS, N_POINTS, 3)).astype(np.float32),
            }
        )
    return out


def _setup(cfg):
    """Init flax twins, build the jitted step, and torch twins with copied
    weights + reference optimizers."""
    gen = TinyGen(n_class=cfg.n_class)
    d1 = TinyDisc() if cfg.d1 else None
    d2 = TinyDisc() if cfg.d2 else None
    d4 = TinyPointDisc() if cfg.d4 else None
    txs = build_optimizers(cfg)
    gen_tx, d1_tx, d2_tx, d4_tx = txs

    k = jax.random.split(jax.random.PRNGKey(7), 5)
    img = jnp.zeros((BS, HW, HW, 3), jnp.float32)
    gv = gen.init(k[0], img, train=False)
    gen_state = NetState(gv["params"], gv["batch_stats"], gen_tx.init(gv["params"]))
    mk = lambda m, tx, key, *a, **kw: (  # noqa: E731
        None
        if m is None
        else (lambda v: NetState(v["params"], v.get("batch_stats", {}), tx.init(v["params"])))(
            m.init(key, *a, **kw)
        )
    )
    d1_state = mk(d1, d1_tx, k[1], jnp.zeros((BS, HW, HW, cfg.n_class)))
    d2_state = mk(d2, d2_tx, k[2], jnp.zeros((BS, HW, HW, cfg.n_class)))
    d4_state = mk(d4, d4_tx, k[3], jnp.zeros((BS, N_POINTS, 3)), train=False)
    state = UDATrainState(
        gen=gen_state, d1=d1_state, d2=d2_state, d4=d4_state,
        step=jnp.zeros((), jnp.int32), rng=k[4],
    )
    step = make_train_step(cfg, (gen, d1, d2, d4), txs)

    tg = TinyGenTorch(cfg.n_class)
    copy_gen(gen_state.params, tg)
    td1 = td2 = td4 = None
    if cfg.d1:
        td1 = TinyDiscTorch(cfg.n_class)
        copy_disc(d1_state.params, td1)
    if cfg.d2:
        td2 = TinyDiscTorch(cfg.n_class)
        copy_disc(d2_state.params, td2)
    if cfg.d4:
        td4 = TinyPointDiscTorch()
        copy_pdisc(d4_state.params, td4)
    og = (
        torch.optim.SGD(tg.parameters(), lr=cfg.lr, momentum=0.95, weight_decay=5e-4)
        if cfg.sgd
        else torch.optim.Adam(tg.parameters(), lr=cfg.lr, betas=(0.9, 0.99))
    )
    mk_sgd = lambda m, lr, mmt: (  # noqa: E731
        None if m is None else torch.optim.SGD(m.parameters(), lr=lr, momentum=mmt, weight_decay=5e-4)
    )
    o1 = mk_sgd(td1, cfg.d1lr, cfg.disc_momentum("d1"))
    o2 = mk_sgd(td2, cfg.d2lr, cfg.disc_momentum("d2"))
    o4 = mk_sgd(td4, cfg.d4lr, cfg.disc_momentum("d4"))
    return state, step, (tg, td1, td2, td4), (og, o1, o2, o4)


def _run_and_compare(cfg, steps=3, rtol=2e-3, atol=2e-4):
    state, step, tnets, topts = _setup(cfg)
    for i, batch in enumerate(_batches(11, cfg.n_class, steps)):
        state, m_jax = step(state, jax.device_put(batch))
        m_torch = torch_reference_step(cfg, tnets, topts, batch)
        for key, want in m_torch.items():
            got = float(m_jax[key])
            np.testing.assert_allclose(
                got, want, rtol=rtol, atol=atol,
                err_msg=f"step {i} metric {key}: jax={got} torch={want}",
            )
    # post-run parameter parity (proves the grads + optimizer composition).
    # c1.bias is excluded: a conv bias feeding straight into BatchNorm is
    # mathematically inert (the mean subtraction cancels it), so its true
    # gradient is 0 and Adam's sign normalisation turns fp noise into full
    # lr-sized steps — in BOTH frameworks, in uncorrelated directions.
    ours = gen_params_to_numpy(jax.device_get(state.gen.params))
    theirs = {k: v.detach().numpy() for k, v in tnets[0].named_parameters()}
    for name in theirs:
        if name == "c1.bias":
            continue
        np.testing.assert_allclose(
            ours[name], theirs[name], rtol=5e-3, atol=5e-4,
            err_msg=f"generator param {name} diverged",
        )


def test_step_parity_mscmrseg_triple_adversary():
    """Sigmoid/BCE path with d1+d2+d4, dr=0.01, disc momentum .99."""
    cfg = mscmrseg_default(d1=True, d2=True, d4=True, crop_size=HW, fc_inch=1, bs=BS)
    _run_and_compare(cfg)


def test_step_parity_mmwhs_softmax_full():
    """Double-softmax CE, /log(C) entropy, etpls+Tetpls, w1/w2/w4, probs->D1."""
    cfg = mmwhs_default(
        d1=True, d2=True, d4=True, softmax=True, etpls=True, Tetpls=True,
        w1=0.5, w2=2.0, w4=1.5, wp=0.7, crop_size=HW, fc_inch=1, bs=BS,
        n_class=5,
    )
    _run_and_compare(cfg)


def test_step_parity_mmwhs_sgd_d4aux():
    """-sgd generator (hardcoded momentum .95) + d4aux (chamfer without the
    point adversary)."""
    cfg = mmwhs_default(
        d2=True, d4aux=True, softmax=True, sgd=True, mmt=0.5,  # mmt must be ignored
        crop_size=HW, fc_inch=1, bs=BS, n_class=5,
    )
    _run_and_compare(cfg)
