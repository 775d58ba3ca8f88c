"""Round-trip the reference's torch checkpoint format through
tools/import_torch_ckpt.py and the EVALUATOR loading path.

Each test builds one of the reference's own torch networks (imported
read-only from /root/reference/src), randomises its weights/BN state, saves
a ``.pt`` exactly as ``ModelCheckPointCallback`` would
(``src/utils/callbacks.py:75-80``), converts it with
``utils.torch_import.import_torch_checkpoint``, restores through
``train.checkpoint.restore_net_state`` (the code path the evaluator CLIs
use), and asserts forward-output parity against the torch network — i.e.
the author's released checkpoints are evaluable here without retraining.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_SRC, "networks")),
    reason="reference tree not mounted at /root/reference",
)


def _randomize(torch, module):
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_(0.0, 0.3)
            m.running_mean.normal_(0.0, 0.3)
            m.running_var.uniform_(0.5, 1.5)


def _save_reference_style(torch, module, path, epoch=42, with_optimizer=True):
    """The exact payload ModelCheckPointCallback.step writes
    (src/utils/callbacks.py:75-80)."""
    opt = torch.optim.Adam(module.parameters(), lr=1e-3)
    torch.save(
        {
            "epoch": epoch,
            "model_state_dict": module.state_dict(),
            "optimizer_state_dict": opt.state_dict() if with_optimizer else None,
        },
        path,
    )


def test_generator_pt_roundtrip_via_evaluator_path(tmp_path):
    import torch

    sys.path.insert(0, REF_SRC)
    from networks.unet import Segmentation_model_Point as TorchGen

    from pointcloududa_tpu.config import mscmrseg_default
    from pointcloududa_tpu.train.checkpoint import restore_net_state, restore_pytree
    from pointcloududa_tpu.train.state import build_models, create_train_state
    from pointcloududa_tpu.utils.torch_import import import_torch_checkpoint

    torch.manual_seed(20)
    tgen = TorchGen(filters=32, n_block=4, n_class=4, pointnet=True, fc_inch=1)
    _randomize(torch, tgen)
    tgen.eval()
    pt = tmp_path / "best_model.lr0.001.d2lr2.5e-05.d4lr2.5e-05.aug2.Scr0.816.pt"
    _save_reference_style(torch, tgen, str(pt), epoch=42)

    out = str(tmp_path / "orbax_gen")
    summary = import_torch_checkpoint(str(pt), out)
    assert summary["kind"] == "generator"
    assert summary["epoch"] == 42
    assert summary["workload"] == "mscmrseg"
    assert summary["flags"]["d2"] and summary["flags"]["d4"] and not summary["flags"]["d1"]
    assert summary["flags"]["score"] == pytest.approx(0.816)
    arch = summary["arch"]
    assert (arch.filters, arch.n_class, arch.fc_inch, arch.pointnet) == (32, 4, 1, True)

    # the evaluator CLI's exact loading path (cli/evaluate_mscmrseg.py:52-54)
    cfg = mscmrseg_default(d4=True, crop_size=96, fc_inch=1)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    gen, *_ = build_models(cfg)
    net = restore_net_state(out, state.gen)

    x = np.random.RandomState(21).rand(2, 96, 96, 3).astype(np.float32)
    with torch.no_grad():
        t_logits, _, t_points = tgen(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    logits, _, points = gen.apply(
        {"params": net.params, "batch_stats": net.batch_stats}, jnp.asarray(x), train=False
    )
    ref = np.transpose(t_logits.numpy(), (0, 2, 3, 1))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(logits, np.float32) / scale, ref / scale, atol=2e-5)
    np.testing.assert_allclose(np.asarray(points, np.float32), t_points.numpy(), atol=1e-4)

    # the torch epoch must survive in the written payload
    payload = restore_pytree(out, {"epoch": np.int64(0), "state": {"net": state.gen, "config": None}})
    assert int(payload["epoch"]) == 42


def test_discriminator_raw_state_dict_roundtrip(tmp_path):
    """Bare state_dict (no callback wrapper) — the reference loaders'
    dict-or-raw leniency (src/evaluate_mscmrseg.py:109-115)."""
    import torch

    sys.path.insert(0, REF_SRC)
    from networks.GAN import UncertaintyDiscriminator as TorchDisc

    from pointcloududa_tpu.train.checkpoint import restore_net_state
    from pointcloududa_tpu.train.state import NetState, sgd_reference
    from pointcloududa_tpu.utils.torch_import import import_torch_checkpoint

    torch.manual_seed(22)
    tdisc = TorchDisc(in_channel=4)
    tdisc.eval()
    pt = tmp_path / "best_d2.pt"
    torch.save(tdisc.state_dict(), str(pt))

    out = str(tmp_path / "orbax_d2")
    summary = import_torch_checkpoint(str(pt), out)
    assert summary["kind"] == "discriminator"
    assert summary["epoch"] == 0
    assert summary["arch"] == {"in_channel": 4, "ext": False}

    from pointcloududa_tpu.models.discriminator import UncertaintyDiscriminator

    model = UncertaintyDiscriminator(in_channel=4, compute_dtype=jnp.float32)
    x = np.random.RandomState(23).rand(2, 96, 96, 4).astype(np.float32)
    template_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tx = sgd_reference(2.5e-5, momentum=0.99)
    template = NetState(
        params=template_vars["params"], batch_stats={}, opt_state=tx.init(template_vars["params"])
    )
    net = restore_net_state(out, template)

    with torch.no_grad():
        ref = tdisc(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = model.apply({"params": net.params}, jnp.asarray(x))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, atol=2e-4)


def test_pointnet_ext_ft_pt_roundtrip(tmp_path):
    """D4 with BOTH variant flags: the -extd4 conv ladder
    (PointNetCls.py:109-121) and the -ft STNkd feature transform (:66-102)
    — the config of the reference's best MM-WHS checkpoint (D2+D4,
    evaluate_mmwhs.py:224)."""
    import torch

    sys.path.insert(0, REF_SRC)
    from networks.PointNetCls import PointNetCls as TorchPN

    from pointcloududa_tpu.train.checkpoint import restore_net_state
    from pointcloududa_tpu.train.state import NetState, sgd_reference
    from pointcloududa_tpu.utils.torch_import import import_torch_checkpoint

    torch.manual_seed(24)
    tm = TorchPN(feature_transform=True, ext=True)
    _randomize(torch, tm)
    for m in tm.modules():
        if isinstance(m, (torch.nn.Conv1d, torch.nn.Linear)):
            m.weight.data.normal_(0.0, 0.1)
            if m.bias is not None:
                m.bias.data.normal_(0.0, 0.1)
    tm.eval()
    pt = tmp_path / "best_d4.extd4.ft.pt"
    _save_reference_style(torch, tm, str(pt), epoch=7)

    out = str(tmp_path / "orbax_d4")
    summary = import_torch_checkpoint(str(pt), out)
    assert summary["kind"] == "pointnet"
    assert summary["arch"] == {"feature_transform": True, "ext": True}
    assert summary["flags"]["extd4"] and summary["flags"]["ft"]

    from pointcloududa_tpu.models.pointnet import PointNetCls

    model = PointNetCls(feature_transform=True, ext=True, compute_dtype=jnp.float32)
    pts = np.random.RandomState(25).rand(2, 300, 3).astype(np.float32)
    template_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(pts), train=False)
    tx = sgd_reference(2.5e-5, momentum=0.99)
    template = NetState(
        params=template_vars["params"],
        batch_stats=template_vars["batch_stats"],
        opt_state=tx.init(template_vars["params"]),
    )
    net = restore_net_state(out, template)

    with torch.no_grad():
        ref_logit, ref_trans, _ = tm(torch.from_numpy(np.transpose(pts, (0, 2, 1))))
    logit, trans, _ = model.apply(
        {"params": net.params, "batch_stats": net.batch_stats}, jnp.asarray(pts), train=False
    )
    np.testing.assert_allclose(np.asarray(trans), ref_trans.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logit), ref_logit.numpy(), atol=1e-3)


def test_mmwhs_generator_arch_inference():
    """Shape-based inference on the MM-WHS generator shape (n_class=5,
    fc_inch=121, train_mmwhs.py:435-441) without building the flax side."""
    import torch

    sys.path.insert(0, REF_SRC)
    from networks.unet import Segmentation_model_Point as TorchGen

    from pointcloududa_tpu.utils.torch_import import (
        detect_network_kind,
        infer_generator_arch,
        unwrap_payload,
    )

    torch.manual_seed(26)
    tgen = TorchGen(filters=32, in_channels=3, n_class=5, pointnet=True, fc_inch=121, extpn=True)
    sd, epoch = unwrap_payload(tgen.state_dict())
    assert epoch == 0
    assert detect_network_kind(sd) == "generator"
    arch = infer_generator_arch(sd)
    assert arch.filters == 32
    assert arch.in_channels == 3
    assert arch.n_block == 4
    assert arch.bottleneck_depth == 4
    assert arch.n_class == 5
    assert arch.pointnet and arch.extpn
    assert arch.fc_inch == 121
    assert arch.input_size == 256  # (sqrt(121)+5) * 16
    assert not arch.drop


def test_flags_from_name_on_released_checkpoints():
    """The 8 MS-CMRSeg + 2 MM-WHS released filenames
    (evaluate_mscmrseg.py:249-256, evaluate_mmwhs.py:219-226)."""
    from pointcloududa_tpu.utils.torch_import import flags_from_name

    f = flags_from_name(
        "best_unet_model_checkpoint_train_point_imgaug_unet.resnet.lr0.001.offaug.Scr0.564.pt"
    )
    assert not (f["d1"] or f["d2"] or f["d4"]) and f["offaug"]
    assert f["lr"] == pytest.approx(1e-3)
    assert f["score"] == pytest.approx(0.564)

    f = flags_from_name(
        "best_unet_model_checkpoint_train_point_imgaug_concat.resnet.lr0.001."
        "d1lr2.5e-05.d2lr2.5e-05.softmax.Scr0.849.pt"
    )
    assert f["d1"] and f["d2"] and not f["d4"] and f["softmax"]
    assert f["d1lr"] == pytest.approx(2.5e-5)
    assert f["d2lr"] == pytest.approx(2.5e-5)
    assert f["score"] == pytest.approx(0.849)

    f = flags_from_name(
        "best_unet_model_checkpoint_train_point_imgaug.resnet.lr0.001."
        "d1lr2.5e-05.d2lr2.5e-05.d4lr2.5e-05.aug2.softmax.Scr0.822.pt"
    )
    assert f["d1"] and f["d2"] and f["d4"] and f["pointnet"] and f["aug2"]
    assert f["d4lr"] == pytest.approx(2.5e-5)

    f = flags_from_name(
        "best_unet_model_checkpoint_train_point_tf.resnet.lr0.0002.d2lr1e-05."
        "d4lr1e-05.offmh.softmax.offdecay.extd4.ft.dr0.1.Scr0.595.pt"
    )
    assert f["d2"] and f["d4"] and f["extd4"] and f["ft"] and f["offmh"] and f["offdecay"]
    assert f["d2lr"] == pytest.approx(1e-5)
    assert f["lr"] == pytest.approx(2e-4)
    assert f["score"] == pytest.approx(0.595)
    assert not f["sgd"] and not f["etpls"] and not f["Tetpls"]

    f = flags_from_name(
        "best_unet_model_checkpoint_train_point_tf.resnet.lr0.0002.d4lr0.0001."
        "offmh.softmax.offdecay.ft.dr0.1.Scr0.417.pt"
    )
    assert f["d4"] and not f["d2"] and f["ft"] and not f["extd4"]
    assert f["d4lr"] == pytest.approx(1e-4)


def test_import_cli_tool(tmp_path):
    """tools/import_torch_ckpt.py end-to-end over a directory of .pt files."""
    import torch

    sys.path.insert(0, REF_SRC)
    from networks.GAN import UncertaintyDiscriminator as TorchDisc

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import import_torch_ckpt

    torch.manual_seed(27)
    src_dir = tmp_path / "pts"
    src_dir.mkdir()
    _save_reference_style(torch, TorchDisc(in_channel=4), str(src_dir / "best_d1lr1e-04.pt"))
    _save_reference_style(torch, TorchDisc(in_channel=4, ext=True), str(src_dir / "best_d2lr1e-04.extd2.pt"))

    out_dir = tmp_path / "orbax"
    import_torch_ckpt.main([str(src_dir), "-out", str(out_dir)])
    assert (out_dir / "best_d1lr1e-04").is_dir()
    assert (out_dir / "best_d2lr1e-04.extd2").is_dir()
