"""Import the reference's released torch checkpoints into Orbax NetStates.

The reference ships its quality table as torch ``.pt`` files written by
``ModelCheckPointCallback`` (``src/utils/callbacks.py:75-80``):
``{'epoch', 'model_state_dict', 'optimizer_state_dict'}`` — and its
evaluators also tolerate a bare ``state_dict`` (``src/evaluate_mscmrseg.py:
109-115``). Experiment flags are serialised into the FILENAME by
``get_appendix`` (``src/train_mmwhs.py:740-805``) and parsed back out by the
evaluators (``src/evaluate_mmwhs.py:231-253``, ``src/evaluate_mscmrseg.py:
244-259``).

This module converts those files into the Orbax checkpoint layout this
framework's evaluators and warm-restart path consume
(``{"epoch", "state": {"net": NetState, "config": None}}``, the exact tree
``train/loop.py`` writes), so the author's released weights can be evaluated
here without retraining:

- network kind (generator / D1-D2 discriminator / D4 PointNetCls) and every
  architecture hyper-parameter are inferred from the ``state_dict`` itself
  (tensor shapes and key sets) — stronger than filename grepping;
- the filename tags are still parsed (:func:`flags_from_name`) for
  cross-checking and for reconstructing the *training* flags (lr, d1/d2/d4,
  softmax, aug2, ...) that do not affect the parameter tree;
- the optimizer state is re-initialised (fresh Adam/SGD moments): torch and
  optax moment layouts are not interchangeable, and the evaluators never
  read it — only the structure must match ``create_train_state``'s.

Weight layout conversions (torch -> flax):
``Conv2d`` OIHW -> HWIO; ``Conv1d`` (O, I, 1) -> (1, I, O);
``Linear`` (O, I) -> (I, O); BatchNorm weight/bias/running_mean/running_var
-> scale/bias/mean/var (``num_batches_tracked`` is dropped — flax keeps no
step counter and the reference never reads it either).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _np(v) -> np.ndarray:
    """Accept torch tensors or numpy arrays."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv2d(w):  # OIHW -> HWIO
    return np.transpose(_np(w), (2, 3, 1, 0))


def _conv1d(w):  # (O, I, 1) -> (1, I, O)
    return np.transpose(_np(w), (2, 1, 0))


def _dense(w):  # (O, I) -> (I, O)
    return _np(w).T


def _vec(w):
    return _np(w)


# ---------------------------------------------------------------------------
# payload / kind / architecture inference
# ---------------------------------------------------------------------------


def unwrap_payload(payload) -> Tuple[Dict[str, Any], int]:
    """Accept both the callback dict and a bare state_dict.

    Mirrors the reference loader's dict-or-raw leniency
    (``src/evaluate_mscmrseg.py:109-115``). Returns (state_dict, epoch).
    """
    if isinstance(payload, dict) and "model_state_dict" in payload:
        return dict(payload["model_state_dict"]), int(payload.get("epoch", 0) or 0)
    return dict(payload), 0


def detect_network_kind(sd: Dict[str, Any]) -> str:
    """'generator' | 'discriminator' | 'pointnet' from the key set."""
    if any(k.startswith("encoder.") for k in sd):
        return "generator"
    if any(k.startswith("feat.") for k in sd):
        return "pointnet"
    if "conv1.weight" in sd and _np(sd["conv1.weight"]).ndim == 4:
        return "discriminator"
    raise ValueError(
        f"unrecognised state_dict (first keys: {sorted(sd)[:5]}) — expected the "
        "reference's Segmentation_model_Point, UncertaintyDiscriminator, or "
        "PointNetCls"
    )


def _seq_layers(sd: Dict[str, Any], prefix: str) -> Tuple[list, list]:
    """Discover (conv_indices, bn_indices) of a torch ``nn.Sequential``.

    Index discovery instead of hardcoding makes the mapping robust to the
    reference's optional Dropout insertion (``unet.py:100-136`` ``drop``)
    shifting Sequential child indices.
    """
    idxs = set()
    for k in sd:
        if k.startswith(prefix + "."):
            head = k[len(prefix) + 1 :].split(".")[0]
            if head.isdigit():
                idxs.add(int(head))
    convs = [i for i in sorted(idxs) if f"{prefix}.{i}.weight" in sd and _np(sd[f"{prefix}.{i}.weight"]).ndim == 4]
    bns = [i for i in sorted(idxs) if f"{prefix}.{i}.running_mean" in sd]
    return convs, bns


@dataclass
class GeneratorArch:
    """Everything the flax ``SegmentationPointModel`` needs, shape-inferred."""

    filters: int
    in_channels: int
    n_block: int
    bottleneck_depth: int
    n_class: int
    pointnet: bool
    fc_inch: int
    extpn: bool
    drop: bool

    @property
    def input_size(self) -> int:
        """H=W whose forward realises ``fc_inch`` (inverse of the reference's
        ``(H / 2**n_block - 5)**2`` VALID-conv flatten, ``unet.py:76-96``)."""
        if not self.pointnet:
            return 6 * 2**self.n_block
        side = math.isqrt(self.fc_inch)
        if side * side != self.fc_inch:
            raise ValueError(f"fc_inch={self.fc_inch} is not a square — cannot invert input size")
        return (side + 5) * 2**self.n_block


def infer_generator_arch(sd: Dict[str, Any]) -> GeneratorArch:
    w1 = _np(sd["encoder.encoder1.0.weight"])  # (filters, in_ch, 3, 3)
    filters, in_channels = int(w1.shape[0]), int(w1.shape[1])
    n_block = max(
        int(m.group(1)) for k in sd for m in [re.match(r"encoder\.encoder(\d+)\.", k)] if m
    )
    bottleneck_depth = max(
        int(m.group(1)) for k in sd for m in [re.match(r"bottleneck\.bottleneck(\d+)\.", k)] if m
    )
    n_class = int(_np(sd["classifier.weight"]).shape[0])
    pointnet = any(k.startswith("pointNet.") for k in sd)
    fc_inch = int(_np(sd["pointNet.final_fc.weight"]).shape[1]) if pointnet else 1
    extpn = "pointNet.conv1.weight" in sd
    if not any(k.startswith("encoder.encoder1.") and k.endswith("running_mean") for k in sd):
        raise NotImplementedError("generator without BatchNorm is not supported")
    _, d2_bns = _seq_layers(sd, "decoder.decoder2_1")
    drop = bool(d2_bns) and d2_bns[0] != 2  # Dropout shifts the first BN off index 2
    return GeneratorArch(
        filters=filters,
        in_channels=in_channels,
        n_block=n_block,
        bottleneck_depth=bottleneck_depth,
        n_class=n_class,
        pointnet=pointnet,
        fc_inch=fc_inch,
        extpn=extpn,
        drop=drop,
    )


def infer_discriminator_arch(sd: Dict[str, Any]) -> Tuple[int, bool]:
    """(in_channel, ext) for ``UncertaintyDiscriminator`` (``GAN.py:89-144``)."""
    in_channel = int(_np(sd["conv1.weight"]).shape[1])
    return in_channel, "conv4_2.weight" in sd


def infer_pointnet_arch(sd: Dict[str, Any]) -> Tuple[bool, bool]:
    """(feature_transform, ext) for ``PointNetCls`` (``PointNetCls.py:104-134``)."""
    ft = any(k.startswith("feat.fstn.") for k in sd)
    ext = "feat.conv1_1.weight" in sd
    return ft, ext


# ---------------------------------------------------------------------------
# state_dict -> flax variables
# ---------------------------------------------------------------------------


def _check_against_template(params, stats, template):
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat_t = flatten_dict(template["params"])
    if set(flat_t) != set(params):
        raise ValueError(f"unmapped params: {set(flat_t) ^ set(params)}")
    for k in flat_t:
        if tuple(flat_t[k].shape) != tuple(params[k].shape):
            raise ValueError(f"shape mismatch at {k}: {flat_t[k].shape} vs {params[k].shape}")
    out = {"params": unflatten_dict(params)}
    if stats or template.get("batch_stats"):
        flat_s = flatten_dict(template.get("batch_stats", {}))
        if set(flat_s) != set(stats):
            raise ValueError(f"unmapped batch_stats: {set(flat_s) ^ set(stats)}")
        out["batch_stats"] = unflatten_dict(stats)
    return out


def generator_variables(sd: Dict[str, Any], template, arch: Optional[GeneratorArch] = None):
    """Map ``Segmentation_model_Point.state_dict()`` (``unet.py:165-233``)
    onto the flax ``SegmentationPointModel`` tree."""
    arch = arch or infer_generator_arch(sd)
    params, stats = {}, {}

    def put_convbn(dst, src_prefix, ci, bi):
        params[dst + ("Conv_0", "kernel")] = _conv2d(sd[f"{src_prefix}.{ci}.weight"])
        params[dst + ("Conv_0", "bias")] = _vec(sd[f"{src_prefix}.{ci}.bias"])
        params[dst + ("BatchNorm_0", "scale")] = _vec(sd[f"{src_prefix}.{bi}.weight"])
        params[dst + ("BatchNorm_0", "bias")] = _vec(sd[f"{src_prefix}.{bi}.bias"])
        stats[dst + ("BatchNorm_0", "mean")] = _vec(sd[f"{src_prefix}.{bi}.running_mean"])
        stats[dst + ("BatchNorm_0", "var")] = _vec(sd[f"{src_prefix}.{bi}.running_var"])

    def put_seq(dst_base, src_prefix):
        # flax names the pair as single segments: "<base>_conv1", "<base>_conv2"
        convs, bns = _seq_layers(sd, src_prefix)
        assert len(convs) == 2 and len(bns) == 2, (src_prefix, convs, bns)
        put_convbn(dst_base[:-1] + (dst_base[-1] + "_conv1",), src_prefix, convs[0], bns[0])
        put_convbn(dst_base[:-1] + (dst_base[-1] + "_conv2",), src_prefix, convs[1], bns[1])

    for k in range(1, arch.n_block + 1):
        put_seq(("encoder", f"encoder{k}"), f"encoder.encoder{k}")
        if k == 1:
            # dead conv1_1 (constructed but skipped by the forward,
            # unet.py:32-33 vs :44-48) — allocated for the param-count parity
            params[("encoder", "conv1_1_dead_kernel")] = _conv2d(sd["encoder.conv1_1.0.weight"])
            params[("encoder", "conv1_1_dead_bias")] = _vec(sd["encoder.conv1_1.0.bias"])
        else:
            params[("encoder", f"conv1_{k}", "kernel")] = _conv2d(sd[f"encoder.conv1_{k}.0.weight"])
            params[("encoder", f"conv1_{k}", "bias")] = _vec(sd[f"encoder.conv1_{k}.0.bias"])
    for i in range(1, arch.bottleneck_depth + 1):
        params[("bottleneck", f"bottleneck{i}", "kernel")] = _conv2d(sd[f"bottleneck.bottleneck{i}.0.weight"])
        params[("bottleneck", f"bottleneck{i}", "bias")] = _vec(sd[f"bottleneck.bottleneck{i}.0.bias"])
    if arch.pointnet:
        if arch.extpn:
            for name in ("conv1", "conv2"):
                params[("pointNet", name, "kernel")] = _conv2d(sd[f"pointNet.{name}.weight"])
                params[("pointNet", name, "bias")] = _vec(sd[f"pointNet.{name}.bias"])
        params[("pointNet", "final_conv", "kernel")] = _conv2d(sd["pointNet.final_conv.weight"])
        params[("pointNet", "final_conv", "bias")] = _vec(sd["pointNet.final_conv.bias"])
        params[("pointNet", "final_fc", "kernel")] = _dense(sd["pointNet.final_fc.weight"])
        params[("pointNet", "final_fc", "bias")] = _vec(sd["pointNet.final_fc.bias"])
    for k in range(1, arch.n_block + 1):
        # decoder1 Sequential: [0]=UpsamplingNearest2d [1]=Conv
        convs, _ = _seq_layers(sd, f"decoder.decoder1_{k}")
        params[("decoder", f"decoder1_{k}", "kernel")] = _conv2d(sd[f"decoder.decoder1_{k}.{convs[0]}.weight"])
        params[("decoder", f"decoder1_{k}", "bias")] = _vec(sd[f"decoder.decoder1_{k}.{convs[0]}.bias"])
        put_seq(("decoder", f"decoder2_{k}"), f"decoder.decoder2_{k}")
    params[("classifier", "kernel")] = _conv2d(sd["classifier.weight"])
    params[("classifier", "bias")] = _vec(sd["classifier.bias"])
    return _check_against_template(params, stats, template)


def discriminator_variables(sd: Dict[str, Any], template):
    """Map ``UncertaintyDiscriminator.state_dict()`` (``GAN.py:89-144``;
    bias-free convs, optional ``ext`` pair ``:101-105``)."""
    names = ("conv1", "conv2", "conv3", "conv4", "conv4_2", "conv4_3", "conv5")
    params = {
        (name, "kernel"): _conv2d(sd[f"{name}.weight"])
        for name in names
        if f"{name}.weight" in sd
    }
    return _check_against_template(params, {}, template)


def pointnetcls_variables(sd: Dict[str, Any], template, ft: Optional[bool] = None, ext: Optional[bool] = None):
    """Map ``PointNetCls.state_dict()`` (``PointNetCls.py:170-214``; STN
    blocks name their BNs bn1-3 for convs and bn4-5 for fcs)."""
    if ft is None or ext is None:
        ft, ext = infer_pointnet_arch(sd)
    params, stats = {}, {}

    def put_bn(dst, src):
        params[dst + ("BatchNorm_0", "scale")] = _vec(sd[f"{src}.weight"])
        params[dst + ("BatchNorm_0", "bias")] = _vec(sd[f"{src}.bias"])
        stats[dst + ("BatchNorm_0", "mean")] = _vec(sd[f"{src}.running_mean"])
        stats[dst + ("BatchNorm_0", "var")] = _vec(sd[f"{src}.running_var"])

    def put_stn(dst_prefix, src_prefix):
        for i in (1, 2, 3):
            params[dst_prefix + (f"conv{i}", "Conv_0", "kernel")] = _conv1d(sd[f"{src_prefix}.conv{i}.weight"])
            params[dst_prefix + (f"conv{i}", "Conv_0", "bias")] = _vec(sd[f"{src_prefix}.conv{i}.bias"])
            put_bn(dst_prefix + (f"n_conv{i}",), f"{src_prefix}.bn{i}")
        for j, bn in ((1, 4), (2, 5)):
            params[dst_prefix + (f"fc{j}", "Dense_0", "kernel")] = _dense(sd[f"{src_prefix}.fc{j}.weight"])
            params[dst_prefix + (f"fc{j}", "Dense_0", "bias")] = _vec(sd[f"{src_prefix}.fc{j}.bias"])
            put_bn(dst_prefix + (f"n_fc{j}",), f"{src_prefix}.bn{bn}")
        params[dst_prefix + ("fc3", "Dense_0", "kernel")] = _dense(sd[f"{src_prefix}.fc3.weight"])
        params[dst_prefix + ("fc3", "Dense_0", "bias")] = _vec(sd[f"{src_prefix}.fc3.bias"])

    put_stn(("feat", "stn"), "feat.stn")
    if ft:
        put_stn(("feat", "fstn"), "feat.fstn")
    conv_names = ("conv1", "conv1_1", "conv2", "conv2_1", "conv3", "conv3_1") if ext else ("conv1", "conv2", "conv3")
    for name in conv_names:
        params[("feat", name, "Conv_0", "kernel")] = _conv1d(sd[f"feat.{name}.weight"])
        params[("feat", name, "Conv_0", "bias")] = _vec(sd[f"feat.{name}.bias"])
        put_bn(("feat", f"bn_{name}"), f"feat.{name.replace('conv', 'bn')}")
    for j in (1, 2, 3):
        params[(f"fc{j}", "Dense_0", "kernel")] = _dense(sd[f"fc{j}.weight"])
        params[(f"fc{j}", "Dense_0", "bias")] = _vec(sd[f"fc{j}.bias"])
    put_bn(("bn1",), "bn1")
    put_bn(("bn2",), "bn2")
    return _check_against_template(params, stats, template)


# ---------------------------------------------------------------------------
# filename flag parsing (the reference's experiment-tracking contract)
# ---------------------------------------------------------------------------


def flags_from_name(name: str) -> Dict[str, Any]:
    """Parse the training flags ``get_appendix`` serialised into the
    checkpoint filename — the same greps the reference evaluators run
    (``evaluate_mmwhs.py:231-253``, ``evaluate_mscmrseg.py:244-259``) plus
    the lr tags and the embedded ``.Scr`` score."""
    import os

    base = os.path.basename(name)

    def lr_tag(tag):
        m = re.search(rf"(?:^|\.){tag}((?:\d+\.?\d*|\.\d+)(?:e-?\d+)?)", base)
        return float(m.group(1)) if m else None

    m_scr = re.search(r"\.Scr(\d*\.?\d+)", base)
    return {
        "d1": "d1lr" in base,
        "d2": "d2lr" in base,
        "d4": "d4lr" in base or "d4aux" in base,
        "pointnet": "d4lr" in base,  # evaluate_mmwhs.py:237
        "d4aux": "d4aux" in base,
        "extpn": "extpn" in base,
        "extd4": "extd4" in base,
        "ft": bool(re.search(r"(?:^|\.)ft(?:\.|$)", base)),
        "softmax": "softmax" in base,
        "offaug": "offaug" in base,
        "aug2": "aug2" in base,
        "offmh": "offmh" in base,
        "offdecay": "offdecay" in base,
        "etpls": "etpls" in base and "Tetpls" not in base,
        "Tetpls": "Tetpls" in base,
        "sgd": bool(re.search(r"(?:^|\.)sgd(?:\.|$)", base)),
        "lr": lr_tag("lr"),
        "d1lr": lr_tag("d1lr"),
        "d2lr": lr_tag("d2lr"),
        "d4lr": lr_tag("d4lr"),
        "score": float(m_scr.group(1)) if m_scr else None,
    }


# ---------------------------------------------------------------------------
# top-level import
# ---------------------------------------------------------------------------


def import_torch_checkpoint(
    pt_path: str,
    out_dir: str,
    kind: Optional[str] = None,
    compute_dtype: str = "float32",
) -> Dict[str, Any]:
    """Convert one reference ``.pt`` into an Orbax checkpoint directory.

    Returns a summary dict: kind, inferred architecture, filename flags,
    epoch, and the evaluator invocation hint. The written tree is exactly
    what ``train.checkpoint.restore_net_state`` / the evaluator CLIs load.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from pointcloududa_tpu.train.checkpoint import save_pytree
    from pointcloududa_tpu.train.state import NetState, adam_reference, sgd_reference

    payload = torch.load(pt_path, map_location="cpu")
    sd, epoch = unwrap_payload(payload)
    sd = {k: _np(v) for k, v in sd.items()}
    kind = kind or detect_network_kind(sd)
    flags = flags_from_name(pt_path)
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    rng = jax.random.PRNGKey(0)
    summary: Dict[str, Any] = {"kind": kind, "epoch": epoch, "flags": flags, "out_dir": out_dir}

    if kind == "generator":
        from pointcloududa_tpu.models.unet import SegmentationPointModel

        arch = infer_generator_arch(sd)
        model = SegmentationPointModel(
            filters=arch.filters,
            in_channels=arch.in_channels,
            n_block=arch.n_block,
            bottleneck_depth=arch.bottleneck_depth,
            n_class=arch.n_class,
            pointnet=arch.pointnet,
            fc_inch=arch.fc_inch,
            extpn=arch.extpn,
            drop=arch.drop,
            compute_dtype=dtype,
        )
        x = jnp.zeros((1, arch.input_size, arch.input_size, arch.in_channels), jnp.float32)
        template = model.init(rng, x, train=False)
        variables = generator_variables(sd, template, arch)
        # the reference trains the generator with Adam unless -sgd
        # (train_mscmrseg.py:427-431, train_mmwhs.py:453-459)
        tx = sgd_reference(flags["lr"] or 1e-3, momentum=0.95) if flags["sgd"] else adam_reference(flags["lr"] or 1e-3)
        summary["arch"] = arch
        workload = "mmwhs" if arch.n_class == 5 else "mscmrseg"
        summary["workload"] = workload
        summary["hint"] = (
            f"python -m pointcloududa_tpu evaluate-{workload} -model_dir {out_dir}"
            + (" -d4" if arch.pointnet else "")
        )
    elif kind == "discriminator":
        from pointcloududa_tpu.models.discriminator import UncertaintyDiscriminator

        in_channel, ext = infer_discriminator_arch(sd)
        model = UncertaintyDiscriminator(in_channel=in_channel, ext=ext, compute_dtype=dtype)
        template = model.init(rng, jnp.zeros((1, 64, 64, in_channel), jnp.float32))
        variables = discriminator_variables(sd, template)
        lr = flags["d1lr"] or flags["d2lr"] or 2.5e-5
        tx = sgd_reference(lr, momentum=0.99)
        summary["arch"] = {"in_channel": in_channel, "ext": ext}
    elif kind == "pointnet":
        from pointcloududa_tpu.models.pointnet import PointNetCls

        ft, ext = infer_pointnet_arch(sd)
        model = PointNetCls(feature_transform=ft, ext=ext, compute_dtype=dtype)
        template = model.init(rng, jnp.zeros((2, 300, 3), jnp.float32), train=False)
        variables = pointnetcls_variables(sd, template, ft, ext)
        tx = sgd_reference(flags["d4lr"] or 2.5e-5, momentum=0.99)
        summary["arch"] = {"feature_transform": ft, "ext": ext}
    else:
        raise ValueError(f"unknown kind {kind!r}")

    net = NetState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    save_pytree(out_dir, {"epoch": np.int64(epoch), "state": {"net": net, "config": None}})
    return summary
