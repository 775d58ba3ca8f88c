"""PointNet binary classifier (D4) with STN3d / STNkd spatial transformers.

Parity with reference ``src/networks/PointNetCls.py``:

- ``STN3d`` (``:11-63``): shared MLP 3-64-128-1024 (1x1 convs) + max-pool +
  FC 1024-512-256-9, identity-biased 3x3 transform.
- ``STNkd`` (``:66-102``): same with k*k output.
- ``PointNetfeat`` (``:104-168``): input transform -> shared MLP
  (64-128-1024, or the ``ext`` 8-64-128-256-512-1024 ladder ``:109-121``) ->
  global max-pool. NOTE: the non-ext path applies bn3 *without* a ReLU
  before the max (``:159``) — reproduced.
- ``PointNetCls`` (``:170-214``): FC 1024-512-256-1 with Dropout(0.3)
  *before* bn2 (``:209``).

Layout: points are (B, N, D) channel-last (the reference transposes to
(B, D, N) for Conv1d; 1x1 Conv1d == per-point Dense, so here every shared-MLP
stage is an MXU matmul over the N axis directly).

Batch-size-1 behaviour: the reference switches BatchNorm -> InstanceNorm1d
with running stats (``:40-55``, ``:207-212``). Here the bs==1 branch (a
static trace-time branch) uses per-sample normalisation over the point axis
for conv stages and over features for FC stages, without running stats —
torch 1.4's InstanceNorm1d on 2-D FC activations was itself ill-defined, so
this is a documented, well-defined equivalent of that inference-only edge
path.

Initialisation: the reference's ``_initialize_weights`` loops only over
``nn.Conv2d`` modules — PointNet contains none, so *all* its layers keep
torch defaults (U(+-1/sqrt(fan_in))) regardless of flags; reproduced via
``torch_linear_init``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from pointcloududa_tpu.models.init import torch_linear_init
from pointcloududa_tpu.models.unet import _TwinBatchNorm


class _Norm1d(nn.Module):
    """BatchNorm over (B, ..., C) with a static single-sample fallback."""

    single_sample: bool
    compute_dtype: Any = jnp.float32
    # torch-exact running-variance update (n/(n-1)); False restores flax's
    # biased update — honouring config.torch_bn_stats model-wide
    torch_bn_stats: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        if not self.single_sample:
            # torch-exact BatchNorm1d twin: flax-identical f32 normalisation,
            # but the running-variance update feeds the unbiased (n/(n-1))
            # batch variance like torch (reference PointNetCls.py BatchNorm1d
            # layers). State tree matches flax ("BatchNorm_0" {mean,var}).
            return _TwinBatchNorm(unbiased=self.torch_bn_stats, name="BatchNorm_0")(
                x, use_running_average=not train
            ).astype(self.compute_dtype)
        # per-sample normalisation (instance-norm style, no running stats)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        if x.ndim == 3:  # (B, N, C): stats over points
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
        else:  # (B, C): stats over features
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        return x * scale + bias


class _PointConv(nn.Module):
    """Shared-MLP stage: Conv1d(k) over the point axis of (B, N, C)."""

    features: int
    kernel: int = 1
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel
        return nn.Conv(
            self.features,
            (self.kernel,),
            strides=(self.stride,),
            padding=((self.kernel // 2, self.kernel // 2),),
            kernel_init=torch_linear_init(fan_in),
            bias_init=torch_linear_init(fan_in),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)


class _Dense(nn.Module):
    features: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_linear_init(fan_in),
            bias_init=torch_linear_init(fan_in),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)


class STNkd(nn.Module):
    """Transform regressor: returns an identity-biased (k, k) matrix per
    sample (reference STN3d for k=3, STNkd otherwise)."""

    k: int = 3
    compute_dtype: Any = jnp.float32
    torch_bn_stats: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        single = x.shape[0] == 1
        tbs = self.torch_bn_stats
        for ch, name in ((64, "conv1"), (128, "conv2"), (1024, "conv3")):
            x = _PointConv(ch, compute_dtype=self.compute_dtype, name=name)(x)
            x = nn.relu(_Norm1d(single, self.compute_dtype, tbs, name=f"n_{name}")(x, train))
        x = jnp.max(x, axis=1)  # (B, 1024)
        for ch, name in ((512, "fc1"), (256, "fc2")):
            x = _Dense(ch, compute_dtype=self.compute_dtype, name=name)(x)
            x = nn.relu(_Norm1d(single, self.compute_dtype, tbs, name=f"n_{name}")(x, train))
        x = _Dense(self.k * self.k, compute_dtype=self.compute_dtype, name="fc3")(x)
        iden = jnp.eye(self.k, dtype=x.dtype).reshape(1, self.k * self.k)
        return (x + iden).reshape(-1, self.k, self.k)


class PointNetFeat(nn.Module):
    """Global feature extractor (reference ``PointNetfeat``)."""

    global_feat: bool = True
    feature_transform: bool = False
    sample_transform: bool = True
    kernel_size: int = 1
    stride: int = 1
    dim: int = 3
    ext: bool = False
    compute_dtype: Any = jnp.float32
    torch_bn_stats: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, N, dim)
        n_pts = x.shape[1]
        single = x.shape[0] == 1
        trans = None
        if self.sample_transform:
            trans = STNkd(k=self.dim, compute_dtype=self.compute_dtype,
                          torch_bn_stats=self.torch_bn_stats, name="stn")(x, train)
            x = jnp.einsum("bnd,bde->bne", x, trans, preferred_element_type=jnp.float32)
        k, s = self.kernel_size, self.stride

        def stage(x, ch, name, relu=True):
            x = _PointConv(ch, k, s, self.compute_dtype, name=name)(x)
            x = _Norm1d(single, self.compute_dtype, self.torch_bn_stats,
                        name=f"bn_{name}")(x, train)
            return nn.relu(x) if relu else x

        if self.ext:
            x = stage(x, 8, "conv1")
            x = stage(x, 64, "conv1_1")
        else:
            x = stage(x, 64, "conv1")

        trans_feat = None
        if self.feature_transform:
            trans_feat = STNkd(k=64, compute_dtype=self.compute_dtype,
                               torch_bn_stats=self.torch_bn_stats, name="fstn")(x, train)
            x = jnp.einsum("bnd,bde->bne", x, trans_feat, preferred_element_type=jnp.float32)

        pointfeat = x
        x = stage(x, 128, "conv2")
        if self.ext:
            x = stage(x, 256, "conv2_1")
            # parity quirk: bn3 is applied with NO ReLU in BOTH paths — the
            # reference's `x = self.bn3(self.conv3(x))` is unconditional
            # (PointNetCls.py:159), so the ext conv3_1 consumes the raw bn3
            # output
            x = stage(x, 512, "conv3", relu=False)
            x = stage(x, 1024, "conv3_1")
        else:
            # parity quirk: bn3 with NO ReLU before the max (PointNetCls.py:159)
            x = stage(x, 1024, "conv3", relu=False)
        x = jnp.max(x, axis=1)  # (B, 1024) global max-pool over points
        if self.global_feat:
            return x, trans, trans_feat
        rep = jnp.broadcast_to(x[:, None, :], (x.shape[0], n_pts, x.shape[-1]))
        return jnp.concatenate([rep, pointfeat], axis=-1), trans, trans_feat


class PointNetCls(nn.Module):
    """Binary point-cloud discriminator. Returns (logit(B,1), trans, trans_feat)."""

    feature_transform: bool = False
    sample_transform: bool = True
    kernel_size: int = 1
    stride: int = 1
    dim: int = 3
    ext: bool = False
    drop: float = 0.3
    compute_dtype: Any = jnp.float32
    torch_bn_stats: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        single = x.shape[0] == 1
        x, trans, trans_feat = PointNetFeat(
            global_feat=True,
            feature_transform=self.feature_transform,
            sample_transform=self.sample_transform,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dim=self.dim,
            ext=self.ext,
            compute_dtype=self.compute_dtype,
            torch_bn_stats=self.torch_bn_stats,
            name="feat",
        )(x, train)
        x = _Dense(512, compute_dtype=self.compute_dtype, name="fc1")(x)
        x = nn.relu(_Norm1d(single, self.compute_dtype, self.torch_bn_stats,
                            name="bn1")(x, train))
        x = _Dense(256, compute_dtype=self.compute_dtype, name="fc2")(x)
        # dropout BEFORE the norm, as in the reference (PointNetCls.py:209)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.relu(_Norm1d(single, self.compute_dtype, self.torch_bn_stats,
                            name="bn2")(x, train))
        x = _Dense(1, compute_dtype=self.compute_dtype, name="fc3")(x)
        return x.astype(jnp.float32), trans, trans_feat


def feature_transform_regularizer(trans: jnp.ndarray) -> jnp.ndarray:
    """Orthogonality penalty ``mean_b ||I - A A^T||_F``.

    Reference ``PointNetCls.py:217-224`` — defined there but never wired
    into training; exposed here for the same optional use.
    """
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=trans.dtype)[None]
    prod = jnp.einsum("bij,bkj->bik", trans, trans, preferred_element_type=jnp.float32)
    return jnp.mean(jnp.linalg.norm(prod - eye, axis=(1, 2)))
