"""The segmentation generator: dense-skip U-Net with a dilated bottleneck
and an optional point-cloud regression head.

Architecture parity with reference ``src/networks/unet.py`` (layer graph,
channel plan, activations, initialisation, parameter count 13,483,844 at
``filters=32, n_block=4, pointnet=False`` — ``unet.py:166``), re-designed
TPU-first:

- NHWC layout, channels padded naturally onto the MXU by XLA.
- float32 parameters with a configurable ``compute_dtype`` (bfloat16 on TPU).
- nearest-neighbour upsampling as a reshape/broadcast (no gather).
- the reference's ``multicuda`` 2-GPU activation-hopping (``unet.py:180-192``)
  is obsolete on TPU — the whole model fits per core; scale-out is data
  parallelism over the device mesh (see ``pointcloududa_tpu.parallel``).

The reference's first-block 1x1 "dense remix" conv is constructed but never
applied by its forward pass (``unet.py:32-33`` vs ``:44-48``); its (dead)
parameters are still allocated here (``dead_conv_parity``) so checkpoints
and parameter counts line up exactly.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloududa_tpu.models.init import conv_init, torch_linear_init
from pointcloududa_tpu.ops.bn_pallas import batch_stats_nhwc, batch_stats_packed
from pointcloududa_tpu.ops.packed import (
    depth_to_space,
    pack_bias,
    pack_conv_kernel,
    pack_pointwise_kernel,
    pack_upconv_kernel,
    packed_conv,
    packed_max_pool,
    space_to_depth,
)

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU() default, used by the whole generator


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsampling of NHWC as broadcast+reshape.

    Equivalent of ``nn.UpsamplingNearest2d(scale_factor=2)``
    (reference ``unet.py:111``) without gathers: lowers to a copy that XLA
    fuses into the following convolution's input.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class ConvLReLUNorm(nn.Module):
    """Conv3x3 + LeakyReLU + (optional) BatchNorm — one half of the double
    conv used throughout encoder/decoder (reference ``unet.py:23-30``)."""

    features: int
    kernel: int = 3
    batch_norm: bool = True
    dropout: bool = False
    heinit: bool = False
    bn_pallas: bool = False
    torch_bn_stats: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME",
            kernel_init=conv_init(self.heinit),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)
        x = _leaky(x)
        if self.dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        if self.batch_norm:
            if self.bn_pallas or self.torch_bn_stats:
                # _TwinBatchNorm: flax-identical normalisation; with
                # ``unbiased`` the running-variance update feeds the
                # n/(n-1)-corrected batch variance, exactly like torch's
                # nn.BatchNorm2d (reference src/networks/unet.py:28) —
                # the default, so running stats match torch to fp tolerance
                x = _TwinBatchNorm(
                    bn_pallas=self.bn_pallas,
                    unbiased=self.torch_bn_stats,
                    name="BatchNorm_0",
                )(x, use_running_average=not train).astype(self.compute_dtype)
            else:
                # pure-flax path (torch_bn_stats=False): biased running-var
                # update, f32 normalisation end-to-end
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=jnp.float32,
                    param_dtype=jnp.float32,
                )(x).astype(self.compute_dtype)
        return x


class _PConv(nn.Module):
    """Packed twin of a 3x3/1x1 ``nn.Conv``: parameters are declared in the
    ORIGINAL unpacked shape under the same names (``kernel``/``bias``), so
    checkpoints interoperate with the standard path; the kernel is packed on
    the fly (see ``ops/packed.py``). ``kind``:

    - ``conv``:      packed in (B,h,w,4C) -> packed out (B,h,w,4K)
    - ``upconv``:    UNPACKED low-res in (B,h,w,C) -> packed out (B,h,w,4K)
                     == nearest-up(2x) + 3x3 SAME conv, fused
    - ``pointwise``: packed 1x1 conv (sub-position block-diagonal)
    """

    features: int
    kind: str = "conv"
    heinit: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1] if self.kind == "upconv" else x.shape[-1] // 4
        spatial = (1, 1) if self.kind == "pointwise" else (3, 3)
        kernel = self.param(
            "kernel", conv_init(self.heinit), (*spatial, c_in, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        pack = {
            "conv": pack_conv_kernel,
            "upconv": pack_upconv_kernel,
            "pointwise": pack_pointwise_kernel,
        }[self.kind]
        return packed_conv(
            x.astype(self.compute_dtype),
            pack(kernel).astype(self.compute_dtype),
            pack_bias(bias).astype(self.compute_dtype),
        )


class _TwinBatchNorm(nn.Module):
    """Twin of ``nn.BatchNorm(dtype=f32, use_fast_variance=True)`` for the
    non-flax execution paths: ``packed`` computes per-ORIGINAL-channel
    statistics over (batch, space, sub-position lanes) of a c-major packed
    tensor; ``bn_pallas`` selects the Pallas single-pass stats kernel
    (ops/bn_pallas.py) over the jnp reduction. flax semantics throughout
    (f32 fast variance with clipping, momentum running update, frozen at
    init); param/variable names and (C,) shapes match flax, so the state
    tree is identical to the standard path.

    ``unbiased``: feed the n/(n-1)-corrected (unbiased) batch variance into
    the running-variance update — torch ``nn.BatchNorm2d`` semantics
    (reference ``src/networks/unet.py:28``; normalisation itself still uses
    the biased variance, exactly like torch). flax's default is the biased
    update; the factor was PARITY.md deviation 0 until it became this flag."""

    packed: bool = False
    bn_pallas: bool = False
    unbiased: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1] // 4 if self.packed else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            stats = batch_stats_packed if self.packed else batch_stats_nhwc
            mean, var = stats(x, use_kernel=self.bn_pallas)
            if not self.is_initializing():
                # per-channel element count; a packed tensor's 4 sub-position
                # lanes belong to the same original channel, so n equals the
                # unpacked B*H*W either way
                n = x.size // c
                up_var = var * (n / (n - 1)) if self.unbiased else var
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * up_var
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * mul
        if self.packed:
            mul, shift = pack_bias(mul), pack_bias(shift)
        return x.astype(jnp.float32) * mul + shift


class PackedConvLReLUNorm(nn.Module):
    """Packed twin of :class:`ConvLReLUNorm` (child names ``Conv_0``/
    ``Dropout_0``/``BatchNorm_0`` match the standard path's auto-names, so
    the param/state tree is identical). Dropout draws its mask in the packed
    layout — same marginal distribution, different RNG alignment."""

    features: int
    batch_norm: bool = True
    dropout: bool = False
    heinit: bool = False
    bn_pallas: bool = False
    torch_bn_stats: bool = True
    compute_dtype: Any = jnp.float32
    kind: str = "conv"

    @nn.compact
    def __call__(self, xp, train: bool):
        xp = _PConv(
            self.features,
            kind=self.kind,
            heinit=self.heinit,
            compute_dtype=self.compute_dtype,
            name="Conv_0",
        )(xp)
        xp = _leaky(xp)
        if self.dropout:
            xp = nn.Dropout(0.5, deterministic=not train, name="Dropout_0")(xp)
        if self.batch_norm:
            xp = _TwinBatchNorm(
                packed=True,
                bn_pallas=self.bn_pallas,
                unbiased=self.torch_bn_stats,
                name="BatchNorm_0",
            )(xp, use_running_average=not train)
            xp = xp.astype(self.compute_dtype)
        return xp


class Encoder(nn.Module):
    """4-block downsampling path with the dense 1x1-conv remix.

    Per block k (1-indexed), mirroring reference ``unet.py:35-51``:
    double-conv -> save skip -> (k>1: concat with previous pooled tensor ->
    1x1 conv + LeakyReLU) -> 2x2 max-pool. Channels: filters * 2^(k-1).
    """

    filters: int = 32
    in_channels: int = 3
    n_block: int = 4
    batch_norm: bool = True
    heinit: bool = False
    dead_conv_parity: bool = True
    packed_level0: bool = False
    # pack block 2 as well (ops/packed.py): profitable because its 32->64
    # conv halves MXU padding waste and its BN/elementwise ops halve HBM
    # traffic; independent of packed_level0
    packed_level1: bool = False
    bn_pallas: bool = False
    # torch-exact running-variance update (n/(n-1) factor); see
    # _TwinBatchNorm.unbiased — default matches the reference
    torch_bn_stats: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        skips = []
        res = None
        for i in range(self.n_block):
            out_ch = self.filters * 2**i
            in_ch = self.in_channels if i == 0 else self.filters * 2 ** (i - 1)
            if i == 0 and self.dead_conv_parity:
                # reference constructs conv1_1 (in_ch*3 -> filters) but its
                # forward never calls it (unet.py:32-33, :44-48). Allocate the
                # same parameters (unused; DCE'd by XLA) for count parity —
                # layout-independent, hence declared before the branch.
                self.param(
                    "conv1_1_dead_kernel",
                    conv_init(self.heinit),
                    (1, 1, in_ch * 3, out_ch),
                    jnp.float32,
                )
                self.param(
                    "conv1_1_dead_bias", nn.initializers.zeros_init(), (out_ch,), jnp.float32
                )
            if i == 1 and self.packed_level1:
                # block 2 space-to-depth packed at the 56^2 grid. ``res`` (the
                # remix operand) IS this block's input, so its packed form is
                # the same s2d tensor; the 1x1 remix is a sub-position
                # block-diagonal pointwise conv. The skip is stored PACKED.
                xp = space_to_depth(x)
                res_p = xp
                for j in range(2):
                    xp = PackedConvLReLUNorm(
                        out_ch,
                        batch_norm=self.batch_norm,
                        heinit=self.heinit,
                        bn_pallas=self.bn_pallas,
                        torch_bn_stats=self.torch_bn_stats,
                        compute_dtype=self.compute_dtype,
                        name=f"encoder2_conv{j + 1}",
                    )(xp, train)
                skips.append(xp)
                xp = jnp.concatenate([xp, res_p], axis=-1)
                xp = _PConv(
                    out_ch,
                    kind="pointwise",
                    heinit=self.heinit,
                    compute_dtype=self.compute_dtype,
                    name="conv1_2",
                )(xp)
                xp = _leaky(xp)
                x = packed_max_pool(xp)
                res = x
                continue
            if i == 0 and self.packed_level0:
                # level-0 runs space-to-depth packed (ops/packed.py): the
                # skip is stored PACKED (the decoder's matching branch
                # consumes it) and the 2x2 pool collapses the sub-position
                # lanes, handing block 2 the standard unpacked tensor.
                xp = space_to_depth(x)
                for j in range(2):
                    xp = PackedConvLReLUNorm(
                        out_ch,
                        batch_norm=self.batch_norm,
                        heinit=self.heinit,
                        bn_pallas=self.bn_pallas,
                        torch_bn_stats=self.torch_bn_stats,
                        compute_dtype=self.compute_dtype,
                        name=f"encoder1_conv{j + 1}",
                    )(xp, train)
                skips.append(xp)
                x = packed_max_pool(xp)
                res = x
                continue
            for j in range(2):
                x = ConvLReLUNorm(
                    out_ch,
                    batch_norm=self.batch_norm,
                    heinit=self.heinit,
                    bn_pallas=self.bn_pallas,
                    torch_bn_stats=self.torch_bn_stats,
                    compute_dtype=self.compute_dtype,
                    name=f"encoder{i + 1}_conv{j + 1}",
                )(x, train)
            skips.append(x)
            if i > 0:
                x = jnp.concatenate([x, res], axis=-1)
                x = nn.Conv(
                    out_ch,
                    (1, 1),
                    kernel_init=conv_init(self.heinit),
                    dtype=self.compute_dtype,
                    param_dtype=jnp.float32,
                    name=f"conv1_{i + 1}",
                )(x)
                x = _leaky(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            res = x
        return x, skips


class Bottleneck(nn.Module):
    """Dense dilated pyramid: 4 dilated 3x3 convs (dilation 1,2,4,8) whose
    intermediate activations are summed (reference ``unet.py:54-73``)."""

    filters: int = 32
    n_block: int = 4
    depth: int = 4
    heinit: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.filters * 2**self.n_block
        total = 0.0
        for i in range(self.depth):
            dilate = 2**i
            x = nn.Conv(
                out_ch,
                (3, 3),
                kernel_dilation=(dilate, dilate),
                padding=((dilate, dilate), (dilate, dilate)),
                kernel_init=conv_init(self.heinit),
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name=f"bottleneck{i + 1}",
            )(x)
            x = _leaky(x)
            total = total + x
        return total


class PointHead(nn.Module):
    """Regresses a (num_points, 3) cloud from bottleneck features.

    Reference ``unet.py:76-96``: (ext: two 3x3 convs) -> Conv k6 VALID with
    ``num_points`` output channels + LeakyReLU -> flatten spatial (row-major
    H,W — matching torch's NCHW ``view``) -> Linear(fc_inch -> 3).
    """

    num_points: int = 300
    fc_inch: int = 81
    conv_inch: int = 512
    ext: bool = False
    heinit: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.fc_inch <= 0:
            raise ValueError(
                "PointHead needs fc_inch = (bottleneck_hw - 5)^2 > 0 "
                f"(got {self.fc_inch}); the input must be >= 96px for a "
                "4-block encoder (bottleneck >= 6 for the k6 VALID conv)"
            )
        if self.ext:
            for ch, name in ((self.conv_inch * 2, "conv1"), (self.conv_inch, "conv2")):
                x = nn.Conv(
                    ch,
                    (3, 3),
                    padding="SAME",
                    kernel_init=conv_init(self.heinit),
                    dtype=self.compute_dtype,
                    param_dtype=jnp.float32,
                    name=name,
                )(x)
                x = _leaky(x)
        x = nn.Conv(
            self.num_points,
            (6, 6),
            padding="VALID",
            kernel_init=conv_init(self.heinit),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="final_conv",
        )(x)
        x = _leaky(x)
        b, h, w, p = x.shape
        # NHWC -> (B, P, H*W): channel-first flatten to match torch view()
        x = x.transpose(0, 3, 1, 2).reshape(b, p, h * w)
        # torch-default init: the reference's custom init loop only touches
        # Conv2d, so final_fc keeps nn.Linear defaults (unet.py:194-208)
        x = nn.Dense(
            3,
            kernel_init=torch_linear_init(self.fc_inch),
            bias_init=torch_linear_init(self.fc_inch),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="final_fc",
        )(x)
        return x  # (B, num_points, 3)


class Decoder(nn.Module):
    """4 up-blocks: upsample2x+conv -> concat skip (LIFO) -> double conv.

    Reference ``unet.py:100-136``. Note the concat order is
    ``[skip, upsampled]`` and the up-conv has no activation.
    """

    filters: int = 32
    n_block: int = 4
    batch_norm: bool = True
    drop: bool = False
    heinit: bool = False
    packed_level0: bool = False
    # pack the level-1 up-conv (fused nearest-up+conv, ops/packed.py) and
    # consume the packed skip; the 128->64 double conv stays standard — it
    # is MXU-bound at 4x-logical FLOPs whether packed or padded, so packing
    # it would only add MXU work (profiles/README.md r2_trace_packed)
    packed_level1: bool = False
    bn_pallas: bool = False
    # torch-exact running-variance update (n/(n-1) factor); see
    # _TwinBatchNorm.unbiased — default matches the reference
    torch_bn_stats: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips: Sequence[jnp.ndarray], train: bool):
        skips = list(skips)
        for i in reversed(range(self.n_block)):
            out_ch = self.filters * 2**i
            if i == 1 and self.packed_level1:
                xp = _PConv(
                    out_ch,
                    kind="upconv",
                    heinit=self.heinit,
                    compute_dtype=self.compute_dtype,
                    name="decoder1_2",
                )(x)
                xp = jnp.concatenate([skips.pop(), xp], axis=-1)
                # unpack for the (deliberately standard) double conv;
                # c-major packing commutes with the [skip, up] concat
                x = depth_to_space(xp)
                for j in range(2):
                    x = ConvLReLUNorm(
                        out_ch,
                        batch_norm=self.batch_norm,
                        dropout=self.drop and j == 0,
                        heinit=self.heinit,
                        bn_pallas=self.bn_pallas,
                        torch_bn_stats=self.torch_bn_stats,
                        compute_dtype=self.compute_dtype,
                        name=f"decoder2_2_conv{j + 1}",
                    )(x, train)
                continue
            if i == 0 and self.packed_level0:
                # fused nearest-up+conv emits the PACKED high-res tensor
                # directly (the 2x-upsampled intermediate never exists);
                # skips[0] arrives packed from the encoder, and c-major
                # packing makes the [skip, up] concat commute with it.
                xp = _PConv(
                    out_ch,
                    kind="upconv",
                    heinit=self.heinit,
                    compute_dtype=self.compute_dtype,
                    name="decoder1_1",
                )(x)
                xp = jnp.concatenate([skips.pop(), xp], axis=-1)
                for j in range(2):
                    xp = PackedConvLReLUNorm(
                        out_ch,
                        batch_norm=self.batch_norm,
                        dropout=self.drop and j == 0,
                        heinit=self.heinit,
                        bn_pallas=self.bn_pallas,
                        torch_bn_stats=self.torch_bn_stats,
                        compute_dtype=self.compute_dtype,
                        name=f"decoder2_1_conv{j + 1}",
                    )(xp, train)
                return xp  # PACKED — the caller's classifier unpacks
            x = upsample_nearest_2x(x)
            x = nn.Conv(
                out_ch,
                (3, 3),
                padding="SAME",
                kernel_init=conv_init(self.heinit),
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name=f"decoder1_{i + 1}",
            )(x)
            x = jnp.concatenate([skips.pop(), x], axis=-1)
            for j in range(2):
                x = ConvLReLUNorm(
                    out_ch,
                    batch_norm=self.batch_norm,
                    dropout=self.drop and j == 0,
                    heinit=self.heinit,
                    bn_pallas=self.bn_pallas,
                    torch_bn_stats=self.torch_bn_stats,
                    compute_dtype=self.compute_dtype,
                    name=f"decoder2_{i + 1}_conv{j + 1}",
                )(x, train)
        return x


class SegmentationPointModel(nn.Module):
    """The generator: Encoder -> Bottleneck -> {PointHead} -> Decoder ->
    1x1 classifier. Returns ``(logits, None, point_cloud_or_None)`` to keep
    the reference's 3-tuple contract (``unet.py:210-233``).

    Input/output are NHWC; logits have ``n_class`` channels last.
    """

    filters: int = 32
    in_channels: int = 3
    n_block: int = 4
    bottleneck_depth: int = 4
    n_class: int = 4
    pointnet: bool = False
    fc_inch: int = 81
    extpn: bool = False
    batchnorm: bool = True
    drop: bool = False
    heinit: bool = False
    # auxiliary 1x1 classifier on the bottleneck — subsumes the reference's
    # older ``Segmentation_model(feature_dis=True)`` variant
    # (unet.py:139-162, unused by its entry points but part of the API)
    feature_dis: bool = False
    # run level 0 (the 224^2 C=32 ops) space-to-depth packed — numerically
    # equivalent, 4x less lane padding on TPU (ops/packed.py, docs/SCALING.md)
    packed_level0: bool = False
    # also pack the profitable level-1 ops (encoder block 2, the level-1
    # fused up-conv); see Encoder/Decoder docstrings for the op selection
    packed_level1: bool = False
    # compute BN batch statistics with the Pallas single-pass kernel
    # (ops/bn_pallas.py) instead of XLA's reduce — identical semantics
    bn_pallas: bool = False
    # torch-exact running-variance update (n/(n-1) factor); see
    # _TwinBatchNorm.unbiased — default matches the reference
    torch_bn_stats: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, *, emit_packed: bool = False):
        # emit_packed: skip the final depth_to_space and return the logits in
        # the c-major packed layout (B, H/2, W/2, 4*n_class) — the train
        # step's packed-compute path consumes them directly (losses are
        # layout-agnostic; see train/step.py). Requires packed_level0.
        if emit_packed and not self.packed_level0:
            raise ValueError("emit_packed requires packed_level0")
        x = x.astype(self.compute_dtype)
        if self.packed_level0 and (x.shape[1] % 2 or x.shape[2] % 2):
            raise ValueError(f"packed_level0 needs even H, W (got {x.shape[1:3]})")
        packed_l1 = self.packed_level1 and self.n_block >= 2
        if packed_l1 and (x.shape[1] % 4 or x.shape[2] % 4):
            raise ValueError(f"packed_level1 needs H, W divisible by 4 (got {x.shape[1:3]})")
        feats, skips = Encoder(
            filters=self.filters,
            in_channels=self.in_channels,
            n_block=self.n_block,
            batch_norm=self.batchnorm,
            heinit=self.heinit,
            packed_level0=self.packed_level0,
            packed_level1=packed_l1,
            bn_pallas=self.bn_pallas,
            torch_bn_stats=self.torch_bn_stats,
            compute_dtype=self.compute_dtype,
            name="encoder",
        )(x, train)
        bott = Bottleneck(
            filters=self.filters,
            n_block=self.n_block,
            depth=self.bottleneck_depth,
            heinit=self.heinit,
            compute_dtype=self.compute_dtype,
            name="bottleneck",
        )(feats)
        feat_logits = None
        if self.feature_dis:
            feat_logits = nn.Conv(
                self.n_class,
                (1, 1),
                kernel_init=conv_init(self.heinit),
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name="classifier2",
            )(bott).astype(jnp.float32)
        points = None
        if self.pointnet:
            points = PointHead(
                num_points=300,
                fc_inch=self.fc_inch,
                conv_inch=512 * self.filters // 32,
                ext=self.extpn,
                heinit=self.heinit,
                compute_dtype=self.compute_dtype,
                name="pointNet",
            )(bott)
            points = points.astype(jnp.float32)
        x = Decoder(
            filters=self.filters,
            n_block=self.n_block,
            batch_norm=self.batchnorm,
            drop=self.drop,
            heinit=self.heinit,
            packed_level0=self.packed_level0,
            packed_level1=packed_l1,
            bn_pallas=self.bn_pallas,
            torch_bn_stats=self.torch_bn_stats,
            compute_dtype=self.compute_dtype,
            name="decoder",
        )(bott, skips, train)
        # classifier runs in f32 regardless of compute dtype: early-training
        # inter-class logit gaps sit below bf16 resolution, and quantising
        # them makes argmax degenerate to the first class (a metric/inference
        # artifact measured on real TPUs; the conv is negligible FLOPs)
        if self.packed_level0:
            # block-diagonal packed 1x1 over the packed decoder output,
            # then unpack the (tiny) n_class logit planes
            logits = _PConv(
                self.n_class,
                kind="pointwise",
                heinit=self.heinit,
                compute_dtype=jnp.float32,
                name="classifier",
            )(x.astype(jnp.float32))
            if not emit_packed:
                logits = depth_to_space(logits)
        else:
            logits = nn.Conv(
                self.n_class,
                (1, 1),
                kernel_init=conv_init(self.heinit),
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name="classifier",
            )(x.astype(jnp.float32))
        return logits, feat_logits, points
