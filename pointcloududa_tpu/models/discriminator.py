"""PatchGAN discriminators for output space (D1) and entropy-map space (D2).

Parity with reference ``src/networks/GAN.py:89-144`` (UncertaintyDiscriminator):
5 strided 4x4 convs (64-128-256-512-1), LeakyReLU(0.2), no normalisation,
no biases; ``ext`` inserts two extra 3x3 s2 convs before the head
(``GAN.py:101-105``). The same class is instantiated twice per workload —
D1 consumes predictions, D2 consumes weighted self-information maps
(``train_mscmrseg.py:419-422``).

The reference's other discriminators (``Discriminator``,
``OutputDiscriminator``, ``BoundaryDiscriminator``,
``BoundaryEntDiscriminator``, ``GAN.py:7-86,147-209``) are dead code — never
instantiated by any entry point — and are intentionally not reproduced
(SURVEY.md §2.8).

TPU notes: NHWC; explicit ((2,2),(2,2)) padding reproduces torch's
``padding=2`` output sizes (224 -> 113 -> 57 -> 29 -> 15 -> 8).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from pointcloududa_tpu.models.init import conv_init
from pointcloududa_tpu.ops.packed import pack_stride2_kernel, packed_stride2_conv


class _PStride2Conv(nn.Module):
    """Packed twin of the first k4 s2 pad2 conv: the parameter keeps the
    unpacked (4,4,C,K) shape/name (checkpoint interop); the input arrives
    c-major space-to-depth packed (B,H/2,W/2,4C) and the output is the
    standard (B,ceil(H/2)+1,...,K) tensor — exact, dense (ops/packed.py)."""

    features: int
    heinit: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        c_in = xp.shape[-1] // 4
        kernel = self.param(
            "kernel", conv_init(self.heinit), (4, 4, c_in, self.features), jnp.float32
        )
        return packed_stride2_conv(
            xp.astype(self.compute_dtype), pack_stride2_kernel(kernel).astype(self.compute_dtype)
        )


class UncertaintyDiscriminator(nn.Module):
    in_channel: int = 2  # kept for API parity; inferred from input in flax
    heinit: bool = False
    ext: bool = False
    # accept the c-major packed layout (B,H/2,W/2,4C) directly — the train
    # step's packed-compute path feeds packed probs/entropy maps without an
    # intermediate depth_to_space relayout
    packed_input: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)

        def sconv(x, ch, k, pad, name):
            return nn.Conv(
                ch,
                (k, k),
                strides=(2, 2),
                padding=((pad, pad), (pad, pad)),
                use_bias=False,
                kernel_init=conv_init(self.heinit),
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name=name,
            )(x)

        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        if self.packed_input:
            x = lrelu(
                _PStride2Conv(64, heinit=self.heinit, compute_dtype=self.compute_dtype,
                              name="conv1")(x)
            )
        else:
            x = lrelu(sconv(x, 64, 4, 2, "conv1"))
        x = lrelu(sconv(x, 128, 4, 2, "conv2"))
        x = lrelu(sconv(x, 256, 4, 2, "conv3"))
        x = lrelu(sconv(x, 512, 4, 2, "conv4"))
        if self.ext:
            x = lrelu(sconv(x, 1024, 3, 1, "conv4_2"))
            x = lrelu(sconv(x, 256, 3, 1, "conv4_3"))
        x = sconv(x, 1, 4, 2, "conv5")
        return x.astype(jnp.float32)  # patch logits (B, h', w', 1)
