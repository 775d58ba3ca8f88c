"""Parameter initialisers matching the reference's PyTorch initialisation.

- default conv init: N(0, 0.02) with zero bias
  (reference ``src/networks/unet.py:203-208``, ``GAN.py:123-128``);
- ``heinit``: N(0, sqrt(2 / prod(weight.shape[1:]))) — He-normal on
  fan_in = in_ch * kh * kw (reference ``unet.py:195-202``);
- torch layer defaults (kaiming_uniform(a=sqrt(5)) which reduces to
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight *and* bias) for every layer
  the reference's init loops skip (nn.Linear everywhere, all of PointNetCls).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def normal_002():
    return nn.initializers.normal(stddev=0.02)


def he_prod_normal():
    """std = sqrt(2 / (kh * kw * in_ch)) — fan_in normal, not truncated."""
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def conv_init(heinit: bool):
    return he_prod_normal() if heinit else normal_002()


def torch_linear_init(fan_in: int):
    """torch nn.Linear/Conv default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Works for both kernel and bias (torch uses the same bound for both).
    ``fan_in`` must be supplied because flax bias initialisers only see the
    bias shape.
    """
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
