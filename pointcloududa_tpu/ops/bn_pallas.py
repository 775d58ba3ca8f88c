"""Pallas TPU kernel for BatchNorm batch statistics (mean, mean-of-squares).

Why: the r2 packed-step profile (profiles/README.md) shows the per-pass BN
statistics reductions (`convert_reduce_fusion`) costing ~23% of the train
step, running at only ~210-330 GB/s — XLA's hierarchical reduce of
bf16[B,H,W,C] to f32[C] leaves >2x bandwidth on the table. A single-pass
Pallas accumulator (grid over row blocks, VMEM-resident (C,) partials)
measured 0.245 -> 0.116 ms on bf16[16,112,112,128] (v5e microbench).

Semantics: identical to flax's fast-variance statistics
(``flax.linen.normalization._compute_stats`` with use_fast_variance=True):
f32 accumulation, Var = E[x^2] - E[x]^2 clipped at 0 by the caller. The
custom VJP matches autodiff of the jnp formulation: d(mean)/dx = g_m / N,
d(meansq)/dx = 2 x g_q / N, cast back to the input dtype.

The kernel needs the flattened row count divisible by the block size; the
row block is chosen as the largest power-of-two divisor <= 1024 (>= 8 for
sublane alignment). Shapes that don't divide (or non-TPU backends) fall
back to the jnp path — ``bn_stats`` is always safe to call.

This is a pure execution-layer speedup of the reference's BatchNorm2d
(torch, ``src/networks/unet.py:23-30``); numerics are pinned by
tests/test_bn_pallas.py against flax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_ROWS = 1024


def _pick_rows(n: int) -> int:
    rows = _MAX_ROWS
    while rows >= 8:
        if n % rows == 0:
            return rows
        rows //= 2
    return 0


def _stats_kernel(x_ref, s_ref, q_ref):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    s = jnp.sum(x, 0)
    q = jnp.sum(x * x, 0)

    @pl.when(i == 0)
    def _init():
        s_ref[...] = s
        q_ref[...] = q

    @pl.when(i > 0)
    def _acc():
        s_ref[...] += s
        q_ref[...] += q


def _stats_jnp(x2d):
    xf = x2d.astype(jnp.float32)
    return jnp.mean(xf, 0), jnp.mean(xf * xf, 0)


def _tpu_kernel_viable() -> bool:
    """The Pallas TPU kernel compiles only on a TPU backend — including the
    ``axon`` relay plugin this machine reaches its real chip through (which
    registers its own platform name but compiles genuine TPU programs;
    the kernel was measured on it in r2) — or anywhere under
    ``pltpu.force_tpu_interpret_mode`` (the test harness). Any other
    backend (CPU, GPU — whose pallas dialect can't lower ``pltpu.VMEM``
    specs) falls back to the jnp path."""
    if jax.default_backend() in ("tpu", "axon"):
        return True
    ctx = _interpret_mode_ctx()
    return ctx is not None and ctx.value is not None


def _interpret_mode_ctx():
    """The (private, version-fragile) jax config handle for TPU interpret
    mode. tests/test_bn_pallas.py asserts this resolves, so a jax upgrade
    that renames it fails loudly instead of silently disabling the kernel's
    interpret-mode test coverage."""
    from jax._src import config as jax_config

    return getattr(jax_config, "pallas_tpu_interpret_mode_context_manager", None)


def _stats_fwd_impl(x2d):
    n, c = x2d.shape
    rows = _pick_rows(n)
    if rows == 0 or c % 128 != 0 or not _tpu_kernel_viable():
        return _stats_jnp(x2d)
    s, q = pl.pallas_call(
        _stats_kernel,
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((c,), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=3 * n * c, bytes_accessed=x2d.dtype.itemsize * n * c, transcendentals=0
        ),
    )(x2d)
    inv_n = 1.0 / n
    return s * inv_n, q * inv_n


@jax.custom_vjp
def bn_stats(x2d: jnp.ndarray):
    """(N, C) -> (mean, mean_of_squares), both f32 (C,)."""
    return _stats_fwd_impl(x2d)


def _bn_stats_fwd(x2d):
    return _stats_fwd_impl(x2d), x2d


def _bn_stats_bwd(x2d, g):
    gm, gq = g
    inv_n = 1.0 / x2d.shape[0]
    dx = gm * inv_n + x2d.astype(jnp.float32) * (2.0 * inv_n) * gq
    return (dx.astype(x2d.dtype),)


bn_stats.defvjp(_bn_stats_fwd, _bn_stats_bwd)


def batch_stats_nhwc(x: jnp.ndarray, use_kernel: bool = True):
    """flax-equivalent (mean, var) over all axes but the last. Fast-variance
    (single fused pass), f32, var clipped at 0. ``use_kernel=False`` forces
    the jnp reduction (XLA fuses it with the producer — the measured in-step
    default; see config.bn_stats_impl)."""
    c = x.shape[-1]
    stats = bn_stats if use_kernel else _stats_jnp
    mean, meansq = stats(x.reshape(-1, c))
    return mean, jnp.maximum(meansq - jnp.square(mean), 0.0)


def batch_stats_packed(xp: jnp.ndarray, use_kernel: bool = True):
    """(mean, var) per ORIGINAL channel of a c-major space-to-depth packed
    tensor (..., 4C): stats over rows AND the 4 sub-position lanes."""
    c4 = xp.shape[-1]
    stats = bn_stats if use_kernel else _stats_jnp
    mean_p, meansq_p = stats(xp.reshape(-1, c4))
    mean = mean_p.reshape(c4 // 4, 4).mean(-1)
    meansq = meansq_p.reshape(c4 // 4, 4).mean(-1)
    return mean, jnp.maximum(meansq - jnp.square(mean), 0.0)
