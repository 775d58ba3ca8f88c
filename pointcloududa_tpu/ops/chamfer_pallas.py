"""Pallas TPU kernel for the symmetric Chamfer loss, with custom VJP.

Semantics match ``ops.losses.chamfer_loss`` (reference ``batch_NN_loss``,
``src/utils/loss.py:40-76``) bit-for-fp-bit, computed smarter:

- the (N, N) pairwise matrix is built once per batch element entirely in
  VMEM (N=300 -> 360 KB f32, far under the ~16 MB budget) with the cross
  term on the MXU, and is never written to HBM;
- sqrt is applied only to the 2N row/column minima, not the N^2 matrix
  (min(sqrt(p + eps)) == sqrt(min(p) + eps) by monotonicity);
- the backward pass needs only the argmin indices: d|x_i - y_a(i)| / dx_i =
  (x_i - y_a(i)) / d_i, so the VJP gathers the nearest-neighbour pairs and
  scatter-adds via a one-hot matmul (MXU) — no N^2 recomputation.

``chamfer_loss_pallas`` is a drop-in replacement for the jnp version. Two
kernel shapes, selected by cloud size:

- **small clouds** (the reference's N=300: matrix << VMEM): one program per
  batch element, whole (N, M) matrix resident;
- **large clouds** (anything whose (N, M) f32 matrix would spill): a tiled
  grid (B, N/TN, M/TM) that streams y-tiles through VMEM and accumulates
  running row minima + argmins in revisited output blocks — the pairwise
  matrix never exists anywhere, so N, M are bounded only by HBM for the
  point sets themselves. The backward likewise switches from the one-hot
  MXU scatter to ``segment_sum`` when the dense (B, N, M) one-hot would be
  larger than the matrix we just avoided.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5  # reference loss.py:68


def _chamfer_fwd_kernel(x_ref, y_ref, loss_ref, idx1_ref, idx2_ref):
    # all intermediates stay 2-D (keepdims) — Mosaic's vector layouts want
    # (sublane, lane) shapes, and 1-D (N,) values hit relayout limitations
    x = x_ref[0]  # (N, D)
    y = y_ref[0]  # (M, D)
    xx = jnp.sum(x * x, axis=-1, keepdims=True)  # (N, 1)
    yy = jnp.sum(y * y, axis=-1, keepdims=True)  # (M, 1)
    zz = jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N, M)
    p = jnp.maximum(xx + yy.reshape(1, -1) - 2.0 * zz, 0.0)
    # sqrt only on the minima (monotone): matches sqrt(p + eps) row/col mins
    min1 = jnp.sqrt(jnp.min(p, axis=1, keepdims=True) + EPS)  # (N, 1)
    min2 = jnp.sqrt(jnp.min(p, axis=0, keepdims=True) + EPS)  # (1, M)
    idx1_ref[0] = jnp.argmin(p, axis=1, keepdims=True).astype(jnp.int32)  # (N, 1)
    idx2_ref[0] = jnp.argmin(p, axis=0, keepdims=True).astype(jnp.int32)  # (1, M)
    # vector store (scalar stores to VMEM are not lowerable on TPU)
    loss_ref[0, 0, :] = jnp.stack([jnp.mean(min1), jnp.mean(min2)])


def _chamfer_fwd(x: jnp.ndarray, y: jnp.ndarray):
    b, n, d = x.shape
    m = y.shape[1]
    loss_parts, idx1, idx2 = pl.pallas_call(
        _chamfer_fwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        # outputs carry a unit middle axis so each program's block equals the
        # array's last-two dims (Mosaic's (8,128)-divisibility rule)
        out_specs=[
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, 2), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * d + 4 * b * n * m,
            bytes_accessed=4 * b * (n + m) * (d + 2),
            transcendentals=b * (n + m),
        ),
    )(x.astype(jnp.float32), y.astype(jnp.float32))
    return loss_parts[:, 0], idx1[:, :, 0], idx2[:, 0, :]


# ---- tiled path for large clouds ------------------------------------- #
_TILE = 512  # rows/cols per program (f32 tile matrix: 512x512 = 1 MB VMEM)
_SMALL_LIMIT = 512 * 512  # n*m above this -> tiled kernels

_PAD_COORD = 1.0e6  # pad rows sit ~1e12 away squared: never an argmin


def _nn_tiled_kernel(x_ref, y_ref, min_ref, idx_ref):
    """Running row-minimum over column tiles (innermost grid dim)."""
    j = pl.program_id(2)
    x = x_ref[0]  # (TN, D)
    y = y_ref[0]  # (TM, D)
    xx = jnp.sum(x * x, axis=-1, keepdims=True)
    yy = jnp.sum(y * y, axis=-1, keepdims=True)
    zz = jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.maximum(xx + yy.reshape(1, -1) - 2.0 * zz, 0.0)
    lm = jnp.min(p, axis=1, keepdims=True)  # (TN, 1)
    la = (jnp.argmin(p, axis=1, keepdims=True) + j * y.shape[0]).astype(jnp.int32)

    @pl.when(j == 0)
    def _init():
        min_ref[0] = lm
        idx_ref[0] = la

    @pl.when(j > 0)
    def _update():
        prev = min_ref[0]
        better = lm < prev
        idx_ref[0] = jnp.where(better, la, idx_ref[0])
        min_ref[0] = jnp.where(better, lm, prev)


def _pad_rows(a, mult):
    n = a.shape[1]
    pad = (-n) % mult
    if pad == 0:
        return a
    return jnp.pad(a, ((0, 0), (0, pad), (0, 0)), constant_values=_PAD_COORD)


def _nn_directional_tiled(x, y, tile=_TILE):
    """Per-row nearest-neighbour (squared dist, index) of x into y."""
    b, n, d = x.shape
    tn = min(tile, -(-n // 8) * 8)
    tm = min(tile, -(-y.shape[1] // 8) * 8)
    xp = _pad_rows(x.astype(jnp.float32), tn)
    yp = _pad_rows(y.astype(jnp.float32), tm)
    np_, mp_ = xp.shape[1], yp.shape[1]
    mins, idxs = pl.pallas_call(
        _nn_tiled_kernel,
        grid=(b, np_ // tn, mp_ // tm),
        in_specs=[
            pl.BlockSpec((1, tn, d), lambda b_, i, j: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, d), lambda b_, i, j: (b_, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, 1), lambda b_, i, j: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda b_, i, j: (b_, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, np_, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * np_ * mp_ * d + 4 * b * np_ * mp_,
            bytes_accessed=4 * b * (np_ + mp_) * d * (mp_ // tm),
            transcendentals=0,
        ),
    )(xp, yp)
    return mins[:, :n, 0], idxs[:, :n, 0]


def _chamfer_fwd_any(x, y):
    """Size-dispatched forward: (loss, idx1, idx2)."""
    b, n, _ = x.shape
    m = y.shape[1]
    if n * m <= _SMALL_LIMIT:
        loss_parts, idx1, idx2 = _chamfer_fwd(x, y)
        return jnp.mean(loss_parts[:, 0]) + jnp.mean(loss_parts[:, 1]), idx1, idx2
    p1, idx1 = _nn_directional_tiled(x, y)
    p2, idx2 = _nn_directional_tiled(y, x)
    loss = jnp.mean(jnp.sqrt(p1 + EPS)) + jnp.mean(jnp.sqrt(p2 + EPS))
    return loss, idx1, idx2


@jax.custom_vjp
def chamfer_loss_pallas(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    loss, _, _ = _chamfer_fwd_any(x, y)
    return loss


def _vjp_fwd(x, y):
    loss, idx1, idx2 = _chamfer_fwd_any(x, y)
    return loss, (x.astype(jnp.float32), y.astype(jnp.float32), idx1, idx2)


def _vjp_bwd(res, g):
    x, y, idx1, idx2 = res
    b, n, _ = x.shape
    m = y.shape[1]
    # direction 1: each x_i pairs with y_{idx1[i]}
    y1 = jnp.take_along_axis(y, idx1[..., None], axis=1)  # (B, N, D)
    diff1 = x - y1
    d1 = jnp.sqrt(jnp.sum(diff1 * diff1, axis=-1) + EPS)  # (B, N)
    u1 = diff1 / d1[..., None]  # unit-ish vectors
    # direction 2: each y_j pairs with x_{idx2[j]}
    x2 = jnp.take_along_axis(x, idx2[..., None], axis=1)  # (B, M, D)
    diff2 = y - x2
    d2 = jnp.sqrt(jnp.sum(diff2 * diff2, axis=-1) + EPS)
    u2 = diff2 / d2[..., None]

    gn = g / (b * n)
    gm = g / (b * m)
    if n * m <= _SMALL_LIMIT:
        # scatter-adds as one-hot matmuls (MXU): oh1[b, i, j] = [idx1[b,i] == j]
        oh1 = jax.nn.one_hot(idx1, m, dtype=jnp.float32)  # (B, N, M)
        oh2 = jax.nn.one_hot(idx2, n, dtype=jnp.float32)  # (B, M, N)
        scat2 = jnp.einsum("bmn,bmd->bnd", oh2, u2, preferred_element_type=jnp.float32)
        scat1 = jnp.einsum("bnm,bnd->bmd", oh1, u1, preferred_element_type=jnp.float32)
    else:
        # large clouds: the dense one-hot would be bigger than the matrix
        # the forward avoided — scatter-add instead
        scat2 = jax.vmap(lambda uu, ii: jax.ops.segment_sum(uu, ii, num_segments=n))(u2, idx2)
        scat1 = jax.vmap(lambda uu, ii: jax.ops.segment_sum(uu, ii, num_segments=m))(u1, idx1)
    dx = gn * u1 - gm * scat2
    dy = gm * u2 - gn * scat1
    return dx, dy


chamfer_loss_pallas.defvjp(_vjp_fwd, _vjp_bwd)
