"""Pallas TPU kernel for greedy farthest-point sampling over a pixel grid.

The jnp FPS in ``ops/pointcloud_device.py`` lowers to ~300 sequential XLA
dispatches (one argmax + one min-update per selected point); measured on a
v5e it costs ~17 ms per cloud, dominated by inter-kernel latency rather
than FLOPs. This kernel keeps the running min-distance array and the
candidate coordinates resident in VMEM across the whole selection loop —
one kernel launch per batch element, zero HBM round-trips inside the loop.

Layout: the P candidate points are stored as three (R, 128) planes
(z, y, x) plus a validity plane, with P = R*128 (the caller pads). All
loop state is 2-D (Mosaic's vector layouts; see chamfer_pallas.py for the
same constraints).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
LANES = 128


def _fps_kernel(starts_ref, valid_ref, cz_ref, cy_ref, cx_ref, out_ref, dist_ref):
    r = valid_ref.shape[1]
    valid = valid_ref[0]  # (R, 128) f32 {0,1}
    cz, cy, cx = cz_ref[0], cy_ref[0], cx_ref[0]

    start = starts_ref[pl.program_id(0)]
    row0, col0 = start // LANES, start % LANES

    row_ids = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)

    def point_at(row, col):
        # dynamic gather expressed as a masked reduction (dynamic_slice on
        # values is not lowerable in Mosaic; reductions vectorise cleanly)
        sel = (row_ids == row) & (col_ids == col)

        def g(plane):
            return jnp.sum(jnp.where(sel, plane, 0.0))

        return g(cz), g(cy), g(cx)

    pz, py, px = point_at(row0, col0)
    out_ref[0, 0, :] = jnp.stack([pz, py, px])
    d = (cz - pz) ** 2 + (cy - py) ** 2 + (cx - px) ** 2
    dist_ref[:] = jnp.where(valid > 0.5, d, NEG)

    k = out_ref.shape[1]

    def body(i, _):
        dist = dist_ref[:]
        idx = jnp.argmax(dist.reshape(1, -1), axis=1)[0]
        row, col = idx // LANES, idx % LANES
        pz, py, px = point_at(row, col)
        out_ref[0, pl.ds(i, 1), :] = jnp.stack([pz, py, px]).reshape(1, 3)
        nd = (cz - pz) ** 2 + (cy - py) ** 2 + (cx - px) ** 2
        dist_ref[:] = jnp.where(valid > 0.5, jnp.minimum(dist, nd), NEG)
        return 0

    jax.lax.fori_loop(1, k, body, 0)


@partial(jax.jit, static_argnames=("k",))
def fps_pallas(valid: jnp.ndarray, coords: jnp.ndarray, starts: jnp.ndarray, k: int):
    """Batched FPS. ``valid``: (B, P) bool; ``coords``: (B, P, 3) f32 with
    P a multiple of 128; ``starts``: (B,) int32 start indices (must point at
    valid entries). Returns (B, k, 3)."""
    b, p = valid.shape
    assert p % LANES == 0, "pad P to a multiple of 128"
    r = p // LANES
    v = valid.astype(jnp.float32).reshape(b, r, LANES)
    cz = coords[..., 0].reshape(b, r, LANES)
    cy = coords[..., 1].reshape(b, r, LANES)
    cx = coords[..., 2].reshape(b, r, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # starts: whole (B,) array in SMEM
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r, LANES), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, LANES), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, LANES), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, LANES), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((r, LANES), jnp.float32)],
    )
    out = pl.pallas_call(
        _fps_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, k, 3), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * k * p, bytes_accessed=4 * b * p * 4, transcendentals=0
        ),
    )(starts.astype(jnp.int32), v, cz, cy, cx)
    return out
