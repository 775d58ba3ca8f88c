"""Device-side point-cloud ground truth: warped mask -> 300 surface points,
entirely on the accelerator.

The reference regenerates vertex clouds from augmented masks on the host,
per sample, per step (mcubes + Python FPS, ``data_generator_mmwhs.py:
256-264``) — SURVEY.md §3.2 calls it a severe bottleneck, and it is the one
path that forced this framework's MM-WHS aug+D4 configuration onto host
augmentation. This module removes that constraint: the same cloud contract
as ``data/pointcloud.py`` computed with jittable ops, so augmentation AND
cloud regeneration fuse into the device preprocess.

Geometry of the reference's clouds (binary mask stacked x3 into a slab,
surface voxels, int-cast coords): the slab's z=0 and z=2 faces are entirely
surface (every foreground voxel), and the middle slice contributes its
4-connected 2-D boundary. Farthest-point sampling is the same greedy
algorithm as ``graipher`` (``npy2point.py:11-18``) expressed as a
``lax.fori_loop`` of masked argmax/min updates over the pixel grid.

Empty/small masks (< min_mask_sum foreground pixels) yield a zero cloud
(``npy2point.py:113-116``) via a mask rather than control flow, keeping the
whole thing one traced program.

Measured on a v5e chip: the full MM-WHS preprocess (augmentation of both
streams + 32 cloud regenerations, bs16, 256²) takes ~118 ms per call with
the Pallas FPS kernel (ops/fps_pallas.py, selected by impl='auto' on TPU)
and the single-gather-per-tap warp — vs ~42 ms/cloud for the native host
FPS on this box's single CPU core, with zero host CPU consumed and full
overlap with the train step via async dispatch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NUM_POINTS = 300
NEG = -1e30


def _interior4(mask: jnp.ndarray) -> jnp.ndarray:
    """4-connected interior of a binary (H, W) mask."""
    m = mask
    up = jnp.pad(m, ((1, 0), (0, 0)))[:-1]
    down = jnp.pad(m, ((0, 1), (0, 0)))[1:]
    left = jnp.pad(m, ((0, 0), (1, 0)))[:, :-1]
    right = jnp.pad(m, ((0, 0), (0, 1)))[:, 1:]
    return m & up & down & left & right


def _fps_grid(candidate: jnp.ndarray, coords: jnp.ndarray, k: int, seed: jnp.ndarray):
    """Greedy FPS over a fixed candidate grid.

    ``candidate``: (P,) bool; ``coords``: (P, 3) float. Returns (k, 3).
    Invalid points carry -inf running distance so argmax never picks them;
    the first point is pseudo-random among candidates (hash-seeded),
    mirroring the reference's random start.
    """
    p = coords.shape[0]
    valid = candidate.astype(jnp.float32)
    # random-ish start: maximize a hashed score over candidates
    score = jax.random.uniform(seed, (p,)) + valid * 2.0
    start = jnp.argmax(score)

    def dist_to(idx):
        diff = coords - coords[idx]
        return jnp.sum(diff * diff, axis=-1)

    d0 = jnp.where(candidate, dist_to(start), NEG)
    out0 = jnp.zeros((k, 3), jnp.float32).at[0].set(coords[start])

    def body(i, carry):
        d, out = carry
        idx = jnp.argmax(d)
        pt = coords[idx]
        out = out.at[i].set(pt)
        diff = coords - pt
        nd = jnp.sum(diff * diff, axis=-1)
        d = jnp.where(candidate, jnp.minimum(d, nd), NEG)
        return d, out

    _, out = jax.lax.fori_loop(1, k, body, (d0, out0))
    return out


@partial(jax.jit, static_argnames=("number_points", "min_mask_sum", "impl"))
def masks_to_point_clouds(
    masks: jnp.ndarray,
    rng: jnp.ndarray,
    number_points: int = NUM_POINTS,
    min_mask_sum: int = 50,
    impl: str = "auto",
) -> jnp.ndarray:
    """(B, H, W) integer masks -> (B, number_points, 3) float clouds with
    (z, y, x) voxel coords over the x3 slab — the contract of
    ``data.pointcloud.mask_to_point_cloud``, device-side and batched.

    ``impl='pallas'`` runs the selection loop as a single Pallas kernel with
    the distance array resident in VMEM (ops/fps_pallas.py) — same greedy
    sequence (verified exactly in interpret mode), one launch per batch
    element instead of ~300 XLA dispatches. Measured on a v5e: 18.9 ms vs
    43.4 ms per 16 clouds at 256². ``auto`` = pallas on TPU (when 3*H*W is
    lane-aligned), xla elsewhere.
    """
    masks = masks > 0
    b, h, w = masks.shape
    if impl == "auto":
        impl = (
            "pallas"
            if jax.default_backend() == "tpu" and (3 * h * w) % 128 == 0
            else "xla"
        )
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    zs = jnp.concatenate([jnp.zeros_like(yy), jnp.ones_like(yy), jnp.full_like(yy, 2.0)])
    coords = jnp.stack([zs, jnp.concatenate([yy] * 3), jnp.concatenate([xx] * 3)], axis=-1)

    def candidates(mask):
        flat = mask.reshape(-1)
        boundary_mid = (mask & ~_interior4(mask)).reshape(-1)
        # candidates: z=0 face (all fg), z=1 boundary ring, z=2 face (all fg)
        return jnp.concatenate([flat, boundary_mid, flat])

    keys = jax.random.split(rng, b)
    nonempty = jnp.sum(masks.reshape(b, -1), axis=1) > min_mask_sum

    if impl == "pallas":
        from pointcloududa_tpu.ops.fps_pallas import fps_pallas

        cand = jax.vmap(candidates)(masks)  # (B, P)
        score = jax.vmap(lambda k, c: jax.random.uniform(k, c.shape) + c * 2.0)(
            keys, cand.astype(jnp.float32)
        )
        starts = jnp.argmax(score, axis=1).astype(jnp.int32)
        clouds = fps_pallas(
            cand, jnp.broadcast_to(coords, (b,) + coords.shape), starts, number_points
        )
        return jnp.where(nonempty[:, None, None], clouds, 0.0)

    def one(mask, key):
        cloud = _fps_grid(candidates(mask), coords, number_points, key)
        return cloud

    clouds = jax.vmap(one)(masks, keys)
    return jnp.where(nonempty[:, None, None], clouds, 0.0)
