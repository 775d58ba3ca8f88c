"""Inference (eval-forward) throughput of the generator.

The evaluation CLIs batch slices through ``eval/volume.py``'s padded
forward; this tool measures the underlying jitted ``train=False`` forward
(logits + point cloud) — the number that bounds evaluate/serving speed.

Usage (real TPU, default env):
    python tools/bench_infer.py [--bs 32] [--packed/--no-packed]

Same measurement discipline as bench.py: hard sync through a dependent
scalar, two-point chain timing (the relayed backend's block_until_ready
returns early).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--filters", type=int, default=32)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--packed", action=argparse.BooleanOptionalAction, default=True)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointcloududa_tpu.models import SegmentationPointModel

    model = SegmentationPointModel(
        filters=args.filters, n_block=4, n_class=4, pointnet=True,
        fc_inch=81 if args.size == 224 else 1,
        packed_level0=args.packed,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    x = jnp.zeros((args.bs, args.size, args.size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    @jax.jit
    def fwd(v, x):
        logits, _, points = model.apply(v, x, train=False)
        return logits, points

    batches = [jnp.asarray(np.random.rand(*x.shape).astype(np.float32)) for _ in range(4)]
    out = None
    for b in batches[:2]:
        out = fwd(variables, b)
    float(out[0][0, 0, 0, 0])

    def chain(n):
        t0 = time.perf_counter()
        o = None
        for i in range(n):
            o = fwd(variables, batches[i % 4])
        float(o[0][0, 0, 0, 0])
        return time.perf_counter() - t0

    if args.steps < 4:
        p.error("--steps must be >= 4 (two-point timing needs steps > steps//4)")
    n_small = max(2, args.steps // 4)
    t_small = min(chain(n_small) for _ in range(2))
    t_big = min(chain(args.steps) for _ in range(2))
    per = (t_big - t_small) / (args.steps - n_small)
    print(
        f"inference fwd bs{args.bs} {args.size}^2 {args.dtype} packed={args.packed}: "
        f"{per * 1e3:.2f} ms/batch = {args.bs / per:.1f} slices/s/chip"
    )


if __name__ == "__main__":
    main()
