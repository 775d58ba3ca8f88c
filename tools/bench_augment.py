"""Device-augmentation latency bench (real TPU or CPU backend).

Times the jitted device augmentation twin (``ops/augment.make_augment_fn``)
on a reference-shaped batch — by default heavy (the MS-CMRSeg training
pipeline, ``data_generator_mscmrseg.py:20-84``) at bs16 224x224x3 + masks —
using the same hard-sync two-point chain pattern as bench.py (on the
relayed TPU backend ``block_until_ready`` returns early; a dependent
scalar fetch forces completion).

Context: augmentation runs OUTSIDE the train step (train/loop.py applies
it per batch before the step), so its latency is potential overhead on
top of the ~47.6 ms packed bs16 step. This tool quantifies it per config.

Usage: python -u tools/bench_augment.py [--cfg heavy|medium|light]
       [--bs 16] [--size 224] [--steps 24]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="heavy", choices=["heavy", "medium", "light"])
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--steps", type=int, default=24)
    args = ap.parse_args()
    if args.steps <= max(2, args.steps // 4):
        ap.error(f"--steps must exceed the small-chain length ({max(2, args.steps // 4)})")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointcloududa_tpu.ops import augment

    cfg = getattr(augment, args.cfg)()
    fn = augment.make_augment_fn(cfg)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.uniform(0, 255, (args.bs, args.size, args.size, 3)).astype(np.float32))
    )
    masks = jax.device_put(
        jnp.asarray(rng.integers(0, 4, (args.bs, args.size, args.size)).astype(np.int32))
    )

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    out_i, out_m = fn(key, imgs, masks)
    float(out_i[0, 0, 0, 0])
    compile_s = time.perf_counter() - t0

    def chain(n):
        x = imgs
        k = key
        t0 = time.perf_counter()
        for i in range(n):
            k = jax.random.fold_in(k, i)
            x, m = fn(k, x, masks)  # feed images back: true serial chain
        float(x[0, 0, 0, 0])  # hard sync
        return time.perf_counter() - t0

    chain(2)  # steady-state warmup
    n_small = max(2, args.steps // 4)
    t_small = min(chain(n_small) for _ in range(2))
    t_big = min(chain(args.steps) for _ in range(2))
    per_batch_ms = (t_big - t_small) / (args.steps - n_small) * 1e3
    print(
        f"{args.cfg} device augment bs{args.bs} {args.size}^2: "
        f"{per_batch_ms:.2f} ms/batch ({args.bs / per_batch_ms * 1e3:.1f} slices/s), "
        f"first-call (compile+run) {compile_s:.1f} s, backend={jax.default_backend()}"
    )


if __name__ == "__main__":
    main()
