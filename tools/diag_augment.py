"""Per-component latency breakdown of the device augmentation twin.

Times each of the twelve intensity SomeOf entries (ungated, batched), the
three blur-family sub-ops, the exact-order intensity block, and warp/
perlin probes — all in ONE process on the default (TPU) backend, using
the same hard-sync two-point chain pattern as bench.py (the relayed
backend's ``block_until_ready`` returns early; a dependent scalar fetch
forces completion).

Context: tools/bench_augment.py measured the full heavy pipeline at
218.6 ms/batch bs16 224^2 on the real chip (vs the 47.6 ms train step) —
this tool ranks where those milliseconds go so the fix is measured, not
guessed.

Usage: python -u tools/diag_augment.py [--bs 16] [--size 224] [--steps 8]
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

ENTRY_NAMES = [
    "superpixels",
    "blur_family",
    "sharpen",
    "emboss",
    "simplex_edge",
    "noise",
    "dropout_family",
    "invert",
    "add",
    "hue_sat",
    "multiply",
    "grayscale",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointcloududa_tpu.ops import augment

    cfg = augment.heavy()
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.uniform(0, 255, (args.bs, args.size, args.size, 3)).astype(np.float32))
    )
    masks = jax.device_put(
        jnp.asarray(rng.integers(0, 4, (args.bs, args.size, args.size)).astype(np.int32))
    )
    key = jax.random.PRNGKey(0)

    def chain_time(fn, n):
        """Serial n-chain of fn(key_i, imgs) feeding images back; hard sync."""
        x = imgs
        k = key
        t0 = time.perf_counter()
        for i in range(n):
            k = jax.random.fold_in(k, i)
            x = fn(k, x)
        float(x.ravel()[0])
        return time.perf_counter() - t0

    def measure(name, fn):
        t0 = time.perf_counter()
        float(fn(key, imgs).ravel()[0])  # compile + first run
        comp = time.perf_counter() - t0
        chain_time(fn, 2)  # steady-state warmup
        n_small = max(2, args.steps // 4)
        t_small = min(chain_time(fn, n_small) for _ in range(2))
        t_big = min(chain_time(fn, args.steps) for _ in range(2))
        ms = (t_big - t_small) / (args.steps - n_small) * 1e3
        print(f"{name:>22}: {ms:8.2f} ms/batch   (compile {comp:.1f} s)", flush=True)
        return ms

    c = imgs.shape[-1]

    # --- per-entry probes (ungated: the op runs on every sample, which is
    # exactly what the traced jnp.where(act, op(im), im) pays) ---
    def make_entry(i):
        @jax.jit
        def f(k, ims):
            keys = jax.random.split(k, ims.shape[0])

            def per_sample(kk, im):
                ks = jax.random.split(jax.random.fold_in(kk, 7), 40)
                return augment._entry_fns(ks, cfg, c)[i](im)

            return jnp.clip(jax.vmap(per_sample)(keys, ims), 0.0, 255.0)

        return f

    # --- blur sub-ops ---
    def make_blur(which):
        @jax.jit
        def f(k, ims):
            keys = jax.random.split(k, ims.shape[0])

            def per_sample(kk, im):
                ks = jax.random.split(kk, 4)
                if which == "gaussian":
                    return augment._gaussian_blur(im, augment._u(ks[0], cfg.blur_sigma))
                if which == "avg":
                    kk2 = jax.random.randint(ks[1], (), cfg.avg_blur_k[0], cfg.avg_blur_k[1] + 1)
                    return augment._avg_blur(im, kk2)
                kk3 = 2 * jax.random.randint(
                    ks[2], (), cfg.median_blur_k[0] // 2, cfg.median_blur_k[1] // 2 + 1
                ) + 1
                return augment._median_blur(im, kk3)

            return jnp.clip(jax.vmap(per_sample)(keys, ims), 0.0, 255.0)

        return f

    # --- the exact-order intensity block as the pipeline runs it ---
    @jax.jit
    def int_block(k, ims):
        k_perm, kb = jax.random.split(k)
        keys = jax.random.split(kb, ims.shape[0])
        active = jax.vmap(lambda kk: augment.someof_active(jax.random.split(kk, 12)[10], cfg))(keys)
        perm12 = jax.random.permutation(k_perm, 12)
        return augment._apply_someof_exact(keys, ims, active, perm12, cfg)

    # --- geometry probes ---
    @jax.jit
    def warp_affine(k, ims):
        keys = jax.random.split(k, ims.shape[0])

        def per_sample(kk, im):
            h, w = im.shape[:2]
            ks = jax.random.split(kk, 4)
            mats, any_warp, snap = augment._child_matrices(ks[0], cfg, h, w)
            M = mats[0] @ mats[1] @ mats[2] @ mats[3]
            disp = jnp.zeros((h, w, 2), jnp.float32)
            return augment._warp_one(im, M, disp, order=1, cval=0.0, snap=snap)

        return jax.vmap(per_sample)(keys, ims)

    # NOTE: this probe times the STANDALONE order-0 single-channel warp,
    # which production no longer pays — geo_one fuses the mask into the
    # image's patch-gather as the ``nn`` plane (augment.py geo_one); the
    # 1-channel patch-construction overhead dominates this probe.
    @jax.jit
    def warp_mask_probe(k, ims):
        keys = jax.random.split(k, ims.shape[0])

        def per_sample(kk, im, mk):
            h, w = im.shape[:2]
            ks = jax.random.split(kk, 4)
            mats, any_warp, snap = augment._child_matrices(ks[0], cfg, h, w)
            M = mats[0] @ mats[1] @ mats[2] @ mats[3]
            disp = jnp.zeros((h, w, 2), jnp.float32)
            m = augment._warp_one(mk[..., None].astype(jnp.float32), M, disp, order=0, cval=0.0)
            return im + 0.0 * m  # keep the image chainable, force the mask warp

        return jax.vmap(per_sample)(keys, ims, masks)

    @jax.jit
    def perlin_probe(k, ims):
        keys = jax.random.split(k, ims.shape[0])

        def per_sample(kk, im):
            m = augment._perlin_mask(kk, im.shape[0], im.shape[1])
            return im + 0.0 * m[..., None]

        return jax.vmap(per_sample)(keys, ims)

    print(f"backend={jax.default_backend()} bs{args.bs} {args.size}^2", flush=True)
    results = {}
    results["int_block(exact order)"] = measure("int_block(exact order)", int_block)
    for i, name in enumerate(ENTRY_NAMES):
        results[name] = measure(name, make_entry(i))
    for which in ("gaussian", "avg", "median"):
        results[f"blur/{which}"] = measure(f"blur/{which}", make_blur(which))
    results["warp(img,order1)"] = measure("warp(img,order1)", warp_affine)
    results["warp(mask,order0)"] = measure("warp(mask,order0)", warp_mask_probe)
    results["perlin_mask"] = measure("perlin_mask", perlin_probe)

    entry_sum = sum(results[n] for n in ENTRY_NAMES)
    print(f"\nsum of 12 entries: {entry_sum:.2f} ms; measured int block: "
          f"{results['int_block(exact order)']:.2f} ms "
          f"(delta = scan/switch/gate overhead)", flush=True)


if __name__ == "__main__":
    main()
