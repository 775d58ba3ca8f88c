"""Throughput benchmark: full triple-adversary UDA train step.

Measures the BASELINE.json north-star metric — UDA train slices/sec/chip
with the segmentor + all three discriminators (D1 output-space, D2
entropy-map, D4 PointNet) at the reference's default schedule shapes
(batch 16, 224x224x3, 4 classes, 300-point clouds).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` divides by an ESTIMATE of the reference's PyTorch-1.4
single-GPU throughput (the repo publishes no throughput numbers —
SURVEY.md §6): ~25 slices/sec, i.e. ~0.64 s per 16-slice iteration for two
U-Net forward+backward passes, six discriminator forwards, three backwards,
and Chamfer, with `torch.autograd.set_detect_anomaly(True)` left on
(reference ``train_mscmrseg.py:703``). Refine when a measured baseline
exists.

Env knobs: BENCH_DTYPE=bfloat16|float32 (default bfloat16),
BENCH_BS (default 16), BENCH_STEPS (default 16), BENCH_E2E=1 to chain the
jitted device preprocess (augmentation of both domains + one-hot) into the
timed step — the honest per-step device total a real epoch pays.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compilation cache: caches locally-compiled programs across
# processes (measured 12.2 s -> 0.26 s on a toy program). NOTE: on this
# machine's relayed backend the BIG train-step executable is compiled
# server-side and bypasses this cache — a full bench run costs ~5-6 min
# either way; the cache still saves the smaller host-side programs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


REF_GPU_SLICES_PER_SEC_ESTIMATE = 25.0


def main():
    import jax

    from pointcloududa_tpu.config import mmwhs_default, mscmrseg_default
    from pointcloududa_tpu.data.synthetic import synthetic_batch
    from pointcloududa_tpu.train.state import build_models, build_optimizers, create_train_state
    from pointcloududa_tpu.train.step import make_train_step

    def _int_env(name, default):
        raw = os.environ.get(name, "") or default
        try:
            return int(raw)
        except ValueError:
            raise SystemExit(f"{name} must be an integer, got {raw!r}")

    bs = _int_env("BENCH_BS", "16")
    n_steps = _int_env("BENCH_STEPS", "24")
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    chamfer = os.environ.get("BENCH_CHAMFER", "auto")
    # BENCH_PACKED selects one measured configuration (the modes are
    # mutually exclusive on purpose — each row of the docs/PACKED.md table):
    # 0 = standard, 1 = level-0 packed, 2 = levels 0+1 packed (l0+l1 was
    # measured SLOWER than l0 alone, so no l1+compute combination is
    # offered), 3 = level-0 + packed_compute (the production default).
    packed = _int_env("BENCH_PACKED", "3")
    if packed not in (0, 1, 2, 3):
        raise SystemExit(f"BENCH_PACKED must be 0..3, got {packed}")
    bn_impl = os.environ.get("BENCH_BN", "auto")  # auto | pallas | xla
    # BENCH_WORKLOAD=mmwhs benches BASELINE config 5 (train_mmwhs.py full
    # pipeline: 256^2 5-class softmax-CE, D2+D4, entropy/log C)
    workload = os.environ.get("BENCH_WORKLOAD", "mscmrseg")

    kw = dict(
        bs=bs, compute_dtype=dtype, chamfer_impl=chamfer,
        packed_level0=packed >= 1, packed_level1=packed == 2,
        packed_compute=packed == 3, bn_stats_impl=bn_impl,
    )
    # BENCH_AUG overrides the workload's augmentation config — only
    # meaningful with BENCH_E2E=1 (the step-only bench never augments):
    # heavy (mscmrseg default) | aug2 | light | none
    aug = os.environ.get("BENCH_AUG", "")
    if aug:
        kw["aug"] = "" if aug == "none" else aug
    # BENCH_VERT_T=0 drops the logged-only target chamfer diagnostic (and,
    # on the MM-WHS e2e regen path, the per-step target cloud regen)
    if os.environ.get("BENCH_VERT_T", "1") == "0":
        kw["vert_t_metric"] = False
    if workload == "mmwhs":
        cfg = mmwhs_default(softmax=True, d2=True, d4=True, **kw)
        shape_tag = f"seg+D2+D4, bs{bs}, 256^2"
    else:
        cfg = mscmrseg_default(d1=True, d2=True, d4=True, **kw)
        shape_tag = f"seg+D1+D2+D4, bs{bs}, 224^2"
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))

    # BENCH_E2E=1 measures the honest per-step DEVICE total a real training
    # epoch pays: the jitted preprocess (device augmentation of BOTH domains
    # + normalise + one-hot, train/loop.py make_device_preprocess) chained
    # into the train step. Device compute serializes on one chip, so the
    # step-only headline excludes the augment cost a real epoch pays; this
    # mode includes it (the reference likewise pays imgaug synchronously
    # per batch on the host, data_generator_mscmrseg.py:305-310).
    e2e = os.environ.get("BENCH_E2E", "0") == "1"
    if e2e:
        from pointcloududa_tpu.data.synthetic import synthetic_raw_batch
        from pointcloududa_tpu.train.loop import make_device_preprocess

        pre = make_device_preprocess(cfg, train=True, device_augment=True)
        raws = [jax.device_put(synthetic_raw_batch(cfg, bs, seed=s)) for s in range(4)]
        # 16 distinct keys so the sampled per-batch op orders / SomeOf picks
        # vary across chained steps like a real epoch's do
        keys = [jax.device_put(jax.random.PRNGKey(1000 + i)) for i in range(16)]

        def one(state, i):
            return step(state, pre(keys[i % len(keys)], raws[i % len(raws)]))
    else:
        batches = [synthetic_batch(cfg, bs, seed=s) for s in range(4)]
        batches = [jax.device_put(b) for b in batches]

        def one(state, i):
            return step(state, batches[i % len(batches)])

    # warmup: compile + steady steps. NOTE: completion is forced by fetching
    # a scalar that depends on the whole step — on this machine's relayed
    # TPU backend, block_until_ready returns before remote execution
    # finishes and silently inflates throughput ~30x (measured).
    for i in range(3):
        state, metrics = one(state, i)
    float(metrics["seg_loss"])

    def chain(n):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n):
            state, metrics = one(state, i)
        float(metrics["seg_loss"])  # hard sync (tiny transfer)
        return time.perf_counter() - t0

    # two-point measurement subtracts the constant dispatch+fetch overhead.
    # BENCH_REPEATS>1 repeats the whole two-point measurement and reports
    # the median plus mean±std (r3 VERDICT asked for explicit noise bounds
    # on the relayed backend; see BASELINE.md "measurement noise").
    repeats = _int_env("BENCH_REPEATS", "1")
    n_small = max(2, n_steps // 4)
    samples = []
    for _ in range(max(1, repeats)):
        t_small = min(chain(n_small) for _ in range(2))
        t_big = min(chain(n_steps) for _ in range(2))
        per_step = (t_big - t_small) / (n_steps - n_small)
        samples.append(bs / per_step)
    samples.sort()
    slices_per_sec = samples[len(samples) // 2] if repeats > 1 else samples[0]
    n_chips = jax.device_count()
    extra = {}
    if repeats > 1:
        mean = sum(samples) / len(samples)
        std = (sum((s - mean) ** 2 for s in samples) / (len(samples) - 1)) ** 0.5
        extra = {
            "repeats": repeats,
            "mean": round(mean / n_chips, 2),
            "std": round(std / n_chips, 2),
            "samples": [round(s / n_chips, 2) for s in samples],
        }
    print(
        json.dumps(
            {
                "metric": (
                    f"UDA train{' e2e incl. device-aug(' + (cfg.aug or 'none') + ')' if e2e else ''}"
                    f"{'' if cfg.vert_t_metric else ' no-vert-t-metric'}"
                    f" slices/sec/chip ({shape_tag}, {dtype})"
                ),
                "value": round(slices_per_sec / n_chips, 2),
                "unit": "slices/sec/chip",
                **extra,
                "vs_baseline": round(slices_per_sec / n_chips / REF_GPU_SLICES_PER_SEC_ESTIMATE, 3),
                "vs_baseline_basis": (
                    "ESTIMATED denominator: 25 slices/s for the as-published "
                    "reference (unmeasured; it publishes no throughput). "
                    "Derivation in BASELINE.md: fp32-V100 FLOP ceiling 79 "
                    "slices/s, realistic 28-43, detect_anomaly-on 5-25."
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
