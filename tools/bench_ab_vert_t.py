"""Same-session A/B: MM-WHS e2e (device-aug light) with and without the
logged-only target chamfer diagnostic (cfg.vert_t_metric — the
reference's never-backpropped loss_vert_target, src/train_mmwhs.py:
257-258). Both configs are compiled and timed in ONE process so the
relay's +-4% cross-session variance cancels; two-point chain timing
exactly as bench.py.

Measured 2026-08-19 (v5e chip, 3 two-point samples/arm, spread <0.1%),
FLOAT32 by accident (the first version omitted compute_dtype and
UDAConfig defaults to f32): on 119.69, off 140.60 (+17.5%, Δ19.9 ms —
matching tools/diag_augment.py's ~21 ms target-cloud-regen cost). The
production-config (bf16) A/B lives in tools/bench_e2e_sweep.py's last
two rows; docs/SCALING.md records those numbers."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pointcloududa_tpu.config import mmwhs_default
from pointcloududa_tpu.data.synthetic import synthetic_raw_batch
from pointcloududa_tpu.train.loop import make_device_preprocess
from pointcloududa_tpu.train.state import build_models, build_optimizers, create_train_state
from pointcloududa_tpu.train.step import make_train_step

BS = 16
N_STEPS = 24


def measure(vert_t_metric: bool) -> float:
    cfg = mmwhs_default(
        softmax=True, d2=True, d4=True, bs=BS, aug="light",
        vert_t_metric=vert_t_metric,
        compute_dtype="bfloat16",  # UDAConfig defaults to f32 — must match bench.py
        packed_level0=True, packed_compute=True, bn_stats_impl="auto",
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))
    pre = make_device_preprocess(cfg, train=True, device_augment=True)
    raws = [jax.device_put(synthetic_raw_batch(cfg, BS, seed=s)) for s in range(4)]
    keys = [jax.device_put(jax.random.PRNGKey(1000 + i)) for i in range(16)]

    def one(state, i):
        return step(state, pre(keys[i % len(keys)], raws[i % len(raws)]))

    for i in range(3):
        state, metrics = one(state, i)
    float(metrics["seg_loss"])  # hard sync (relay: block_until_ready lies)

    def chain(n):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n):
            state, metrics = one(state, i)
        float(metrics["seg_loss"])
        return time.perf_counter() - t0

    n_small = max(2, N_STEPS // 4)
    samples = []
    for _ in range(3):  # 3 two-point samples per arm -> within-session spread
        t_small = min(chain(n_small) for _ in range(2))
        t_big = min(chain(N_STEPS) for _ in range(2))
        per_step = (t_big - t_small) / (N_STEPS - n_small)
        samples.append(BS / per_step)
    return samples


if __name__ == "__main__":
    on = measure(True)
    off = measure(False)
    med = lambda s: sorted(s)[len(s) // 2]
    print(f"vert_t_metric=on : {med(on):8.2f} slices/s/chip  samples={[round(s,1) for s in on]}")
    print(
        f"vert_t_metric=off: {med(off):8.2f} slices/s/chip  samples={[round(s,1) for s in off]}"
        f"  ({(med(off)/med(on)-1)*100:+.1f}%)"
    )
