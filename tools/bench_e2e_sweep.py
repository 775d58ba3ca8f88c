"""Quiet, one-process re-measurement of the e2e bench rows (README
"End-to-end" + docs/SCALING.md "End-to-end step cost").

All rows in ONE process: cross-config deltas are same-session (the relay
shows up to +-4% across sessions), and the step-only anchor row detects
session-level skew against the known quiet 343.2 +- 1.5. CAUTION learned
the hard way: UDAConfig.compute_dtype defaults to FLOAT32 — every config
here must pass compute_dtype="bfloat16" to match bench.py's rows (a first
version omitted it and silently measured f32: anchor 256.7, mmwhs-light
119.7/140.6 — numbers ~25% low across the board).

Rows: mscmrseg step-only (anchor), mscmrseg e2e none/light/heavy, mmwhs
e2e light with vert_t_metric on AND off (the A/B for the
-no_vert_t_metric knob, docs/SCALING.md "End-to-end step cost").
Two-point chain timing exactly as bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pointcloududa_tpu.config import mmwhs_default, mscmrseg_default
from pointcloududa_tpu.data.synthetic import synthetic_batch, synthetic_raw_batch
from pointcloududa_tpu.train.loop import make_device_preprocess
from pointcloududa_tpu.train.state import build_models, build_optimizers, create_train_state
from pointcloududa_tpu.train.step import make_train_step

BS = 16
N_STEPS = 24


def measure(workload: str, e2e: bool, aug: str, vert_t_metric: bool = True) -> list:
    kw = dict(
        bs=BS, aug=aug, compute_dtype="bfloat16", chamfer_impl="auto",
        packed_level0=True, packed_compute=True, bn_stats_impl="auto",
        vert_t_metric=vert_t_metric,
    )
    if workload == "mmwhs":
        cfg = mmwhs_default(softmax=True, d2=True, d4=True, **kw)
    else:
        cfg = mscmrseg_default(d1=True, d2=True, d4=True, **kw)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))
    if e2e:
        pre = make_device_preprocess(cfg, train=True, device_augment=True)
        raws = [jax.device_put(synthetic_raw_batch(cfg, BS, seed=s)) for s in range(4)]
        keys = [jax.device_put(jax.random.PRNGKey(1000 + i)) for i in range(16)]

        def one(state, i):
            return step(state, pre(keys[i % len(keys)], raws[i % len(raws)]))
    else:
        batches = [jax.device_put(synthetic_batch(cfg, BS, seed=s)) for s in range(4)]

        def one(state, i):
            return step(state, batches[i % len(batches)])

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
    for _ in range(3):
        t_small = min(chain(n_small) for _ in range(2))
        t_big = min(chain(N_STEPS) for _ in range(2))
        samples.append(BS / ((t_big - t_small) / (N_STEPS - n_small)))
    return samples


ROWS = [
    # anchor aug="heavy" = mscmrseg_default's own default, bench.py-exact
    # (unused in the step-only path but keeps the config identical)
    ("mscmrseg step-only (anchor, quiet=343.2±1.5)", "mscmrseg", False, "heavy", True),
    ("mscmrseg e2e none", "mscmrseg", True, "", True),
    ("mscmrseg e2e light", "mscmrseg", True, "light", True),
    ("mscmrseg e2e heavy", "mscmrseg", True, "heavy", True),
    ("mmwhs    e2e light (vert_t on)", "mmwhs", True, "light", True),
    ("mmwhs    e2e light (vert_t OFF)", "mmwhs", True, "light", False),
]

if __name__ == "__main__":
    for name, wl, e2e, aug, vt in ROWS:
        s = measure(wl, e2e, aug, vt)
        med = sorted(s)[1]
        print(
            f"{name:46s} {med:8.2f} slices/s/chip  "
            f"samples={[round(x, 1) for x in s]}",
            flush=True,
        )
