"""Quiet, one-process re-measurement of the e2e bench rows (README
"End-to-end" + docs/SCALING.md "End-to-end step cost").

All rows in ONE process: cross-config deltas are same-session (the relay
shows up to +-4% across sessions), and the step-only anchor row detects
session-level skew against the known quiet 343.2 +- 1.5. CAUTION learned
the hard way: UDAConfig.compute_dtype defaults to FLOAT32 — every config
here must pass compute_dtype="bfloat16" to match bench.py's rows (a first
version omitted it and silently measured f32: anchor 256.7, mmwhs-light
119.7/140.6 — numbers ~25% low across the board).

Rows: mscmrseg step-only (anchor), mscmrseg e2e none/light/heavy (heavy
also at bs 32/64 — the per-batch-fixed exact-order scan+switch chain in
ops/augment.py amortises with batch while the step itself is batch-flat,
so larger batches recover most of the heavy-aug tax), mmwhs e2e light
with the vert_t diagnostic every step / every 10th step / off (the A/B
grid for -vert_t_every / -no_vert_t_metric, docs/SCALING.md "End-to-end
step cost"). Two-point chain timing exactly as bench.py.
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


def measure(workload: str, e2e: bool, aug: str, vert_t_metric: bool = True,
            bs: int = BS, vert_t_every: int = 1) -> list:
    kw = dict(
        bs=bs, aug=aug, compute_dtype="bfloat16", chamfer_impl="auto",
        packed_level0=True, packed_compute=True, bn_stats_impl="auto",
        vert_t_metric=vert_t_metric, vert_t_every=vert_t_every,
    )
    if workload == "mmwhs":
        cfg = mmwhs_default(softmax=True, d2=True, d4=True, **kw)
    else:
        cfg = mscmrseg_default(d1=True, d2=True, d4=True, **kw)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))
    every = vert_t_every

    def with_vt(i):
        return every <= 1 or i % every == 0  # the trainer's cadence gate

    if e2e:
        pre = make_device_preprocess(cfg, train=True, device_augment=True)
        raws = [jax.device_put(synthetic_raw_batch(cfg, bs, seed=s)) for s in range(4)]
        keys = [jax.device_put(jax.random.PRNGKey(1000 + i)) for i in range(16)]

        def one(state, i):
            batch = pre(keys[i % len(keys)], raws[i % len(raws)],
                        with_vert_t=with_vt(i))
            return step(state, batch)
    else:
        batches = [jax.device_put(synthetic_batch(cfg, bs, seed=s)) for s in range(4)]

        def one(state, i):
            return step(state, batches[i % len(batches)])

    for i in range(3):  # warms BOTH cadence variants (i=0 on, i=1,2 off)
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
        samples.append(bs / ((t_big - t_small) / (N_STEPS - n_small)))
    return samples


ROWS = [
    # anchor aug="heavy" = mscmrseg_default's own default, bench.py-exact
    # (unused in the step-only path but keeps the config identical)
    ("mscmrseg step-only (anchor, quiet=343.2±1.5)", "mscmrseg", False, "heavy", True, BS, 1),
    ("mscmrseg e2e none", "mscmrseg", True, "", True, BS, 1),
    ("mscmrseg e2e light", "mscmrseg", True, "light", True, BS, 1),
    ("mscmrseg e2e heavy", "mscmrseg", True, "heavy", True, BS, 1),
    ("mscmrseg e2e heavy bs32", "mscmrseg", True, "heavy", True, 32, 1),
    ("mscmrseg e2e heavy bs64", "mscmrseg", True, "heavy", True, 64, 1),
    ("mmwhs    e2e light (vert_t on)", "mmwhs", True, "light", True, BS, 1),
    ("mmwhs    e2e light (vert_t every=10)", "mmwhs", True, "light", True, BS, 10),
    ("mmwhs    e2e light (vert_t OFF)", "mmwhs", True, "light", False, BS, 1),
]

if __name__ == "__main__":
    for name, wl, e2e, aug, vt, bs, every in ROWS:
        print(f"[row start {time.strftime('%H:%M:%S')}] {name}", flush=True)
        # One retry per row: the relay occasionally drops a session with
        # FAILED_PRECONDITION mid-compile; a row failure must not void the
        # whole same-session sweep (the anchor row guards cross-row skew).
        for attempt in (1, 2):
            try:
                s = measure(wl, e2e, aug, vt, bs=bs, vert_t_every=every)
                break
            except Exception as e:  # noqa: BLE001
                print(f"  attempt {attempt} FAILED: {type(e).__name__}: {e}",
                      flush=True)
                s = None
        if s is None:
            continue
        med = sorted(s)[1]
        print(
            f"{name:46s} {med:8.2f} slices/s/chip  "
            f"samples={[round(x, 1) for x in s]}",
            flush=True,
        )
