"""StableHLO export smoke (r3 VERDICT item 7: record one per round).

Exports the flagship generator forward via ``eval.predictor.export_predictor``
(weights embedded, ``jax.export`` serialization), deserializes the blob, runs
it on the default backend, and checks the outputs against the live jitted
forward. Runs TWO configs per invocation: the quick bs8 check and the
documented bs128 serving sweet spot (3671.9 slices/s/chip,
tools/bench_infer.py — the r4 VERDICT asked the exported artifact to be
the same shape a deployment would load). One line of output per config =
the per-round artifact.

Usage (real TPU, default env): python tools/smoke_export.py
                               python tools/smoke_export.py --bs 8   # one config only
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def smoke_one(bs: int, size: int, label: str) -> None:
    import jax
    import numpy as np

    from pointcloududa_tpu.config import mscmrseg_default
    from pointcloududa_tpu.eval.predictor import Predictor, export_predictor, load_exported
    from pointcloududa_tpu.train.state import create_train_state

    cfg = mscmrseg_default(crop_size=size, bs=bs)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    blob = export_predictor(cfg, state.gen, batch_size=bs)
    t_export = time.perf_counter() - t0
    fn = load_exported(blob)
    x = np.random.default_rng(0).random((bs, size, size, 3)).astype(np.float32)
    t0 = time.perf_counter()
    out = fn(x)
    logits_x = np.asarray(out[0] if isinstance(out, (tuple, list)) else out)
    t_run = time.perf_counter() - t0
    logits_live, _ = Predictor(cfg, state.gen, batch_size=bs)(x)
    assert logits_x.shape == logits_live.shape, (logits_x.shape, logits_live.shape)
    err = float(np.max(np.abs(logits_x.astype(np.float64) - np.asarray(logits_live, np.float64))))
    agree = float(np.mean(logits_x.argmax(-1) == np.asarray(logits_live).argmax(-1)))
    assert agree == 1.0, f"exported argmax diverges from live forward ({agree:.4f} agree)"
    print(
        f"export smoke OK [{label}]: {len(blob) / 1e6:.1f} MB StableHLO blob, "
        f"export {t_export:.1f}s, deserialized run {t_run:.1f}s "
        f"(bs{bs} {size}^2), argmax parity exact, "
        f"max |logit delta| {err:.2e}",
        flush=True,
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bs", type=int, default=0,
                   help="run only this batch size (default: bs8 quick + bs128 serving)")
    p.add_argument("--size", type=int, default=224)
    args = p.parse_args(argv)

    if args.bs:
        smoke_one(args.bs, args.size, "custom")
    else:
        smoke_one(8, args.size, "quick")
        smoke_one(128, args.size, "serving bs128")


if __name__ == "__main__":
    main()
