#!/usr/bin/env python
"""Capture a TPU profiler trace of the UDA train step.

The reference's only instrumentation is a wall-clock decorator (SURVEY.md
§5); this captures a real XLA/TPU trace (viewable in TensorBoard's profile
plugin or Perfetto) plus the compiled step's cost analysis.

  python tools/profile_step.py --outdir /tmp/uda_trace --steps 6
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--outdir", default="/tmp/uda_trace")
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--packed", action=argparse.BooleanOptionalAction, default=True,
                   help="s2d-packed level-0 path (the production default; ops/packed.py)")
    p.add_argument("--workload", choices=["mscmrseg", "mmwhs"], default="mscmrseg",
                   help="mmwhs = BASELINE config 5 (256^2 5-class softmax-CE, "
                   "D2+D4, entropy/log C) — same config bench.py's "
                   "BENCH_WORKLOAD=mmwhs measures")
    args = p.parse_args(argv)

    import jax

    from pointcloududa_tpu.config import mmwhs_default, mscmrseg_default
    from pointcloududa_tpu.data.synthetic import synthetic_batch
    from pointcloududa_tpu.train.state import build_models, build_optimizers, create_train_state
    from pointcloududa_tpu.train.step import make_train_step
    from pointcloududa_tpu.utils.timer import trace_annotation

    kw = dict(bs=args.bs, compute_dtype=args.dtype,
              packed_level0=args.packed, packed_compute=args.packed)
    if args.workload == "mmwhs":
        cfg = mmwhs_default(softmax=True, d2=True, d4=True, **kw)
    else:
        cfg = mscmrseg_default(d1=True, d2=True, d4=True, **kw)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, build_models(cfg), build_optimizers(cfg))
    batch = jax.device_put(synthetic_batch(cfg, args.bs))

    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    print(f"step cost: {ca.get('flops', 0) / 1e12:.3f} TFLOP, "
          f"{ca.get('bytes accessed', 0) / 1e9:.2f} GB accessed")

    state, m = step(state, batch)
    _ = float(m["seg_loss"])  # warm + hard sync

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            with trace_annotation("uda_train_step"):
                state, m = step(state, batch)
        _ = float(m["seg_loss"])
    print(f"trace written to {args.outdir}")


if __name__ == "__main__":
    main()
