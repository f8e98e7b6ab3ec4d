"""Batch-scaling + MFU table (VERDICT r2 item 6).

Batch 6 is the parity workload (the reference trains at batch 6,
configuration/dafnet_config_chaos.py:6); the idle-MXU finding (PERF.md)
says the chip has headroom when fed — this measures it: scan-differenced
step time, slices/s, and MFU at batch 6/24/48 for f32 and bf16.

MFU = cost-analysis FLOPs / step-time / peak. Peak for v5e: 197 TFLOP/s
bf16; f32 runs through the same MXU passes (XLA default precision) so the
same peak is used — the number is then a lower bound on "fraction of the
chip used".

Usage: python tools/bench_scaling.py [--batches 6,24,48] [--dtypes float32,bfloat16]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import functools
import json
import time

import jax
import numpy as np

from bench import make_batch, measure_step_ms

V5E_PEAK_FLOPS = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="6,24,48")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    args = ap.parse_args()

    from multimodal_segmentation_tpu.config import dafnet_chaos
    from multimodal_segmentation_tpu.models import build_model
    from multimodal_segmentation_tpu.train.state import create_train_state
    from multimodal_segmentation_tpu.train.steps import make_steps

    rows = []
    for dtype in args.dtypes.split(","):
        for B in [int(b) for b in args.batches.split(",")]:
            conf = dafnet_chaos()
            conf.compute_dtype = dtype
            conf.batch_size = B
            model = build_model(conf)
            steps = make_steps(model, conf)
            ts = create_train_state(model, conf, jax.random.PRNGKey(0))
            batch = make_batch(conf)

            fn = jax.jit(
                functools.partial(steps._step, supervised=True, automated=False),
                donate_argnums=(0,),
            )
            ca = fn.lower(ts, batch).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops", 0.0)
            gb = ca.get("bytes accessed", 0.0) / 1e9

            ms = measure_step_ms(steps, ts, batch)
            sps = B / (ms / 1e3)
            mfu = flops / (ms / 1e3) / V5E_PEAK_FLOPS
            row = {
                "dtype": dtype,
                "batch": B,
                "ms_per_step": round(ms, 1),
                "slices_per_sec": round(sps, 1),
                "tflop_per_step": round(flops / 1e12, 2),
                "GB_accessed": round(gb, 1),
                "mfu_pct": round(100 * mfu, 2),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    print("\n| dtype | batch | ms/step | slices/s | TFLOP | GB | MFU% |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            "| %(dtype)s | %(batch)d | %(ms_per_step).1f | %(slices_per_sec).1f "
            "| %(tflop_per_step).2f | %(GB_accessed).1f | %(mfu_pct).2f |" % r
        )


if __name__ == "__main__":
    main()
