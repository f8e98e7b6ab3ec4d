"""Static HBM-traffic analysis of the fused DAFNet train step.

Compiles the single (un-scanned) step for the live backend, then walks the
optimized HLO and attributes bytes (output buffer sizes) to op kind and
dtype. This is the tool for answering "where do the 279 GB/step go and
which of them are still f32 under compute_dtype=bfloat16" without a
profiler trace.

Usage: python tools/hlo_traffic.py [float32|bfloat16] [--no-compile-only]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import collections
import re

import jax
import numpy as np

from bench import make_batch
from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "s16": 2, "u16": 2}

SHAPE_RE = re.compile(r"(f32|bf16|f16|f64|pred|s8|u8|s16|u16|s32|u32|s64|u64)\[([0-9,]*)\]")


def shape_bytes(text):
    """Sum buffer sizes of every typed shape literally present in `text`
    (handles tuple shapes by summing elements)."""
    total = 0
    by_dtype = collections.Counter()
    for m in SHAPE_RE.finditer(text):
        dt, dims = m.group(1), m.group(2)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        b = n * DTYPE_BYTES[dt]
        total += b
        by_dtype[dt] += b
    return total, by_dtype


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    conf = dafnet_chaos()
    conf.compute_dtype = dtype
    model = build_model(conf)
    steps = make_steps(model, conf)
    ts = create_train_state(model, conf, jax.random.PRNGKey(0))
    batch = make_batch(conf)

    import functools
    fn = jax.jit(functools.partial(steps._step, supervised=True, automated=False),
                 donate_argnums=(0,))
    lowered = fn.lower(ts, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("== cost analysis ==")
    for k in ("flops", "bytes accessed", "optimal_seconds"):
        if k in ca:
            print("  %s: %.3e" % (k, ca[k]))
    hlo = compiled.as_text()
    print("HLO length: %.1f MB" % (len(hlo) / 1e6))

    # Per-instruction: root-level instructions inside entry + fusion bodies.
    # Attribute each top-level op's OUTPUT bytes, bucketed by opcode and
    # output dtype.
    out_bytes = collections.Counter()
    dtype_bytes = collections.Counter()
    biggest = []
    # match lines like: %name = f32[6,192,192,64]{...} opcode(...)
    line_re = re.compile(
        r"^\s+(?:ROOT )?%?\S+ = ((?:\([^)]*\))|(?:\S+?))\{?[^=]*? (\w[\w-]*)\(", re.M)
    for m in line_re.finditer(hlo):
        shp, opcode = m.group(1), m.group(2)
        if opcode in ("parameter",):
            continue
        b, by_dt = shape_bytes(shp)
        if b == 0:
            continue
        out_bytes[opcode] += b
        for dt, bb in by_dt.items():
            dtype_bytes[dt] += bb
        if b > 20e6:
            biggest.append((b, opcode, shp[:60]))

    print("\n== output bytes by opcode (top 20) ==")
    for op, b in out_bytes.most_common(20):
        print("  %-28s %10.2f MB" % (op, b / 1e6))
    print("\n== output bytes by dtype ==")
    for dt, b in dtype_bytes.most_common():
        print("  %-6s %10.2f MB" % (dt, b / 1e6))
    print("\n== biggest single outputs (>20MB) ==")
    for b, op, shp in sorted(biggest, reverse=True)[:25]:
        print("  %8.1f MB  %-20s %s" % (b / 1e6, op, shp))


if __name__ == "__main__":
    main()
