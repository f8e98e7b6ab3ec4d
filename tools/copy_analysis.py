"""Find the copy ops in the compiled fused step and attribute them.

The round-2 trace showed ~52 ms/step of pure `copy` ops (PERF.md). This
tool compiles the single fused step (persistent-cache friendly), extracts
every copy/bitcast-convert/transpose instruction from the optimized HLO,
sums bytes by shape, and prints each big copy with its operand's defining
instruction so the producer (donation mismatch, layout change, scan
boundary) can be identified.

Usage: python tools/copy_analysis.py [float32|bfloat16] [--scan]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import collections
import functools
import re
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_batch
from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "s16": 2,
               "u16": 2, "u64": 8}

SHAPE_RE = re.compile(r"(f32|bf16|f16|f64|pred|s8|u8|s16|u16|s32|u32|s64|u64)\[([0-9,]*)\]")


def shape_bytes(text):
    total = 0
    for m in SHAPE_RE.finditer(text):
        dt, dims = m.group(1), m.group(2)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    use_scan = "--scan" in sys.argv
    conf = dafnet_chaos()
    conf.compute_dtype = dtype
    model = build_model(conf)
    steps = make_steps(model, conf)
    ts = create_train_state(model, conf, jax.random.PRNGKey(0))
    batch = make_batch(conf)

    if use_scan:
        def many(ts, batch):
            def body(ts, _):
                ts, m = steps._step(ts, batch, supervised=True, automated=False)
                return ts, m["loss"]
            ts, losses = jax.lax.scan(body, ts, None, length=10)
            return losses[-1]
        fn = jax.jit(many)
    else:
        fn = jax.jit(
            functools.partial(steps._step, supervised=True, automated=False),
            donate_argnums=(0,),
        )
    t0 = time.time()
    compiled = fn.lower(ts, batch).compile()
    print("compile %.1fs" % (time.time() - t0))
    hlo = compiled.as_text()
    print("HLO %.1f MB" % (len(hlo) / 1e6))

    # defining line for every instruction name
    def_line = {}
    name_re = re.compile(r"^\s+(?:ROOT )?(%?[\w.\-]+) = ", re.M)
    for m in name_re.finditer(hlo):
        nm = m.group(1)
        line = hlo[m.start():hlo.index("\n", m.start())]
        def_line[nm.lstrip("%")] = line.strip()

    copy_re = re.compile(
        r"^\s+(?:ROOT )?(%?[\w.\-]+) = (\S+) copy\(([^)]+)\)", re.M)
    buckets = collections.Counter()
    items = []
    for m in copy_re.finditer(hlo):
        nm, shp, operand = m.group(1), m.group(2), m.group(3)
        b = shape_bytes(shp)
        buckets[shp.split("{")[0]] += b
        op = operand.split(",")[0].strip().lstrip("%")
        items.append((b, nm.lstrip("%"), shp, op))
    total = sum(b for b, *_ in items)
    print("\ntotal copy bytes: %.1f MB in %d copies" % (total / 1e6, len(items)))
    print("\n== copy bytes by shape (top 20) ==")
    for shp, b in buckets.most_common(20):
        print("  %10.2f MB  %s" % (b / 1e6, shp))
    print("\n== biggest copies with producer (top 30) ==")
    for b, nm, shp, op in sorted(items, reverse=True)[:30]:
        prod = def_line.get(op, "?")[:140]
        print("  %8.2f MB  %-18s <- %s" % (b / 1e6, shp.split("{")[0], prod))

    # also: fusion count and sizes
    nfusion = len(re.findall(r" fusion\(", hlo))
    nconv = len(re.findall(r" convolution\(", hlo))
    print("\nfusions: %d  convolutions: %d" % (nfusion, nconv))

    import collections as _c
    targets = _c.Counter(re.findall(r'custom_call_target="([^"]+)"', hlo))
    print("\n== custom-call targets ==")
    for t, n in targets.most_common(10):
        print("  %5d  %s" % (n, t))
    # f32 big-buffer producers: which op_names still materialise f32?
    f32_ops = _c.Counter()
    for m in re.finditer(r"f32\[(\d+),(\d+),(\d+),(\d+)\][^\n]*metadata=\{op_name=\"([^\"]+)", hlo):
        dims = [int(m.group(i)) for i in range(1, 5)]
        n = 1
        for d in dims:
            n *= d
        if n * 4 > 8e6:
            key = m.group(5)[:110]
            f32_ops[key] += n * 4
    print("\n== big f32 buffers by op_name (top 15) ==")
    for k, b in f32_ops.most_common(15):
        print("  %8.1f MB  %s" % (b / 1e6, k))


if __name__ == "__main__":
    main()
