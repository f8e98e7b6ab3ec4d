"""Copy/fusion audit of the fused DAFNet train step.

Round-2 profiling attributed ~52 ms/step to pure copies (PERF.md:52-59).
This dumps the optimized HLO for the step, then reports:
  * every copy/copy-start instruction: bytes, layouts in->out, operand op
  * fusion count + total fusion output bytes (the "many small fusions" bucket)
  * layout mismatches across donated input/output params

Usage: python tools/copy_audit.py [float32|bfloat16] [--dump FILE]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import collections
import functools
import re

import jax

from bench import make_batch
from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "s16": 2, "u16": 2}
SHAPE_RE = re.compile(
    r"(f32|bf16|f16|f64|pred|s8|u8|s16|u16|s32|u32|s64|u64)\[([0-9,]*)\](?:\{([0-9,a-zA-Z:()]*)\})?")


def nbytes(dt, dims):
    n = 1
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return n * DTYPE_BYTES[dt]


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    dump = None
    if "--dump" in sys.argv:
        dump = sys.argv[sys.argv.index("--dump") + 1]
    conf = dafnet_chaos()
    conf.compute_dtype = dtype
    model = build_model(conf)
    steps = make_steps(model, conf)
    ts = create_train_state(model, conf, jax.random.PRNGKey(0))
    batch = make_batch(conf)

    fn = jax.jit(
        functools.partial(steps._step, supervised=True, automated=False),
        donate_argnums=(0,),
    )
    compiled = fn.lower(ts, batch).compile()
    hlo = compiled.as_text()
    if dump:
        with open(dump, "w") as f:
            f.write(hlo)
        print("dumped HLO to %s (%.1f MB)" % (dump, len(hlo) / 1e6))

    copies = []
    fusion_bytes = 0
    fusion_count = 0
    opcount = collections.Counter()
    # instruction lines: "  %name = TYPE[dims]{layout} opcode(...)"
    line_re = re.compile(r"^\s+(?:ROOT )?([%\w.-]+) = (\S+) (\w[\w-]*)\((.*)$", re.M)
    for m in line_re.finditer(hlo):
        name, shp, opcode, rest = m.groups()
        opcount[opcode] += 1
        sm = SHAPE_RE.search(shp)
        b = 0
        lay = ""
        if sm:
            b = nbytes(sm.group(1), sm.group(2))
            lay = sm.group(3) or ""
        if opcode in ("copy", "copy-start"):
            # operand layout
            om = SHAPE_RE.search(rest)
            olay = om.group(3) if om and om.group(3) else ""
            copies.append((b, sm.group(2) if sm else "?", lay, olay, rest[:70]))
        elif opcode == "fusion":
            fusion_count += 1
            fusion_bytes += b

    total_copy = sum(c[0] for c in copies)
    print("\n== instruction counts (top 15) ==")
    for op, c in opcount.most_common(15):
        print("  %-24s %d" % (op, c))
    print("\n== copies: %d instructions, %.1f MB output bytes ==" % (
        len(copies), total_copy / 1e6))
    agg = collections.Counter()
    for b, dims, lay, olay, _ in copies:
        agg[(dims, olay, lay)] += b
    for (dims, olay, lay), b in agg.most_common(25):
        print("  %8.2f MB  [%s]  %s -> %s" % (b / 1e6, dims, olay or "?", lay or "?"))
    print("\n== fusions: %d, %.1f MB output bytes ==" % (fusion_count, fusion_bytes / 1e6))


if __name__ == "__main__":
    main()
