"""Attribute measured device time per HLO op to MODULE paths.

Joins the xplane trace (per-op durations, tools/xplane_stats.py parsing)
with the compiled scan program's HLO metadata (op_name carries the
jvp(Module)/submodule/op path), yielding the per-module time table the
static cost analysis can only approximate. This is the round-4 tool for
locating the ~78 ms/step of elementwise fusions (xplane trace) in model
space.

Usage: python tools/time_attrib.py <trace_dir> [hlo_cache.txt]
  (writes/loads the compiled scan HLO to avoid recompiling)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import collections
import re

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def build_hlo(cache_path):
    if os.path.exists(cache_path):
        return open(cache_path).read()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    from bench import make_batch
    from multimodal_segmentation_tpu.config import dafnet_chaos
    from multimodal_segmentation_tpu.models import build_model
    from multimodal_segmentation_tpu.train.state import create_train_state
    from multimodal_segmentation_tpu.train.steps import make_steps

    conf = dafnet_chaos()
    conf.compute_dtype = "bfloat16"
    model = build_model(conf)
    steps = make_steps(model, conf)
    ts = create_train_state(model, conf, jax.random.PRNGKey(0))
    batch = make_batch(conf)

    @jax.jit
    def many(ts, batch):
        def body(ts, _):
            ts, m = steps._step(ts, batch, supervised=True, automated=False)
            return ts, m["loss"]
        ts, losses = jax.lax.scan(body, ts, None, length=10)
        return losses[-1]

    hlo = many.lower(ts, batch).compile().as_text()
    with open(cache_path, "w") as f:
        f.write(hlo)
    return hlo


def op_modules(hlo):
    """name -> module path (first two informative segments of op_name)."""
    mod = {}
    boring = {"while", "body", "closed_call", "cond"}
    rx = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = .*?metadata=\{[^}]*op_name=\"([^\"]+)\"", re.M)
    for m in rx.finditer(hlo):
        name, op_name = m.group(1), m.group(2)
        parts = [
            p for p in op_name.split("/")
            if p and not p.startswith("jit(") and p not in boring
        ]
        mod[name] = "/".join(parts[:3]) if parts else op_name
    return mod


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_r4"
    cache = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hlo_scan_bf16.txt"
    n_steps = 10

    hlo = build_hlo(cache)
    mod = op_modules(hlo)
    print("hlo ops with metadata: %d" % len(mod))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xplane_stats import load  # reuse the raw xplane parser

    xs, path = load(trace_dir)
    print("parsed", path)

    name_rx = re.compile(r"%?([\w.\-]+)")
    per_module = collections.Counter()
    per_op = collections.Counter()
    unattributed = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name or "#Chip" in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = ev_names.get(ev.metadata_id, "")
                tok = name_rx.match(nm.lstrip("%"))
                if not tok:
                    continue
                op = tok.group(1)
                dur = ev.duration_ps / 1e9 / n_steps  # -> ms/step
                if op.startswith("while"):
                    continue  # the scan wrapper nests everything
                per_op[op] += dur
                m = mod.get(op)
                if m is None:
                    unattributed[op] += dur
                    per_module["<unattributed:%s>" % re.sub(r"[\d.]+$", "", op)] += dur
                else:
                    per_module[m] += dur

    total = sum(per_op.values())
    print("\ntotal attributed device ms/step: %.1f" % total)
    print("\n== ms/step by module path (top 40) ==")
    for m, ms in per_module.most_common(40):
        print("  %7.2f ms  %s" % (ms, m))

    # roll up one more level: top-level transform+module
    top = collections.Counter()
    for m, ms in per_module.items():
        top[m.split("/")[0]] += ms
    print("\n== ms/step by top segment ==")
    for m, ms in top.most_common(30):
        print("  %7.2f ms  %s" % (ms, m))


if __name__ == "__main__":
    main()
