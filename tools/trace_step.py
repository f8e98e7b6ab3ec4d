"""Profile the fused DAFNet train step and print a per-HLO-op time table.

Runs N steps inside one jitted lax.scan under jax.profiler.trace, then
converts the captured xplane with tensorboard_plugin_profile's hlo_stats
tool and aggregates device time by op category. Usage:

    python tools/trace_step.py [float32|bfloat16] [outdir]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import json

import jax
import numpy as np

from bench import make_batch
from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mmseg_trace_%s" % dtype
    automated = "automated" in sys.argv[1:]
    conf = dafnet_chaos()
    conf.compute_dtype = dtype
    conf.automatedpairing = automated
    model = build_model(conf)
    steps = make_steps(model, conf)
    ts = create_train_state(model, conf, jax.random.PRNGKey(0))
    batch = make_batch(conf)
    if automated:
        H, W = conf.input_hw
        r = np.random.RandomState(1)
        for k in ("x1_pairs", "x2_pairs"):
            batch[k] = jax.numpy.asarray(
                r.rand(conf.batch_size, H, W, conf.n_pairs).astype(np.float32)
            )
        del batch["x1"], batch["x2"]

    @jax.jit
    def many(ts, batch):
        def body(ts, _):
            ts, m = steps._step(ts, batch, supervised=True, automated=automated)
            return ts, m["loss"]

        ts, losses = jax.lax.scan(body, ts, None, length=10)
        return losses[-1]

    float(np.asarray(many(ts, batch)))  # compile + warm
    with jax.profiler.trace(outdir):
        float(np.asarray(many(ts, batch)))
    print("trace written to", outdir)

    xplanes = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print("no xplane captured")
        return
    xplane = max(xplanes, key=os.path.getmtime)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    # hlo_stats: gviz table with cols incl. category, occurrences, total time
    cols = [c["label"] for c in table[0]["cols"]] if isinstance(table, list) else [c["label"] for c in table["cols"]]
    rows = table[0]["rows"] if isinstance(table, list) else table["rows"]
    print("columns:", cols)
    i_cat = next(i for i, c in enumerate(cols) if "ategory" in c)
    try:
        i_time = next(i for i, c in enumerate(cols) if "otal time" in c.lower())
    except StopIteration:
        i_time = next(i for i, c in enumerate(cols) if "time" in c.lower())
    i_name = next(i for i, c in enumerate(cols) if "expression" in c.lower() or "name" in c.lower())
    agg = {}
    detail = {}
    for r in rows:
        cat = r["c"][i_cat]["v"]
        t = float(r["c"][i_time]["v"] or 0)
        agg[cat] = agg.get(cat, 0.0) + t
        name = str(r["c"][i_name]["v"])[:90]
        detail[(cat, name)] = detail.get((cat, name), 0.0) + t
    total = sum(agg.values())
    print("\n== device time by category (10 steps) ==")
    for cat, t in sorted(agg.items(), key=lambda kv: -kv[1]):
        print("%-36s %10.2f  (%.1f%%)" % (cat, t, 100 * t / total))
    print("total:", total)
    print("\n== top 25 ops ==")
    for (cat, name), t in sorted(detail.items(), key=lambda kv: -kv[1])[:25]:
        print("%10.2f  %-28s %s" % (t, cat, name))


if __name__ == "__main__":
    main()
