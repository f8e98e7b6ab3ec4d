"""Aggregate device time by HLO op category straight from an xplane.pb.

The tensorboard_plugin_profile converter is broken in this environment
(protobuf/pywrap mismatches), so this parses the raw XSpace proto: for the
TPU device plane, sums event durations per event name, then buckets by op
kind (fusion/convolution/copy/custom-call/...) from the name prefix.

Usage: python tools/xplane_stats.py <trace_dir_or_xplane.pb> [n_steps]
"""
import os, sys, glob, collections, re

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def load(path):
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
        path = max(cands, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs, path


CAT_RES = [
    ("convolution", re.compile(r"^%?(convolution|conv)")),
    ("pallas", re.compile(r"tpu_custom_call|custom-call.*mosaic")),
    ("copy", re.compile(r"^%?(copy|copy-start|copy-done)")),
    ("fusion:loop", re.compile(r"^%?loop_")),
    ("fusion:input(reduce)", re.compile(r"^%?(input_|reduce_)")),
    ("fusion", re.compile(r"^%?(fusion|wide_param|select_bitcast)")),
    ("all-reduce", re.compile(r"^%?all-reduce")),
    ("dynamic-slice/update", re.compile(r"^%?dynamic")),
    ("slice/concat/reshape/bitcast", re.compile(r"^%?(slice|concat|reshape|bitcast|transpose|pad)")),
    ("custom-call(other)", re.compile(r"^%?custom-call")),
]


def cat_of(name):
    for c, rx in CAT_RES:
        if rx.search(name):
            return c
    return "other"


def main():
    xs, path = load(sys.argv[1])
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    print("parsed", path)
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            per_name = collections.Counter()
            total_ps = 0
            for ev in line.events:
                nm = ev_meta.get(ev.metadata_id, "?")
                per_name[nm] += ev.duration_ps
                total_ps += ev.duration_ps
            if not per_name:
                continue
            print("\n== plane %s | line %r (total %.2f ms; /step = %.2f ms) =="
                  % (plane.name, line.name, total_ps / 1e9,
                     total_ps / 1e9 / n_steps))
            per_cat = collections.Counter()
            for nm, ps in per_name.items():
                per_cat[cat_of(nm)] += ps
            for c, ps in per_cat.most_common():
                print("  %-28s %8.3f ms/step  (%4.1f%%)"
                      % (c, ps / 1e9 / n_steps, 100.0 * ps / total_ps))
            print("  -- top 20 individual ops --")
            for nm, ps in per_name.most_common(20):
                print("    %8.3f ms/step  %s" % (ps / 1e9 / n_steps, nm[:110]))


if __name__ == "__main__":
    main()
