"""Attribute HBM bytes of the compiled fused step to MODULE paths.

Completes the bandwidth-floor argument (PERF.md round 5): per-module BYTE
accounting from the optimized HLO, not just per-module time. For every
instruction outside the fused-computation bodies (fusion roots, convs,
copies, custom-calls, reduces — the things that actually touch HBM), the
bytes are approximated as the sum of all operand + output shapes printed
on its defining line, and attributed to the jvp(Module)/... path carried
in its metadata op_name. Fusion-internal intermediates live in
registers/VMEM and are correctly NOT counted.

Usage: python tools/byte_attrib.py [hlo_cache.txt]
  (defaults to the cache written by tools/time_attrib.py; builds it if
  absent — requires the TPU backend for the production compile)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import collections
import re

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from copy_analysis import shape_bytes  # noqa: E402
from time_attrib import build_hlo, op_modules  # noqa: E402

# instruction opcodes that move HBM bytes when they appear at computation
# scope (fusion internals are excluded by the computation filter below)
HBM_OPS = re.compile(
    r"= \S+ (fusion|convolution|copy|copy-start|custom-call|reduce|"
    r"all-reduce|transpose|concatenate|slice|dynamic-slice|"
    r"dynamic-update-slice|gather|scatter|select-and-scatter|"
    r"reduce-window|broadcast|iota|rng|pad|reverse|sort|dot)\("
)


def main():
    cache = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hlo_scan_bf16.txt"
    hlo = build_hlo(cache)
    mod = op_modules(hlo)

    # computations called as fusion bodies / scalar reducers execute in
    # registers or VMEM — their instruction lines must not be counted as
    # HBM traffic. Everything else (ENTRY, while bodies) executes at
    # computation scope and does.
    fused_bodies = set(re.findall(r"(?:calls|to_apply)=%?([\w.\-]+)", hlo))

    # this HLO dump prints operands WITHOUT shapes; resolve each operand
    # name to the output shape of its defining line so reads are counted
    def_shape = {}
    def_rx = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = (\S+)")
    for line in hlo.splitlines():
        dm = def_rx.match(line)
        if dm:
            def_shape[dm.group(1)] = shape_bytes(dm.group(2))
    operand_rx = re.compile(r"%([\w.\-]+)")

    per_module = collections.Counter()
    per_comp_total = collections.Counter()
    comp = None
    in_fused = False
    name_rx = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = ")
    comp_rx = re.compile(r"^(?:ENTRY )?%?([\w.\-]+)\s*\(.*\{\s*$")

    for line in hlo.splitlines():
        cm = comp_rx.match(line) if not line.startswith(" ") else None
        if cm:
            comp = cm.group(1)
            in_fused = comp in fused_bodies
            continue
        if in_fused or comp is None:
            continue
        m = name_rx.match(line)
        if not m or not HBM_OPS.search(line):
            continue
        name = m.group(1)
        # output bytes (shapes printed on the line) + operand reads
        # (resolved via each operand's defining line). The operand list is
        # the text up to the metadata/config tail.
        head = line.split(", metadata=")[0].split(", kind=")[0]
        b = shape_bytes(head)
        ops_part = head.split("(", 1)[-1]
        for om in operand_rx.finditer(ops_part):
            if om.group(1) != name:
                b += def_shape.get(om.group(1), 0)
        per_comp_total[comp] += b
        path = mod.get(name)
        if path is None:
            op_kind = re.sub(r"[\d.\-]+$", "", name)
            per_module["<unattributed:%s>" % op_kind] += b
        else:
            per_module[path] += b

    total = sum(per_module.values())
    print("total HBM-visible bytes (one step): %.1f GB" % (total / 1e9))
    print("\n== GB by module path (top 40) ==")
    for m, b in per_module.most_common(40):
        print("  %7.2f GB  %s" % (b / 1e9, m))

    # roll up to the leading transform(Module) segment
    top = collections.Counter()
    for m, b in per_module.items():
        top[m.split("/")[0]] += b
    print("\n== GB by top-level module ==")
    for m, b in top.most_common(30):
        print("  %7.2f GB  (%4.1f%%)  %s" % (b / 1e9, 100 * b / total, m))


if __name__ == "__main__":
    main()
