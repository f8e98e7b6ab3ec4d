"""Collective-inventory audit of compiled SPMD programs.

Multi-chip efficiency lives and dies by which collectives GSPMD inserts:
a data-parallel step should synchronise gradients/BN statistics with
all-reduces and nothing else; a misplaced sharding annotation instead
surfaces as activation-sized all-gathers or all-to-alls that ride ICI per
step. This module parses an optimized HLO module text into a typed
inventory so tests can pin the expected collective set (VERDICT r3 item 3)
and tools can report per-collective byte budgets.
"""

import collections
import re

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "f64": 8, "pred": 1,
    "s8": 1, "u8": 1, "s16": 2, "u16": 2, "s32": 4, "u32": 4,
    "s64": 8, "u64": 8,
}

_SHAPE_RE = re.compile(
    r"(f32|bf16|f16|f64|pred|s8|u8|s16|u16|s32|u32|s64|u64)\[([0-9,]*)\]"
)

# start/done variants cover async collectives; the bare opcode covers sync.
COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "all-to-all",
    "collective-permute",
    "collective-broadcast",
)

_LINE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^)]*\)|\S+)\s+(" +
    "|".join(COLLECTIVE_OPS) +
    r")(?:-start)?\(",
    re.M,
)


def _shapes(text):
    """All (dtype, dims, bytes) shapes literally present in `text`
    (tuple shapes yield one entry per element)."""
    out = []
    for m in _SHAPE_RE.finditer(text):
        dt, dims = m.group(1), m.group(2)
        dims = [int(d) for d in dims.split(",")] if dims else []
        n = 1
        for d in dims:
            n *= d
        out.append((dt, tuple(dims), n * DTYPE_BYTES[dt]))
    return out


def collective_inventory(hlo_text):
    """Parse optimized HLO text into a collective inventory.

    Returns a dict:
      ops: list of {op, shapes: [(dtype, dims, bytes)], bytes} per
           collective instruction (async start/done pairs counted once,
           at the -start).
      count: Counter op -> occurrences
      bytes: Counter op -> total output bytes
    """
    ops = []
    count = collections.Counter()
    total = collections.Counter()
    for m in _LINE_RE.finditer(hlo_text):
        shape_txt, op = m.group(1), m.group(2)
        shapes = _shapes(shape_txt)
        b = sum(s[2] for s in shapes)
        ops.append({"op": op, "shapes": shapes, "bytes": b})
        count[op] += 1
        total[op] += b
    return {"ops": ops, "count": count, "bytes": total}


def activation_sized(shapes, min_hw=96):
    """True if any shape looks like a (B, H, W, C) activation with spatial
    dims >= min_hw — the signature of an accidental activation all-gather
    (parameters are (kh, kw, cin, cout) with kh=kw<=7; batch-norm/grad
    buffers are 1-D)."""
    for _, dims, _ in shapes:
        if len(dims) >= 3:
            spatial = [d for d in dims[1:-1] if d >= min_hw]
            if len(spatial) >= 2:
                return True
    return False


def summarize(inv):
    lines = []
    for op in sorted(inv["count"]):
        lines.append(
            "%-20s x%-4d %10.2f MB"
            % (op, inv["count"][op], inv["bytes"][op] / 1e6)
        )
    return "\n".join(lines) if lines else "(no collectives)"
