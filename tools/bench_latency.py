"""Per-volume inference latency with a confidence interval + regression gate.

North-star metric 3 (BASELINE.md): p50 per-volume segmentation latency for
simple/def/max fusion. Round-3 measured this with a single chained-call
timing whose session-to-session spread was ±50% (PERF.md routing note) —
useless as a tracked metric. This tool measures the way bench.py does:
chain n predicts through a data dependency inside ONE jitted function,
host-read only the final scalar, and DIFFERENCE two chain lengths — the
relay dispatch overhead and the mask-download time cancel exactly.
Repeating that differenced measurement M times gives a spread that is
device noise only (<10% target).

Writes BENCH_latency.json at the repo root and, when a previous file
exists, gates on p50 regression > --gate-pct (default 25%): exit code 1.

Reference path being measured: model_tester.py:49-85 (per-volume predict).

Usage: python tools/bench_latency.py [--update] [--gate-pct 25]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_latency.json")

V = 24  # padded volume length (max CHAOS volume is ~27 aligned slices)
N1, N2 = 2, 8
REPEATS = 12


def make_chained(model, params, state, ftype, n):
    @jax.jit
    def chained(x1, x2):
        carry = jnp.float32(0.0)
        m = None
        for _ in range(n):
            # non-foldable dependency on BOTH inputs so CSE/DCE cannot
            # collapse iterations or prune either encoder
            m = model.predict_mask(
                params, state, 1, ftype, [x1 + carry, x2 + carry]
            )
            carry = 1e-20 * jnp.mean(m)
        return jnp.mean(m)  # scalar host read only

    return chained


def measure(model, params, state, ftype, x1, x2):
    fns = {n: make_chained(model, params, state, ftype, n) for n in (N1, N2)}
    for f in fns.values():
        float(np.asarray(f(x1, x2)))  # compile + warm
    samples = []
    for _ in range(REPEATS):
        t = {}
        for n, f in fns.items():
            t0 = time.perf_counter()
            float(np.asarray(f(x1, x2)))  # forced scalar host read
            t[n] = time.perf_counter() - t0
        samples.append((t[N2] - t[N1]) / (N2 - N1) * 1e3)
    samples = np.asarray(samples)
    p50 = float(np.percentile(samples, 50))
    lo, hi = np.percentile(samples, [25, 75])
    spread_pct = float((hi - lo) / p50 * 100.0)
    return {
        "p50_ms": round(p50, 2),
        "iqr_ms": [round(float(lo), 2), round(float(hi), 2)],
        "spread_pct": round(spread_pct, 1),
        "repeats": REPEATS,
        "chain": [N1, N2],
        "volume_slices": V,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true",
                    help="overwrite BENCH_latency.json with the new numbers")
    ap.add_argument("--gate-pct", type=float, default=25.0)
    ap.add_argument("--eval-dtype", default="bfloat16",
                    help="activation dtype for the predict model; params "
                         "stay f32. Default bfloat16 = the production "
                         "configuration (training runs bf16, so the CLI's "
                         "tester already predicts in bf16; Dice parity in "
                         "tools/eval_warp_parity.py). Pass '' for the "
                         "exact-f32 path.")
    args = ap.parse_args()

    from multimodal_segmentation_tpu.config import dafnet_chaos
    from multimodal_segmentation_tpu.models import build_model

    conf = dafnet_chaos()
    if args.eval_dtype:
        conf.compute_dtype = args.eval_dtype
    model = build_model(conf)
    params, state = model.init(jax.random.PRNGKey(0))
    r = np.random.RandomState(0)
    x1 = jnp.asarray(r.rand(V, 192, 192, 1).astype(np.float32))
    x2 = jnp.asarray(r.rand(V, 192, 192, 1).astype(np.float32))

    results = {}
    for ftype in ("simple", "def", "max"):
        results[ftype] = measure(model, params, state, ftype, x1, x2)
        print(json.dumps({"fusion": ftype, **results[ftype]}))

    rc = 0
    if os.path.exists(OUT):
        prev = json.load(open(OUT))
        for ftype, res in results.items():
            if ftype not in prev:
                continue
            old = prev[ftype]["p50_ms"]
            if res["p50_ms"] > old * (1 + args.gate_pct / 100.0):
                print("REGRESSION: %s p50 %.2f ms vs recorded %.2f ms (>+%g%%)"
                      % (ftype, res["p50_ms"], old, args.gate_pct))
                rc = 1
    if args.update or not os.path.exists(OUT):
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
        print("wrote", OUT)
    sys.exit(rc)


if __name__ == "__main__":
    main()
