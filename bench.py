"""Benchmark: DAFNet fused train-step throughput (slices/sec/chip).

Reference workload (BASELINE.md): the 18-output DAFNet expert-pairing
trainer at batch 6, 192x192x1, plus both discriminator updates — i.e. one
full training batch. The reference executes this as 5 Keras fits + ~16
predicts with host round-trips per batch on a Titan-V
(model_executors/dafnet_executor.py:369-583); here it is one XLA program.

Timing method: the step is run N1 and N2 times INSIDE one jitted
lax.scan (a single dispatch each) and the difference (N2-N1 steps) is
timed, with a forced host read of the final loss. On remote-dispatch
backends (axon tunnel), naive per-call timing with block_until_ready
measures dispatch pipelining, not device compute — this method is immune
to that (it over-counts nothing and hides nothing).

vs_baseline divides by an ANALYTIC Titan-V estimate (no measured number
exists — the reference repo publishes none, BASELINE.md): ~6 slices/sec,
from ~2.4 TFLOP of fwd+bwd work per 6-slice batch at ~35% of 14 TFLOP/s
fp32 plus the multi-fit host overhead. The north-star target is 10x that
(60 slices/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax

# Persistent compile cache: the fused-step scan programs take minutes to
# compile over the remote-dispatch tunnel; warmed by tools/bench_variants.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

TITAN_V_EST_SLICES_PER_SEC = 6.0


def make_batch(conf, seed=0):
    r = np.random.RandomState(seed)
    B = conf.batch_size
    H, W = conf.input_hw
    nm = conf.num_masks
    b = {
        "x1": r.rand(B, H, W, 1) * 2 - 1,
        "x2": r.rand(B, H, W, 1) * 2 - 1,
        "m1": (r.rand(B, H, W, nm) > 0.8),
        "m2": (r.rand(B, H, W, nm) > 0.8),
        "dm1": (r.rand(B, H, W, nm) > 0.8),
        "dm2": (r.rand(B, H, W, nm) > 0.8),
        "dx1": r.rand(B, H, W, 1) * 2 - 1,
        "dx2": r.rand(B, H, W, 1) * 2 - 1,
    }
    return {k: jnp.asarray(v, jnp.float32) for k, v in b.items()}


def measure_step_ms(steps, ts, batch, n1=2, n2=12, automated=False):
    """Scan-differenced on-device step time (ms)."""

    def make(n):
        @jax.jit
        def many(ts, batch):
            def body(ts, _):
                ts, m = steps._step(
                    ts, batch, supervised=True, automated=automated
                )
                return ts, m["loss"]

            ts, losses = jax.lax.scan(body, ts, None, length=n)
            return losses[-1]

        return many

    res = {}
    for n in (n1, n2):
        f = make(n)
        float(np.asarray(f(ts, batch)))  # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(f(ts, batch)))  # forced host read
        res[n] = time.perf_counter() - t0
    return (res[n2] - res[n1]) / (n2 - n1) * 1e3


def main():
    from multimodal_segmentation_tpu.config import dafnet_chaos
    from multimodal_segmentation_tpu.models import build_model
    from multimodal_segmentation_tpu.train.state import create_train_state
    from multimodal_segmentation_tpu.train.steps import make_steps

    def run_config(dtype):
        conf = dafnet_chaos()
        conf.compute_dtype = dtype
        model = build_model(conf)
        steps = make_steps(model, conf)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        batch = make_batch(conf)
        ms = measure_step_ms(steps, ts, batch)
        return conf.batch_size / (ms / 1e3)

    # Production TPU configuration: bf16 activations (params, BN/VAE/loss
    # math stay f32) and the fused Pallas TPS warp. Learning-quality
    # evidence for this exact configuration: PERF.md round 3 (reference
    # regime run to early stop + Dice parity).
    slices_per_sec = run_config("bfloat16")
    row = {
        "metric": "DAFNet fused train step (gen+3 disc updates), batch 6, 192^2, bf16 activations + Pallas TPS warp, scan-timed on-device",
        "value": round(slices_per_sec, 2),
        "unit": "slices/sec/chip",
        "vs_baseline": round(slices_per_sec / TITAN_V_EST_SLICES_PER_SEC, 2),
        # The ratio compares bf16-activation TPU training to the
        # f32 Titan-V estimate (the reference has no mixed-precision
        # mode to compare against). bf16 is this framework's
        # production training config with measured learning parity
        # (PERF.md: reference-regime run to early stop, 0.99 test
        # Dice); the f32 step time is tracked below / in PERF.md.
        "baseline_precision_note": "bf16 TPU vs f32 Titan-V analytic estimate",
    }
    # Optional f32 row (round-3 advisor note: track precision wins
    # separately from layout wins). Folded into the SAME JSON line so the
    # driver's one-line contract and bf16 parsing stay unchanged; skipped
    # by default because it adds a second multi-minute scan compile.
    if os.environ.get("BENCH_F32"):
        f32 = run_config("float32")
        row["f32_value"] = round(f32, 2)
        row["bf16_vs_f32_speedup"] = round(slices_per_sec / f32, 2)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
