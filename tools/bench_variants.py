"""Measure fused-step time for config variants (scan-differenced, on-device).

Usage:
    python tools/bench_variants.py [spec ...]

Each spec is dtype[:decoder[:batch]], e.g.
    bfloat16            # film decoder, batch 6
    bfloat16:spade      # SPADE decoder variant (dafnet_spade_chaos)
    bfloat16:film:24    # batch-scaling row
Default specs: bfloat16 float32.

Prints ms/step, slices/s, and MFU (XLA cost-analysis FLOPs / time /
197 TFLOP/s bf16 peak for v5e). Uses the persistent compilation cache if
JAX_COMPILATION_CACHE_DIR is set.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import jax
import numpy as np

from bench import make_batch, measure_step_ms
from multimodal_segmentation_tpu.config import dafnet_chaos, dafnet_spade_chaos
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps

V5E_BF16_PEAK = 197e12  # FLOP/s


def run_mmsdnet(dtype, batch):
    """MMSDNet full batch = fused gen+z-regressor step + the mask-D step
    (model_executors/mmsdnet_executor.py:242-331)."""
    import time

    from multimodal_segmentation_tpu.config import mmsdnet_chaos

    conf = mmsdnet_chaos()
    conf.compute_dtype = dtype
    conf.batch_size = batch
    model = build_model(conf)
    steps = make_steps(model, conf)
    ts = create_train_state(model, conf, jax.random.PRNGKey(0))
    b = make_batch(conf)
    r = np.random.RandomState(2)
    H, W = conf.input_hw
    b["dm"] = jax.numpy.asarray(
        (r.rand(batch, H, W, conf.num_masks) > 0.8).astype(np.float32)
    )

    def make(n):
        @jax.jit
        def many(ts, b):
            def body(ts, _):
                ts, m = steps._gen_and_zreg(ts, b, supervised=True)
                ts, _ = steps._d_step(ts, b)
                return ts, m["loss"]

            ts, losses = jax.lax.scan(body, ts, None, length=n)
            return losses[-1]

        return many

    res = {}
    for n in (2, 12):
        f = make(n)
        float(np.asarray(f(ts, b)))
        t0 = time.perf_counter()
        float(np.asarray(f(ts, b)))
        res[n] = time.perf_counter() - t0
    ms = (res[12] - res[2]) / 10 * 1e3
    print(
        "%-22s %8.1f ms/step %7.1f slices/s/chip  (gen+zreg+maskD batch)"
        % ("mmsdnet:" + dtype, ms, batch / (ms / 1e3)),
        flush=True,
    )


def run(spec):
    parts = spec.split(":")
    dtype = parts[0]
    decoder = parts[1] if len(parts) > 1 else "film"
    batch = int(parts[2]) if len(parts) > 2 else 6
    flags = parts[3:] if len(parts) > 3 else []
    if decoder == "mmsdnet":
        return run_mmsdnet(dtype, batch)
    conf = dafnet_spade_chaos() if decoder == "spade" else dafnet_chaos()
    conf.compute_dtype = dtype
    conf.batch_size = batch
    if "remat" in flags:
        conf.remat_convs = True
    if "jnpwarp" in flags:
        conf.tps_impl = "jnp"
    if "jnprot" in flags:
        # A/B the on-device rotation path (ops/augment.py env override)
        os.environ["MMSEG_ROTATE_IMPL"] = "jnp"
    else:
        os.environ.pop("MMSEG_ROTATE_IMPL", None)
    automated = "automated" in flags
    if automated:
        conf.automatedpairing = True
    model = build_model(conf)
    steps = make_steps(model, conf)
    ts = create_train_state(model, conf, jax.random.PRNGKey(0))
    batch_d = make_batch(conf)
    if automated:
        r = np.random.RandomState(1)
        H, W = conf.input_hw
        for k in ("x1_pairs", "x2_pairs"):
            batch_d[k] = jax.numpy.asarray(
                r.rand(conf.batch_size, H, W, conf.n_pairs).astype(np.float32)
            )
        del batch_d["x1"], batch_d["x2"]

    # FLOPs of one step from cost analysis (for MFU)
    fn = jax.jit(
        functools.partial(steps._step, supervised=True, automated=automated),
        donate_argnums=(0,),
    )
    ca = fn.lower(ts, batch_d).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    gbytes = ca.get("bytes accessed", 0.0) / 1e9

    ms = measure_step_ms(steps, ts, batch_d, automated=automated)
    mfu = flops / (ms / 1e3) / V5E_BF16_PEAK
    print(
        "%-22s %8.1f ms/step %7.1f slices/s/chip  %5.2f TFLOP %7.1f GB  MFU %5.1f%%"
        % (spec, ms, conf.batch_size / (ms / 1e3), flops / 1e12, gbytes,
           100 * mfu),
        flush=True,
    )


def main():
    specs = sys.argv[1:] or ["bfloat16", "float32"]
    for s in specs:
        run(s)


if __name__ == "__main__":
    main()
