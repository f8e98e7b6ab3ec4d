"""Measure the fused DAFNet step at f32 vs bf16 (bf16-storage norms),
scan-differenced on-device timing (same method as bench.py)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

from bench import make_batch, measure_step_ms
from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps


def run(compute_dtype):
    conf = dafnet_chaos()
    conf.compute_dtype = compute_dtype
    model = build_model(conf)
    steps = make_steps(model, conf)
    ts = create_train_state(model, conf, jax.random.PRNGKey(0))
    batch = make_batch(conf)
    ms = measure_step_ms(steps, ts, batch)
    print("%s: %.1f ms/batch -> %.2f slices/s" % (compute_dtype, ms, conf.batch_size / (ms / 1e3)), flush=True)
    return ms


if __name__ == "__main__":
    which = sys.argv[1:] or ["float32", "bfloat16"]
    for d in which:
        run(d)
