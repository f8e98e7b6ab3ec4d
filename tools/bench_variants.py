"""Measure fused-step time for config variants (scan-differenced, on-device).

Usage: python tools/bench_variants.py [dtype ...]   (default: bfloat16 float32)

Prints ms/step and slices/s for each variant. Uses the persistent
compilation cache if JAX_COMPILATION_CACHE_DIR is set.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import make_batch, measure_step_ms
from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps


def main():
    dtypes = sys.argv[1:] or ["bfloat16", "float32"]
    for dtype in dtypes:
        conf = dafnet_chaos()
        conf.compute_dtype = dtype
        model = build_model(conf)
        steps = make_steps(model, conf)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        batch = make_batch(conf)
        ms = measure_step_ms(steps, ts, batch)
        print(
            "%-10s %8.1f ms/step  %6.1f slices/s/chip"
            % (dtype, ms, conf.batch_size / (ms / 1e3)),
            flush=True,
        )


if __name__ == "__main__":
    main()
