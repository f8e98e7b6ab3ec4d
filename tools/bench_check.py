import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, numpy as np
from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps
from bench import make_batch

conf = dafnet_chaos()
conf.compute_dtype = os.environ.get("MMSEG_BENCH_DTYPE", "float32")
print("compute_dtype:", conf.compute_dtype)
model = build_model(conf)
steps = make_steps(model, conf)
ts = create_train_state(model, conf, jax.random.PRNGKey(0))
batch = make_batch(conf)

t0 = time.perf_counter()
ts, m = steps.step_supervised(ts, batch)
jax.block_until_ready(ts.params)
print("compile+first: %.1f s" % (time.perf_counter() - t0))

# per-iteration blocking
times = []
for i in range(12):
    t0 = time.perf_counter()
    ts, m = steps.step_supervised(ts, batch)
    jax.block_until_ready(ts.params)
    times.append(time.perf_counter() - t0)
print("per-iter blocked (ms):", ["%.1f" % (t*1e3) for t in times])
print("median %.1f ms -> %.1f slices/sec" % (np.median(times)*1e3, 6/np.median(times)))
