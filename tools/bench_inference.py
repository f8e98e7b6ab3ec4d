"""p50 per-volume inference latency (BASELINE.md north-star metric 3).

On this remote-tunnel backend, per-call host timing measures either
dispatch pipelining (too fast) or the mask download through the relay
(too slow). True on-device latency: chain N predicts through a scalar
data dependency (each call consumes the previous output), block once,
divide.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model

conf = dafnet_chaos()
model = build_model(conf)
params, state = model.init(jax.random.PRNGKey(0))

V = 24  # padded volume length (max CHAOS volume is ~27 aligned slices)
r = np.random.RandomState(0)
x1 = jnp.asarray(r.rand(V, 192, 192, 1).astype(np.float32))
x2 = jnp.asarray(r.rand(V, 192, 192, 1).astype(np.float32))

N = 20

for ftype in ("simple", "def", "max"):
    @jax.jit
    def chained(x1, x2):
        carry = jnp.float32(0.0)
        for _ in range(N):
            # non-foldable dependency on BOTH inputs so CSE/DCE cannot
            # collapse iterations or prune either encoder
            m = model.predict_mask(
                params, state, 1, ftype, [x1 + carry, x2 + carry]
            )
            carry = 1e-20 * jnp.mean(m)
        return m

    jax.block_until_ready(chained(x1, x2))  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(x1, x2))
        times.append((time.perf_counter() - t0) / N)
    print("%s: p50 %.2f ms / %d-slice volume (on-device, %d-chained)"
          % (ftype, np.percentile(times, 50) * 1e3, V, N))
