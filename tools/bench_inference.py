"""p50 per-volume inference latency (BASELINE.md north-star metric 3).

Timing forces a device->host copy of the predicted masks each iteration
(np.asarray) — on the remote-dispatch backend block_until_ready alone can
return before the computation is observable.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model

conf = dafnet_chaos()
model = build_model(conf)
params, state = model.init(jax.random.PRNGKey(0))
predict = jax.jit(model.predict_mask, static_argnums=(2, 3))

V = 24  # padded volume length (max CHAOS volume is ~27 aligned slices)
r = np.random.RandomState(0)
vols = [
    [jnp.asarray(r.rand(V, 192, 192, 1).astype(np.float32)) for _ in range(2)]
    for _ in range(8)
]

for ftype in ("simple", "def", "max"):
    np.asarray(predict(params, state, 1, ftype, vols[0]))  # compile
    times = []
    for i in range(24):
        t0 = time.perf_counter()
        out = np.asarray(predict(params, state, 1, ftype, vols[i % 8]))
        times.append(time.perf_counter() - t0)
    print(
        "%s: p50 %.2f ms / %d-slice volume (host round-trip incl. %.1f MB copy)"
        % (ftype, np.percentile(times, 50) * 1e3, V, out.nbytes / 1e6)
    )
