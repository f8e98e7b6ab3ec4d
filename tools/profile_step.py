import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import jax, jax.numpy as jnp, numpy as np
from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.ops.tps import tps_warp, tps_sample_locations
from multimodal_segmentation_tpu.ops.augment import rotate_batch

def timeit(fn, *args, iters=20):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

B, H, W, C = 6, 192, 192, 8
r = np.random.RandomState(0)
vol = jnp.asarray(r.rand(B, H, W, C).astype(np.float32))
off = jnp.asarray(r.rand(B, 25, 2).astype(np.float32) * 0.02)

warp = jax.jit(lambda v, o: tps_warp(v, o))
print("tps_warp (B=6,192²,8ch): %.3f ms" % (timeit(warp, vol, off) * 1e3))

flow = jax.jit(lambda o: tps_sample_locations(o, (H, W)))
print("tps_flow only: %.3f ms" % (timeit(flow, off) * 1e3))

rot = jax.jit(rotate_batch)
thetas = jnp.asarray(r.rand(B).astype(np.float32))
x = jnp.asarray(r.rand(B, H, W, 1).astype(np.float32))
print("rotate_batch (1ch): %.3f ms" % (timeit(rot, x, thetas) * 1e3))

# generator update alone vs full step
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps
from bench import make_batch
conf = dafnet_chaos()
model = build_model(conf)
steps = make_steps(model, conf)
ts = create_train_state(model, conf, jax.random.PRNGKey(0))
batch = make_batch(conf)

import functools
def gen_only(ts, batch):
    rng = jax.random.fold_in(ts.rng, ts.step)
    b = dict(batch)
    b["m1"] = b["m1"]; b["m2"] = b["m2"]
    from multimodal_segmentation_tpu.models.base import add_residual
    b["m1"] = add_residual(b["m1"]); b["m2"] = add_residual(b["m2"])
    b["z1"] = jax.random.normal(rng, (6, conf.num_z)); b["z2"] = b["z1"]
    loss_fn = lambda g, d, s, bb, r: model.gen_loss_expert(g, d, s, bb, r, True)
    ts, m = steps._gen_update(ts, b, rng, loss_fn)
    return ts.params['segmentor']
gen_j = jax.jit(gen_only)
print("gen update only: %.3f ms" % (timeit(gen_j, ts, batch, iters=10) * 1e3))

full = steps.step_supervised
def fullstep(ts, batch):
    ts2, m = full(ts, batch)
    return m
# note: donation — run on fresh ts copies is awkward; time via loop reusing ts
full(ts, batch)
t0 = time.perf_counter()
for _ in range(10):
    ts, m = full(ts, batch)
jax.block_until_ready(ts.params)
print("full fused step: %.3f ms" % ((time.perf_counter() - t0) / 10 * 1e3))
