"""Drill into the AnatomyFuser's 119 GB/step: cost per subpart.

Usage: python tools/fuser_cost.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multimodal_segmentation_tpu.ops.tps import (
    tps_warp, tps_sample_locations, _tps_warp_jnp,
)
from multimodal_segmentation_tpu.ops.resample import bilinear_sample


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c.get("bytes accessed", 0.0) / 1e9, c.get("flops", 0.0) / 1e9


B, H, W, C = 12, 192, 192, 8
r = np.random.RandomState(0)
vol = jnp.asarray(r.rand(B, H, W, C), jnp.float32)
off = jnp.asarray(r.rand(B, 25, 2) * 0.02, jnp.float32)
locs = jnp.asarray(r.rand(B, H * W, 2) * 191, jnp.float32)
g = jnp.asarray(r.rand(B, H, W, C), jnp.float32)

rows = []


def sumsq(x):
    return jnp.sum(jnp.square(x))


rows.append(("tps_sample_locations fwd",) + cost(
    lambda o: tps_sample_locations(o, (H, W)), off))
rows.append(("tps_sample_locations fwd+bwd",) + cost(
    jax.grad(lambda o: sumsq(tps_sample_locations(o, (H, W)))), off))
rows.append(("bilinear warp fwd (jnp)",) + cost(
    lambda v, l: jax.vmap(bilinear_sample)(v, l), vol, locs))
rows.append(("bilinear warp fwd+bwd (jnp)",) + cost(
    jax.grad(lambda v, l: sumsq(jax.vmap(bilinear_sample)(v, l)), argnums=(0, 1)),
    vol, locs))
rows.append(("tps_warp fwd (jnp)",) + cost(lambda v, o: _tps_warp_jnp(v, o), vol, off))
rows.append(("tps_warp fwd+bwd (jnp)",) + cost(
    jax.grad(lambda v, o: sumsq(_tps_warp_jnp(v, o)), argnums=(0, 1)), vol, off))
rows.append(("tps_warp fwd+bwd (pallas)",) + cost(
    jax.grad(lambda v, o: sumsq(tps_warp(v, o, use_pallas=True)), argnums=(0, 1)),
    vol, off))

print("%-34s %10s %10s" % ("part", "GB", "GFLOP"))
for name, b, fl in rows:
    print("%-34s %10.2f %10.1f" % (name, b, fl))
