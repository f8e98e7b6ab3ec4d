"""Scan-differenced timing of the TPS warp paths (jnp gather vs Pallas).

Usage: python tools/time_warp.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multimodal_segmentation_tpu.ops.tps import tps_warp


def timed(make_body, x0, n1=4, n2=24):
    res = {}
    for n in (n1, n2):
        @jax.jit
        def many(x):
            def body(c, _):
                return make_body(c), None
            c, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(c[0]) if isinstance(c, tuple) else jnp.sum(c)
        float(np.asarray(many(x0)))
        t0 = time.perf_counter()
        float(np.asarray(many(x0)))
        res[n] = time.perf_counter() - t0
    return (res[n2] - res[n1]) / (n2 - n1) * 1e3


B, H, W, C = 12, 192, 192, 8
r = np.random.RandomState(0)
vol = jnp.asarray(r.rand(B, H, W, C), jnp.float32)
off = jnp.asarray(r.rand(B, 25, 2) * 0.02, jnp.float32)


def fwd_jnp(v):
    return tps_warp(v, off) * 0.999  # keep scan carry same shape


def fwd_pallas(v):
    return tps_warp(v, off, use_pallas=True) * 0.999


def fwd_pallas_bf16(v):
    return tps_warp(v, off, use_pallas=True, blend_bf16=True) * 0.999


def bwd_pallas_bf16(c):
    v, o = c
    gv, go = jax.grad(
        lambda vv, oo: jnp.sum(
            jnp.square(tps_warp(vv, oo, use_pallas=True, blend_bf16=True))
        ),
        argnums=(0, 1),
    )(v, o)
    return (v - 1e-6 * gv, o - 1e-6 * go)


def bwd_jnp(c):
    v, o = c
    gv, go = jax.grad(
        lambda vv, oo: jnp.sum(jnp.square(tps_warp(vv, oo))), argnums=(0, 1)
    )(v, o)
    return (v - 1e-6 * gv, o - 1e-6 * go)


def bwd_pallas(c):
    v, o = c
    gv, go = jax.grad(
        lambda vv, oo: jnp.sum(jnp.square(tps_warp(vv, oo, use_pallas=True))),
        argnums=(0, 1),
    )(v, o)
    return (v - 1e-6 * gv, o - 1e-6 * go)


print("warp fwd jnp        : %7.2f ms" % timed(fwd_jnp, vol), flush=True)
print("warp fwd pallas     : %7.2f ms" % timed(fwd_pallas, vol), flush=True)
print("warp fwd pallas bf16: %7.2f ms" % timed(fwd_pallas_bf16, vol), flush=True)
print("warp fwd+bwd jnp    : %7.2f ms" % timed(bwd_jnp, (vol, off)), flush=True)
print("warp fwd+bwd pal    : %7.2f ms" % timed(bwd_pallas, (vol, off)), flush=True)
print("warp fwd+bwd pal b16: %7.2f ms" % timed(bwd_pallas_bf16, (vol, off)), flush=True)

# numerics: pallas bf16 vs jnp f32
ref = tps_warp(vol, off)
out = tps_warp(vol, off, use_pallas=True, blend_bf16=True)
print("max |pallas_bf16 - jnp_f32|:", float(jnp.max(jnp.abs(ref - out))))
