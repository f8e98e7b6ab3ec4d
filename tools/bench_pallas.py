"""Real-TPU validation + microbenchmark of the Pallas kernels vs jnp paths."""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_segmentation_tpu.ops.pallas_kernels import (
    round_ste_pallas,
    tps_bilinear_warp_pallas,
)
from multimodal_segmentation_tpu.ops.rounding import round_ste
from multimodal_segmentation_tpu.ops.tps import control_grid, tps_coefficients, tps_warp


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    r = np.random.RandomState(0)

    # ---- rounding ----
    x = jnp.asarray(r.rand(6, 192, 192, 8).astype(np.float32) * 2)
    jr_ = jax.jit(round_ste)
    jp_ = jax.jit(round_ste_pallas)
    np.testing.assert_allclose(np.asarray(jp_(x)), np.asarray(jr_(x)))
    print("round jnp   : %.4f ms" % (timeit(jr_, x) * 1e3))
    print("round pallas: %.4f ms" % (timeit(jp_, x) * 1e3))

    # ---- warp ----
    vol = jnp.asarray(r.rand(6, 192, 192, 8).astype(np.float32))
    off = jnp.asarray((r.rand(6, 25, 2).astype(np.float32) - 0.5) * 0.05)

    w_jnp = jax.jit(lambda v, o: tps_warp(v, o))
    w_pal = jax.jit(lambda v, o: tps_warp(v, o, use_pallas=True))
    a = np.asarray(w_jnp(vol, off))
    b = np.asarray(w_pal(vol, off))
    err = np.max(np.abs(a - b))
    mean_err = np.mean(np.abs(a - b))
    print("warp jnp vs pallas: max %.2e, mean %.2e" % (err, mean_err))
    # max diff reflects floor() flips where the flow lands within f32
    # epsilon of a pixel boundary; the field must agree on average.
    # ~0.1% of points sit within f32 epsilon of a pixel boundary and can
    # flip their floor() between the two implementations.
    assert mean_err < 2e-3, mean_err
    assert err < 5e-2, err
    print("warp jnp   : %.4f ms" % (timeit(w_jnp, vol, off) * 1e3))
    print("warp pallas: %.4f ms" % (timeit(w_pal, vol, off) * 1e3))


if __name__ == "__main__":
    main()
