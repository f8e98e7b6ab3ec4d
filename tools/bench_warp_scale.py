"""TPS-warp jnp-vs-Pallas benchmark at volumetric scale (VERDICT r1 item 7).

The Pallas warp kernel exists for the large-volume regime where XLA's
gather (forward) and especially scatter (backward) degrade; at CHAOS size
the whole TPS machinery is <1% of the train step (PERF.md). This tool
measures forward and forward+grad at CHAOS size and at 3-D-regime sizes
(a full 24-slice volume warped slice-wise; a 384x384 field), jnp vs
Pallas, with scan-differenced timing (the only honest method on the
remote-dispatch backend — see bench.py).

Usage: python tools/bench_warp_scale.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_segmentation_tpu.ops.tps import tps_warp


def scan_time_ms(fn, args, n1=2, n2=12):
    """Time fn(*args) inside a jitted lax.scan, differenced across two
    lengths; the carry feeds each iteration so steps chain on-device."""

    def make(n):
        @jax.jit
        def many(vol, off):
            def body(carry, _):
                out = fn(carry, off)
                # keep the carry shape: re-use the output as next input
                return out, ()

            out, _ = jax.lax.scan(body, vol, None, length=n)
            return jnp.sum(out)

        return many

    res = {}
    for n in (n1, n2):
        f = make(n)
        float(np.asarray(f(*args)))  # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(f(*args)))
        res[n] = time.perf_counter() - t0
    return (res[n2] - res[n1]) / (n2 - n1) * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.RandomState(0)

    cases = [
        ("CHAOS step shape", (6, 192, 192, 8)),
        ("3-D volume slice-wise", (24, 192, 192, 8)),
        ("large field", (6, 384, 384, 8)),
    ]

    for name, shape in cases:
        B, H, W, C = shape
        vol = jnp.asarray(r.rand(*shape).astype(np.float32))
        off = jnp.asarray((r.rand(B, 25, 2).astype(np.float32) - 0.5) * 0.05)

        fwd_jnp = lambda v, o: tps_warp(v, o)
        fwd_pal = lambda v, o: tps_warp(v, o, use_pallas=True)

        # value+grad wrt vol AND offsets (the training signal path);
        # returns a vol-shaped array so it can chain through the scan carry
        def make_step(fwd):
            def step(v, o):
                def loss(v, o):
                    return jnp.sum(fwd(v, o) ** 2)

                gv, go = jax.grad(loss, argnums=(0, 1))(v, o)
                return v - 1e-6 * gv + jnp.mean(go)

            return step

        # correctness cross-check at this scale (mean; floor() flips at
        # pixel-boundary points keep max loose — see tools/bench_pallas.py)
        a = np.asarray(jax.jit(fwd_jnp)(vol, off))
        b = np.asarray(jax.jit(fwd_pal)(vol, off))
        mean_err = float(np.mean(np.abs(a - b)))
        assert mean_err < 2e-3, (name, mean_err)

        rows = [
            ("fwd  jnp   ", fwd_jnp, (vol, off)),
            ("fwd  pallas", fwd_pal, (vol, off)),
            ("grad jnp   ", make_step(fwd_jnp), (vol, off)),
            ("grad pallas", make_step(fwd_pal), (vol, off)),
        ]
        print("\n== %s %s  (fwd mean|diff| %.1e) ==" % (name, shape, mean_err),
              flush=True)
        for label, fn, args in rows:
            try:
                ms = scan_time_ms(fn, args)
                print("  %s %8.3f ms" % (label, ms), flush=True)
            except Exception as e:  # VMEM overflow at extreme shapes etc.
                print("  %s FAILED: %s" % (label, str(e)[:120]), flush=True)


if __name__ == "__main__":
    main()
