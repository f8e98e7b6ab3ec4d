"""Real-TPU smoke gate: compile + run every Pallas entry point at PRODUCTION
shapes, then compile the fused DAFNet train step.

MANDATORY before landing any kernel or train-step change (VERDICT r4: two
rounds in a row, interpret-mode-only tests missed Mosaic behaviour — the
round-3 relayout near-miss and the round-4 scoped-VMEM OOM that left HEAD
unable to compile). Interpret mode on CPU checks VALUES; only the real
backend checks Mosaic lowering, scoped-VMEM fit and matmul precision.

Run: `make tpu-smoke` (exits non-zero on any failure; <10 min warm thanks
to the persistent compile cache shared with bench.py).

Covered entry points and why these shapes:
  * round_ste on (12,192,192,8)       — anatomy maps, both modalities.
  * tps_bilinear_warp fwd+bwd (12,192,192,8), bf16-blend and f32 —
    the fused train step warps both fusion directions in ONE call (B=12);
    eval uses the f32-HIGHEST blend.
  * nearest_warp at C in {2,4,6,8,10} — every channel count the on-device
    rotation augmentation concatenates to (C=10 is the round-4 OOM shape:
    x1+x2+m1+m2 of the supervised labelled path; C=4 is MMSDNet's solo
    mask-pool rotation).
  * fused supervised DAFNet step at the production bench config.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def check(name, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001 - report and fail the gate
        print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:300]}")
        return False
    print(f"ok    {name}  ({time.time() - t0:.1f}s)")
    return True


def main():
    if jax.default_backend() != "tpu":
        print("tpu_smoke must run on the real TPU backend, got:",
              jax.default_backend())
        return 1

    from multimodal_segmentation_tpu.ops import augment
    from multimodal_segmentation_tpu.ops.rounding import round_ste
    from multimodal_segmentation_tpu.ops.tps import tps_warp

    ok = True
    key = jax.random.PRNGKey(0)

    # ---- round STE (anatomy-map shape, fwd+bwd) ----
    s = jax.random.uniform(key, (12, 192, 192, 8))
    ok &= check(
        "round_ste fwd+bwd (12,192,192,8)",
        lambda: jax.jit(jax.grad(lambda x: jnp.sum(round_ste(x) ** 2)))(s),
    )

    # ---- fused TPS bilinear warp, fwd+bwd, both blend precisions ----
    cp = jax.random.normal(jax.random.PRNGKey(1), (12, 25, 2)) * 0.05

    for bf16 in (True, False):
        tag = "bf16-blend" if bf16 else "f32-blend"

        def warp_loss(vol, off, bf16=bf16):
            return jnp.sum(
                tps_warp(vol, off, use_pallas=True, blend_bf16=bf16) ** 2
            )

        ok &= check(
            f"tps_bilinear_warp fwd+bwd {tag} (12,192,192,8)",
            lambda f=warp_loss: jax.jit(jax.grad(f, argnums=(0, 1)))(s, cp),
        )

    # ---- nearest-warp rotation at every production channel count ----
    th = augment.random_rotation_angles(jax.random.PRNGKey(2), 6)
    for C in (2, 4, 6, 8, 10):
        vol = jax.random.normal(jax.random.PRNGKey(3), (6, 192, 192, C))
        ok &= check(
            f"nearest_warp rotation C={C} (6,192,192,{C})",
            lambda v=vol: jax.jit(
                lambda x, t: augment.rotate_batch(x, t, impl="pallas")
            )(v, th),
        )

    # ---- fused supervised DAFNet steps (expert + automated) at the
    # production bench config ----
    def fused_step(automated=False):
        from bench import make_batch
        from multimodal_segmentation_tpu.config import dafnet_chaos
        from multimodal_segmentation_tpu.models import build_model
        from multimodal_segmentation_tpu.train.state import create_train_state
        from multimodal_segmentation_tpu.train.steps import make_steps

        conf = dafnet_chaos()
        conf.compute_dtype = "bfloat16"
        conf.automatedpairing = automated
        model = build_model(conf)
        steps = make_steps(model, conf)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        batch = make_batch(conf)
        if automated:
            H, W = conf.input_hw
            r = np.random.RandomState(1)
            for k in ("x1_pairs", "x2_pairs"):
                batch[k] = jnp.asarray(
                    r.rand(conf.batch_size, H, W, conf.n_pairs).astype(np.float32)
                )
            del batch["x1"], batch["x2"]
        ts, metrics = steps.step_supervised(ts, batch)
        loss = float(np.asarray(metrics["loss"]))
        assert np.isfinite(loss), loss
        return metrics["loss"]

    ok &= check("fused supervised DAFNet step (bf16, rotation on)", fused_step)
    ok &= check(
        "fused automated-pairing step (bf16, C=14 rotation concat)",
        lambda: fused_step(automated=True),
    )

    print("tpu_smoke:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
