"""Cost-split of the fused DAFNet step: generator update vs discriminator
updates vs full step, XLA cost-analysis bytes + scan-timed ms.

The round-4 question: tools/module_cost.py sums ~28 GB over all component
fwd+bwds, but the full fused step reports 89.5 GB accessed — this tool
locates where the composite's extra traffic lives (gen composite backward
vs disc phase vs step glue) by compiling each phase separately.

Usage: python tools/phase_cost.py [float32|bfloat16] [--time]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import make_batch
from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c.get("bytes accessed", 0.0) / 1e9, c.get("flops", 0.0) / 1e12


def scan_time_ms(fn_step, ts, batch, n1=2, n2=10):
    def make(n):
        @jax.jit
        def many(ts, batch):
            def body(ts, _):
                ts, m = fn_step(ts, batch)
                return ts, m["loss"] if "loss" in m else list(m.values())[0]
            ts, losses = jax.lax.scan(body, ts, None, length=n)
            return losses[-1]
        return many
    res = {}
    for n in (n1, n2):
        f = make(n)
        float(np.asarray(f(ts, batch)))
        t0 = time.perf_counter()
        float(np.asarray(f(ts, batch)))
        res[n] = time.perf_counter() - t0
    return (res[n2] - res[n1]) / (n2 - n1) * 1e3


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    do_time = "--time" in sys.argv
    conf = dafnet_chaos()
    conf.compute_dtype = dtype
    model = build_model(conf)
    steps = make_steps(model, conf)
    ts = create_train_state(model, conf, jax.random.PRNGKey(0))
    batch = make_batch(conf)
    rng = jax.random.PRNGKey(1)

    # phase fns mirror DAFNetSteps._step's pieces (train/steps.py)
    def gen_only(ts, batch):
        r_gen = jax.random.fold_in(ts.rng, 0)
        b = dict(batch)
        from multimodal_segmentation_tpu.models.base import add_residual
        b["m1"] = add_residual(b["m1"])
        b["m2"] = add_residual(b["m2"])
        B = b["x1"].shape[0]
        b["z1"] = jax.random.normal(r_gen, (B, conf.num_z))
        b["z2"] = jax.random.normal(r_gen, (B, conf.num_z))
        loss_fn = lambda g, d, s, bb, r: model.gen_loss_expert(g, d, s, bb, r, True)
        ts, m = steps._gen_update(ts, b, r_gen, loss_fn)
        return ts, m

    def pools_only(ts, batch):
        r = jax.random.fold_in(ts.rng, 1)
        out = model.make_fake_pools(ts.params, ts.model_state, batch["dx1"], batch["dx2"], r)
        return ts, {"loss": sum(jnp.sum(o.astype(jnp.float32)) for o in out)}

    def disc_only(ts, batch):
        nm = conf.num_masks
        r = jax.random.fold_in(ts.rng, 2)
        fm1, fm2, fy1, fy2 = model.make_fake_pools(
            ts.params, ts.model_state, batch["dx1"], batch["dx2"], r)
        ts, m1 = steps._disc_update(
            ts, batch, r,
            lambda d, o, s, b, rr: model.d_mask_pair_loss(d, o, s, b["dm1"][..., :nm], fm1),
            ("d_mask",))
        ts, m2 = steps._disc_update(
            ts, batch, r,
            lambda d, o, s, b, rr: model.d_mask_pair_loss(d, o, s, b["dm2"][..., :nm], fm2),
            ("d_mask",))
        ts, m3 = steps._disc_update(
            ts, batch, r,
            lambda d, o, s, b, rr: model.d_image_pair_loss(d, o, s, b["dx1"], b["dx2"], fy1, fy2),
            ("d_image1", "d_image2"))
        return ts, {"loss": m1["dis_M"] + m3["dis_X1"]}

    def full(ts, batch):
        return steps._step(ts, batch, supervised=True, automated=False)

    def aug_only(ts, batch):
        r = jax.random.fold_in(ts.rng, 3)
        from multimodal_segmentation_tpu.ops.augment import random_rotate_batch
        arrs = random_rotate_batch(r, [batch["x1"], batch["x2"], batch["m1"], batch["m2"]], conf.rotation_range)
        return ts, {"loss": sum(jnp.sum(a.astype(jnp.float32)) for a in arrs)}

    batch_res = {"m1": batch["m1"], "m2": batch["m2"]}
    rows = []
    for name, fn in [
        ("augment (4 arrays)", aug_only),
        ("fake pools (eval fwd)", pools_only),
        ("gen update (fwd+bwd+adam)", gen_only),
        ("disc updates (pools+3 adam)", disc_only),
        ("FULL fused step", full),
    ]:
        gb, tf = cost(fn, ts, batch)
        row = [name, gb, tf]
        if do_time:
            row.append(scan_time_ms(fn, ts, batch))
        rows.append(row)
        print("%-30s %8.2f GB  %6.2f TFLOP%s" % (
            name, gb, tf, ("  %7.1f ms" % row[3]) if do_time else ""))


if __name__ == "__main__":
    main()
