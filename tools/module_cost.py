"""Per-module fwd+bwd HBM-traffic budget at the bench shapes.

Compiles each DAFNet component's forward+backward (value_and_grad of a
sum-of-squares head) separately at the shapes it sees inside the fused
bench step, and prints XLA cost-analysis bytes/flops. This attributes the
step's ~GB-scale traffic to modules so optimization goes where the bytes
are.

Usage: python tools/module_cost.py [float32|bfloat16]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multimodal_segmentation_tpu.config import dafnet_chaos
from multimodal_segmentation_tpu.models import build_model


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c.get("bytes accessed", 0.0), c.get("flops", 0.0)


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    conf = dafnet_chaos()
    conf.compute_dtype = dtype
    model = build_model(conf)
    ts_rng = jax.random.PRNGKey(0)
    params, state = model.init(ts_rng)
    B, (H, W) = conf.batch_size, conf.input_hw
    sc = conf.anatomy_encoder.out_channels
    r = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(r.rand(*s), jnp.float32)

    x1, x2 = f(B, H, W, 1), f(B, H, W, 1)
    s4 = f(4 * B, H, W, sc)   # segmentor group batch in gen loss
    s2b = f(2 * B, H, W, sc)
    z6 = f(6 * B, conf.num_z)
    s6 = f(6 * B, H, W, sc)
    m4 = f(4 * B, H, W, conf.num_masks)
    x12 = f(2 * B, H, W, 1)

    rows = []

    def bwd_of(apply_fn, wrt_params, *args):
        def loss(p, *a):
            out = apply_fn(p, *a)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
        return jax.value_and_grad(loss)(wrt_params, *args)

    cs = model.components

    # anatomy encoder fwd+bwd (train mode, grouped BN)
    def ae(p, a, b):
        (o1, o2), _, _ = cs.apply("enc_anatomy", {**params, "enc_anatomy": p["enc_anatomy"]}, state, a, b, train=True, update_state=True)
        return (o1, o2)
    rows.append(("enc_anatomy fwd+bwd (B=6x2)",) + cost(lambda p, a, b: bwd_of(ae, p, a, b)[0], {"enc_anatomy": params["enc_anatomy"]}, x1, x2))
    rows.append(("enc_anatomy fwd only (eval, pools)",) + cost(lambda a, b: cs.apply("enc_anatomy", params, state, a, b)[0], x1, x2))

    # segmentor on the 4-way group batch
    def seg(p, s):
        m, _, _ = cs.apply("segmentor", {**params, "segmentor": p["segmentor"]}, state, s, train=True, update_state=True, groups=4)
        return m
    rows.append(("segmentor fwd+bwd (B=24)",) + cost(lambda p, s: bwd_of(seg, p, s)[0], {"segmentor": params["segmentor"]}, s4))
    rows.append(("segmentor fwd only (pools B=24)",) + cost(lambda s: cs.apply("segmentor", params, state, s)[0], s4))

    # decoder on the 6-way group batch
    def dec(p, s, z):
        y, _, _ = cs.apply("decoder", {**params, "decoder": p["decoder"]}, state, s, z, train=True)
        return y
    rows.append(("decoder fwd+bwd (B=36)",) + cost(lambda p, s, z: bwd_of(dec, p, s, z)[0], {"decoder": params["decoder"]}, s6, z6))

    # modality encoder on 2-way
    def me(p, s, x):
        out, _, _ = cs.apply("enc_modality", {**params, "enc_modality": p["enc_modality"]}, state, s, x, train=True, rngs={"sample": jax.random.PRNGKey(1)})
        return out[:3]
    rows.append(("enc_modality fwd+bwd (B=12)",) + cost(lambda p, s, x: bwd_of(me, p, s, x)[0], {"enc_modality": params["enc_modality"]}, s2b, x12))

    # fuser (locnet + TPS warp) on 2-way
    def fu(p, a, b):
        out, _, _ = cs.apply("fuser", {**params, "fuser": p["fuser"]}, state, a, b, train=True)
        return out
    rows.append(("fuser fwd+bwd (B=12)",) + cost(lambda p, a, b: bwd_of(fu, p, a, b)[0], {"fuser": params["fuser"]}, s2b, s2b))

    # discriminators
    def dm(p, m):
        out, _, _ = cs.apply("d_mask", {**params, "d_mask": p["d_mask"]}, state, m, collect_spectral=True)
        return out
    rows.append(("d_mask fwd+bwd (B=24)",) + cost(lambda p, m: bwd_of(dm, p, m)[0], {"d_mask": params["d_mask"]}, m4))
    def di(p, x):
        out, _, _ = cs.apply("d_image1", {**params, "d_image1": p["d_image1"]}, state, x, collect_spectral=True)
        return out
    rows.append(("d_image1 fwd+bwd (B=12)",) + cost(lambda p, x: bwd_of(di, p, x)[0], {"d_image1": params["d_image1"]}, x12))

    print("%-38s %12s %12s" % ("module", "GB accessed", "GFLOP"))
    tot_b = 0.0
    for name, b, fl in rows:
        tot_b += b
        print("%-38s %12.2f %12.1f" % (name, b / 1e9, fl / 1e9))
    print("%-38s %12.2f" % ("TOTAL (listed)", tot_b / 1e9))


if __name__ == "__main__":
    main()
