"""Full-shape multi-chip compile + collective audit (VERDICT r3 item 3).

Lowers the PRODUCTION DAFNet fused train step — 192x192, bf16 activations,
per-device batch 6 (global 48 on 8 devices) — over virtual 8-device meshes
and asserts the HLO collective inventory:

* pure data parallelism: gradient/BN synchronisation all-reduces ONLY —
  no all-gathers, no all-to-alls, nothing activation-sized on the wire;
* DP x TP ('data' 4 x 'model' 2): all-gathers may appear only for the
  'model'-sharded parameter leaves (weights/optimizer), never for
  (B, H, W, C) activations;
* volumetric ('data' x 'space'): conv halo exchange = collective-permutes
  (+ grad all-reduces); no all-to-alls, no activation-sized all-gathers.

Compile-only (no execution), so full production shapes fit on the CPU
test backend. Reference workload being sharded:
model_executors/dafnet_executor.py:369-583.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_segmentation_tpu.parallel.audit import (
    activation_sized,
    collective_inventory,
    summarize,
)

pytestmark = pytest.mark.slow


def _require_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")


def _production_step_hlo(n_data, n_model, automated=False, decoder=None):
    from bench import make_batch
    from multimodal_segmentation_tpu.config import dafnet_chaos
    from multimodal_segmentation_tpu.models import build_model
    from multimodal_segmentation_tpu.parallel.mesh import make_mesh, shard_batch
    from multimodal_segmentation_tpu.parallel.sharding import tp_shard_train_state
    from multimodal_segmentation_tpu.train.state import create_train_state
    from multimodal_segmentation_tpu.train.steps import make_steps

    conf = dafnet_chaos()
    conf.compute_dtype = "bfloat16"
    # per-device batch 6 = the parity workload per chip
    conf.batch_size = 6 * n_data
    conf.automatedpairing = automated
    if decoder is not None:
        conf.decoder_type = decoder
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    model = build_model(conf)
    steps = make_steps(model, conf, mesh=mesh)
    ts = create_train_state(model, conf, jax.random.PRNGKey(0))
    if n_model > 1:
        ts = tp_shard_train_state(mesh, ts, min_features=256)
    batch = make_batch(conf)
    if automated:
        B, (H, W) = conf.batch_size, conf.input_hw
        r = np.random.RandomState(1)
        for k in ("x1_pairs", "x2_pairs"):
            batch[k] = jnp.asarray(
                r.rand(B, H, W, conf.n_pairs).astype(np.float32)
            )
        batch.pop("x1"), batch.pop("x2")
    batch = shard_batch(mesh, batch)
    compiled = steps.step_supervised.lower(ts, batch).compile()
    return compiled.as_text()


class TestProductionShardingCollectives:
    def test_data_parallel_8(self):
        """DP over 8 devices: all-reduces only (grads + metric reductions);
        GSPMD must not move activations between chips."""
        _require_8()
        inv = collective_inventory(_production_step_hlo(8, 1))
        print("\nDP(8) collectives:\n" + summarize(inv))
        assert inv["count"]["all-reduce"] > 0, "no gradient all-reduces found"
        # scalar-control all-gathers (sub-MB) are tolerated; anything bigger
        # means an activation or parameter moved that should not have
        assert inv["bytes"]["all-gather"] < 2e6, (
            "pure DP must not all-gather:\n" + summarize(inv)
        )
        assert inv["count"]["all-to-all"] == 0
        assert inv["count"]["collective-permute"] == 0, (
            "batch-axis resharding detected — a concat/split broke the "
            "interleaved stacking invariant (ops/batching.py):\n"
            + summarize(inv)
        )
        assert inv["count"]["reduce-scatter"] == 0
        for op in inv["ops"]:
            assert not activation_sized(op["shapes"]), (
                "activation-sized collective: %r" % (op,)
            )

    @pytest.mark.parametrize(
        "automated,decoder",
        [(True, None), (False, "spade")],
        ids=["automated-pairing", "spade-decoder"],
    )
    def test_data_parallel_8_variants(self, automated, decoder):
        """The automated-pairing and SPADE-decoder supervised steps must be
        all-reduce-only under pure DP, same as the expert FiLM step
        (VERDICT r4 item 7: the batched automated rewrite is exactly the
        kind of change that can reintroduce batch-axis resharding)."""
        _require_8()
        inv = collective_inventory(
            _production_step_hlo(8, 1, automated=automated, decoder=decoder)
        )
        tag = "automated" if automated else "spade"
        print("\nDP(8) %s collectives:\n%s" % (tag, summarize(inv)))
        assert inv["count"]["all-reduce"] > 0, "no gradient all-reduces found"
        assert inv["bytes"]["all-gather"] < 2e6, (
            "pure DP must not all-gather:\n" + summarize(inv)
        )
        assert inv["count"]["all-to-all"] == 0
        assert inv["count"]["collective-permute"] == 0, (
            "batch-axis resharding detected:\n" + summarize(inv)
        )
        assert inv["count"]["reduce-scatter"] == 0
        for op in inv["ops"]:
            assert not activation_sized(op["shapes"]), (
                "activation-sized collective: %r" % (op,)
            )

    def test_dp_tp_4x2(self):
        """DP x TP: parameter all-gathers for the 'model'-sharded wide
        leaves plus bottleneck-resolution activation reshards (all-to-all /
        permute between channel-sharded convs) are the expected TP traffic;
        nothing FULL-RESOLUTION may move between chips."""
        _require_8()
        inv = collective_inventory(_production_step_hlo(4, 2))
        print("\nDP4xTP2 collectives:\n" + summarize(inv))
        assert inv["count"]["all-reduce"] > 0
        for op in inv["ops"]:
            if op["op"] in ("all-gather", "all-to-all", "collective-permute"):
                assert not activation_sized(op["shapes"]), (
                    "TP moved a full-resolution activation: %r" % (op,)
                )
                # parameter leaves top out at the widest UNet kernels
                # (3,3,1024,512 f32 = 18.9 MB per Adam mirror); bottleneck
                # activation reshards are (B, <=24, <=24, 1024)-sized
                assert op["bytes"] <= 80e6, op
        # the TP reshard budget must stay a small multiple of the gradient
        # all-reduce budget, or the sharding rule is moving too much
        reshard = inv["bytes"]["all-to-all"] + inv["bytes"]["collective-permute"]
        assert reshard < 0.5 * inv["bytes"]["all-reduce"], summarize(inv)


class TestVolumetricCollectives:
    def test_space_sharded_halo_only(self):
        """('data' 2, 'space' 4) 3-D step at a production-like volume:
        depth-axis conv halos = collective-permutes; grads = all-reduces;
        nothing else."""
        _require_8()
        from multimodal_segmentation_tpu.config import cardiac_3d
        from multimodal_segmentation_tpu.models.volumetric import Cardiac3DSegmenter

        conf = cardiac_3d()
        conf.volume_shape = (16, 96, 96, 3)
        mesh = jax.sharding.Mesh(
            np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "space")
        )
        seg = Cardiac3DSegmenter(conf, mesh=mesh)
        params, opt = seg.init(jax.random.PRNGKey(0))
        D, H, W, S = conf.volume_shape
        r = np.random.RandomState(0)
        vb, mb = seg.shard_batch(
            (
                jnp.asarray(r.rand(2, D, H, W, S), jnp.float32),
                jnp.asarray(r.rand(2, D, H, W, 3) > 0.7, jnp.float32),
            )
        )
        rng = jax.random.PRNGKey(1)
        compiled = seg._step.lower(params, opt, vb, mb, rng).compile()
        inv = collective_inventory(compiled.as_text())
        print("\nvolumetric collectives:\n" + summarize(inv))
        assert inv["count"]["collective-permute"] > 0, (
            "no halo exchange found — is the depth axis actually sharded?\n"
            + summarize(inv)
        )
        assert inv["count"]["all-reduce"] > 0
        assert inv["count"]["all-to-all"] == 0
        for op in inv["ops"]:
            if op["op"] == "all-gather":
                assert not activation_sized(op["shapes"]), op


class TestInventoryParser:
    # fast parser sanity, no compilation
    def test_parse(self):
        hlo = """
  %ar = f32[64]{0} all-reduce(f32[64]{0} %g), replica_groups={}
  %ag-start = (f32[3,3,512,1024]{3,2,1,0}) all-gather-start(f32[3,3,512,512]{3,2,1,0} %w)
  %cp = bf16[2,4,96,96,8]{4,3,2,1,0} collective-permute(bf16[2,4,96,96,8]{4,3,2,1,0} %h)
"""
        inv = collective_inventory(hlo)
        assert inv["count"]["all-reduce"] == 1
        assert inv["count"]["all-gather"] == 1
        assert inv["count"]["collective-permute"] == 1
        ag = [o for o in inv["ops"] if o["op"] == "all-gather"][0]
        assert not activation_sized(ag["shapes"])
        cp = [o for o in inv["ops"] if o["op"] == "collective-permute"][0]
        assert activation_sized(cp["shapes"])
