"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_segmentation_tpu.config import tiny_test_config
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
)
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps

pytestmark = pytest.mark.slow


def _batch(conf, seed=0):
    r = np.random.RandomState(seed)
    B = conf.batch_size
    H, W = conf.input_hw
    nm = conf.num_masks
    return {
        "x1": r.rand(B, H, W, 1).astype(np.float32),
        "x2": r.rand(B, H, W, 1).astype(np.float32),
        "m1": (r.rand(B, H, W, nm) > 0.8).astype(np.float32),
        "m2": (r.rand(B, H, W, nm) > 0.8).astype(np.float32),
        "dm1": (r.rand(B, H, W, nm) > 0.8).astype(np.float32),
        "dm2": (r.rand(B, H, W, nm) > 0.8).astype(np.float32),
        "dx1": r.rand(B, H, W, 1).astype(np.float32),
        "dx2": r.rand(B, H, W, 1).astype(np.float32),
    }


class TestMesh:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    def test_make_mesh_axes(self):
        mesh = make_mesh()
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.size == 8

    def test_shard_batch_places_on_all_devices(self):
        mesh = make_mesh(n_data=8)
        batch = shard_batch(mesh, {"x": np.zeros((8, 4, 4, 1), np.float32)})
        sh = batch["x"].sharding
        assert len(sh.device_set) == 8


@pytest.mark.slow
class TestShardedTrainStep:
    def test_dafnet_step_on_8_device_mesh(self):
        conf = tiny_test_config("dafnet")
        conf.batch_size = 8
        mesh = make_mesh(n_data=8)
        model = build_model(conf)
        steps = make_steps(model, conf, mesh=mesh)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        batch = shard_batch(mesh, _batch(conf))
        ts, metrics = steps.step_supervised(ts, batch)
        jax.block_until_ready(ts.params)
        assert np.isfinite(float(metrics["loss"]))
        # params replicated across all devices
        leaf = jax.tree_util.tree_leaves(ts.params)[0]
        assert len(leaf.sharding.device_set) == 8

    def test_sharded_matches_single_device_loss(self):
        """Same data + params => global-batch loss should match the
        single-device value closely (GSPMD reduction reordering only)."""
        conf = tiny_test_config("dafnet")
        conf.batch_size = 8
        conf.rotation_range = 0.0  # avoid rng-placement differences
        model = build_model(conf)
        batch_np = _batch(conf)

        steps1 = make_steps(model, conf, mesh=None)
        ts1 = create_train_state(model, conf, jax.random.PRNGKey(0))
        _, m1 = steps1.step_supervised(ts1, {k: jnp.asarray(v) for k, v in batch_np.items()})

        mesh = make_mesh(n_data=8)
        steps8 = make_steps(model, conf, mesh=mesh)
        ts8 = create_train_state(model, conf, jax.random.PRNGKey(0))
        _, m8 = steps8.step_supervised(ts8, shard_batch(mesh, batch_np))

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=2e-3
        )
