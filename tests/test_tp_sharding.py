"""Tensor-parallel parameter sharding tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimodal_segmentation_tpu.config import tiny_test_config
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.parallel.mesh import make_mesh, shard_batch
from multimodal_segmentation_tpu.parallel.sharding import (
    count_sharded_leaves,
    tp_shard_train_state,
)
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps
from tests.test_parallel import _batch

pytestmark = pytest.mark.slow


class TestTPSharding:
    def test_wide_leaves_get_model_axis(self):
        conf = tiny_test_config("dafnet")
        mesh = make_mesh(n_data=4, n_model=2)
        model = build_model(conf)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        ts = tp_shard_train_state(mesh, ts, min_features=64)
        n = count_sharded_leaves(mesh, ts.params, min_features=64)
        assert n > 0
        # a wide bottleneck kernel must carry the 'model' axis
        wide = [
            l
            for l in jax.tree_util.tree_leaves(ts.params)
            if hasattr(l, "shape") and len(l.shape) >= 2 and l.shape[-1] >= 64
        ]
        assert any(
            l.sharding.spec == P(*([None] * (len(l.shape) - 1)), "model")
            for l in wide
        )

    def test_adam_moments_shard_consistently(self):
        conf = tiny_test_config("dafnet")
        mesh = make_mesh(n_data=4, n_model=2)
        model = build_model(conf)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        ts = tp_shard_train_state(mesh, ts, min_features=64)
        n_p = count_sharded_leaves(mesh, ts.params, min_features=64)
        n_o = count_sharded_leaves(mesh, ts.opt_gen, min_features=64)
        # mu and nu mirror the param tree -> at least 2x the sharded leaves
        assert n_o >= 2 * (n_p - len(model.DISC_COMPONENTS))

    @pytest.mark.slow
    def test_dp_tp_step_runs(self):
        conf = tiny_test_config("dafnet")
        conf.batch_size = 4
        mesh = make_mesh(n_data=4, n_model=2)
        model = build_model(conf)
        steps = make_steps(model, conf, mesh=mesh)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        ts = tp_shard_train_state(mesh, ts, min_features=64)
        batch = shard_batch(mesh, _batch(conf))
        ts, metrics = steps.step_supervised(ts, batch)
        jax.block_until_ready(ts.params)
        assert np.isfinite(float(metrics["loss"]))
