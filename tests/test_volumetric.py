"""3-D multi-sequence cardiac stretch path (BASELINE.json configs[4]).

Runs on the 8-virtual-CPU-device mesh from conftest.py: the volumetric
train step jits over a ('data', 'space') mesh with the slice axis D
sharded, exercising the spatial-partitioning path without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_segmentation_tpu.config import cardiac_3d, get_config
from multimodal_segmentation_tpu.data.loader_factory import init_loader
from multimodal_segmentation_tpu.models.volumetric import (
    Cardiac3DSegmenter,
    train_cardiac3d,
)
from multimodal_segmentation_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.slow


def tiny_conf():
    conf = cardiac_3d()
    conf.volume_shape = (8, 32, 32, 3)
    conf.filters3d = 4
    conf.downsample3d = 2
    conf.batch_size = 2
    conf.rotation_range = 0.0  # deterministic unit tests
    return conf


class TestCardiacLoader:
    def test_shapes_and_ranges(self):
        loader = init_loader("cardiac", shape=(8, 32, 32))
        xs, ys = loader.load_volumes(0, "validation")
        assert xs.shape == (3, 8, 32, 32, 3)
        assert ys.shape == (3, 8, 32, 32, 3)
        assert xs.min() >= -1.0 and xs.max() <= 1.0
        assert set(np.unique(ys)) <= {0.0, 1.0}
        # classes are disjoint (LV / myo / RV)
        assert ys.sum(-1).max() <= 1.0

    def test_deterministic(self):
        a = init_loader("cardiac", shape=(8, 32, 32)).load_volumes(0, "test")
        b = init_loader("cardiac", shape=(8, 32, 32)).load_volumes(0, "test")
        np.testing.assert_array_equal(a[0], b[0])

    def test_splits_disjoint(self):
        loader = init_loader("cardiac")
        for s in loader.splits():
            tr, va, te = set(s["training"]), set(s["validation"]), set(s["test"])
            assert not (tr & va) and not (tr & te) and not (va & te)
            assert tr | va | te == set(loader.volumes)

    def test_config_preset_registered(self):
        assert get_config("cardiac_3d").model == "cardiac3d"


class TestCardiac3DModel:
    def test_forward_shapes(self):
        conf = tiny_conf()
        model = Cardiac3DSegmenter(conf)
        params, _ = model.init(jax.random.PRNGKey(0))
        x = jnp.zeros((2, 8, 32, 32, 3))
        pred = model.predict(params, x)
        assert pred.shape == (2, 8, 32, 32, conf.num_masks + 1)
        # softmax over classes
        np.testing.assert_allclose(np.asarray(pred.sum(-1)), 1.0, atol=1e-5)

    def test_single_device_step_decreases_loss(self):
        conf = tiny_conf()
        loader = init_loader("cardiac", shape=conf.volume_shape[:3])
        xs, ys = loader.load_volumes(0, "validation")
        model = Cardiac3DSegmenter(conf)
        params, opt = model.init(jax.random.PRNGKey(0))
        vb, mb = jnp.asarray(xs[:2]), jnp.asarray(ys[:2])
        losses = []
        for _ in range(8):
            params, opt, loss = model.step(params, opt, vb, mb)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()


class TestCardiac3DSharded:
    def test_data_space_mesh_step(self):
        """Full jitted step over a (data=2, space=4) mesh: batch sharded
        over studies AND the slice axis sharded over 'space'."""
        devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = jax.sharding.Mesh(devices, ("data", "space"))
        conf = tiny_conf()
        model = Cardiac3DSegmenter(conf, mesh=mesh)
        params, opt = model.init(jax.random.PRNGKey(0))
        loader = init_loader("cardiac", shape=conf.volume_shape[:3])
        xs, ys = loader.load_volumes(0, "validation")
        vb, mb = model.shard_batch((jnp.asarray(xs[:2]), jnp.asarray(ys[:2])))
        # the input really is laid out over both mesh axes
        assert len(vb.sharding.device_set) == 8
        params, opt, loss = model.step(params, opt, vb, mb)
        assert np.isfinite(float(loss))

    def test_sharded_evaluate_and_odd_batches(self):
        """evaluate()/predict() must work on a data>1 mesh with batches
        not divisible by the data axis (3 studies in batches of 2 → final
        batch of 1; test() predicts single studies). Inference shards only
        the depth axis, so any batch size is legal."""
        devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = jax.sharding.Mesh(devices, ("data", "space"))
        conf = tiny_conf()
        model = Cardiac3DSegmenter(conf, mesh=mesh)
        params, _ = model.init(jax.random.PRNGKey(0))
        loader = init_loader("cardiac", shape=conf.volume_shape[:3])
        xs, ys = loader.load_volumes(0, "validation")  # 3 studies
        pred1 = model.predict(params, jnp.asarray(xs[:1]))  # B=1 on data=2
        assert pred1.shape[0] == 1
        d = model.evaluate(params, xs, ys, batch=2)  # tail batch of 1
        assert np.isfinite(d)
        # sharded inference == single-device inference
        single = Cardiac3DSegmenter(conf)
        p_single = np.asarray(single.predict(params, jnp.asarray(xs[:1])))
        np.testing.assert_allclose(
            np.asarray(pred1), p_single, rtol=2e-5, atol=2e-5
        )

    def test_sharded_matches_single_device(self):
        """The spatially-partitioned loss equals the unsharded loss — the
        SPMD halo exchanges preserve SAME-conv semantics."""
        conf = tiny_conf()
        loader = init_loader("cardiac", shape=conf.volume_shape[:3])
        xs, ys = loader.load_volumes(0, "validation")
        vb, mb = jnp.asarray(xs[:2]), jnp.asarray(ys[:2])

        single = Cardiac3DSegmenter(conf)
        params, _ = single.init(jax.random.PRNGKey(0))
        l_single, _ = jax.jit(single.loss_fn)(params, vb, mb)

        devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = jax.sharding.Mesh(devices, ("data", "space"))
        sharded = Cardiac3DSegmenter(conf, mesh=mesh)
        svb, smb = sharded.shard_batch((vb, mb))
        l_sharded, _ = jax.jit(sharded.loss_fn)(params, svb, smb)
        np.testing.assert_allclose(
            float(l_single), float(l_sharded), rtol=2e-5, atol=2e-5
        )


class TestCardiac3DExecutor:
    def test_artifact_contract_and_restore(self, tmp_path, monkeypatch):
        """train() writes training.csv + models/*.npz + results.csv; a
        fresh executor's test() restores from the npz (the --test path)."""
        from multimodal_segmentation_tpu.models.volumetric import (
            Cardiac3DExecutor,
        )

        monkeypatch.chdir(tmp_path)
        conf = tiny_conf()
        conf.epochs = 1
        conf.folder = str(tmp_path / "cardiac_out")
        ex = Cardiac3DExecutor(conf)
        ex.train()
        d1 = ex.test()
        assert (tmp_path / "cardiac_out" / "training.csv").exists()
        assert (tmp_path / "cardiac_out" / "models" / "cardiac3d.npz").exists()
        assert (
            tmp_path / "cardiac_out" / "test_results_cardiac" / "results.csv"
        ).exists()

        ex2 = Cardiac3DExecutor(conf)
        d2 = ex2.test()  # restores params from npz
        assert abs(d1 - d2) < 1e-6


@pytest.mark.slow
class TestCardiac3DTraining:
    def test_learns(self):
        conf = tiny_conf()
        conf.lr = 3e-4
        model, params, history = train_cardiac3d(conf, epochs=3, seed=0)
        assert history[-1]["loss"] < history[0]["loss"]
        assert np.isfinite(history[-1]["val_dice"])


class TestVolumeAugment:
    def test_rotation_shared_across_slices_and_masks(self):
        from multimodal_segmentation_tpu.ops.augment import (
            random_rotate_volumes,
            rotate_batch,
        )

        r = np.random.RandomState(0)
        vols = jnp.asarray(r.rand(2, 4, 16, 16, 3).astype(np.float32))
        msks = jnp.asarray((r.rand(2, 4, 16, 16, 2) > 0.5).astype(np.float32))
        v2, m2 = random_rotate_volumes(jax.random.PRNGKey(3), vols, msks, 30.0)
        assert v2.shape == vols.shape and m2.shape == msks.shape
        # masks stay binary under nearest-neighbour rotation
        assert set(np.unique(np.asarray(m2))) <= {0.0, 1.0}
        # zero range = identity
        v3, m3 = random_rotate_volumes(jax.random.PRNGKey(3), vols, msks, 0.0)
        np.testing.assert_array_equal(np.asarray(v3), np.asarray(vols))

    def test_step_with_rotation_runs(self):
        conf = tiny_conf()
        conf.rotation_range = 20.0
        model = Cardiac3DSegmenter(conf)
        params, opt = model.init(jax.random.PRNGKey(0))
        loader = init_loader("cardiac", shape=conf.volume_shape[:3])
        xs, ys = loader.load_volumes(0, "validation")
        params, opt, loss = model.step(
            params, opt, jnp.asarray(xs[:2]), jnp.asarray(ys[:2])
        )
        assert np.isfinite(float(loss))
