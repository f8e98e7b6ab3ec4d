"""End-to-end training tests: fused steps, SWA, early stopping, executors."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_segmentation_tpu.config import tiny_test_config
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.train.early_stopping import EarlyStopping
from multimodal_segmentation_tpu.train.state import create_train_state
from multimodal_segmentation_tpu.train.steps import make_steps
from multimodal_segmentation_tpu.train.swa import swa_update

pytestmark = pytest.mark.slow


def _tiny_batch(conf, automated=False, seed=0):
    r = np.random.RandomState(seed)
    B = conf.batch_size
    H, W = conf.input_hw
    nm = conf.num_masks
    b = {
        "m1": (r.rand(B, H, W, nm) > 0.8).astype(np.float32),
        "m2": (r.rand(B, H, W, nm) > 0.8).astype(np.float32),
        "dm1": (r.rand(B, H, W, nm) > 0.8).astype(np.float32),
        "dm2": (r.rand(B, H, W, nm) > 0.8).astype(np.float32),
        "dm": (r.rand(B, H, W, nm) > 0.8).astype(np.float32),
        "dx1": r.rand(B, H, W, 1).astype(np.float32),
        "dx2": r.rand(B, H, W, 1).astype(np.float32),
    }
    if automated:
        b["x1_pairs"] = r.rand(B, H, W, conf.n_pairs).astype(np.float32)
        b["x2_pairs"] = r.rand(B, H, W, conf.n_pairs).astype(np.float32)
    else:
        b["x1"] = r.rand(B, H, W, 1).astype(np.float32)
        b["x2"] = r.rand(B, H, W, 1).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in b.items()}


def _params_changed(a, b):
    return any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


class TestDAFNetStep:
    def test_fused_supervised_step_updates_everything(self):
        conf = tiny_test_config("dafnet")
        model = build_model(conf)
        steps = make_steps(model, conf)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        batch = _tiny_batch(conf)
        ts2, metrics = steps.step_supervised(ts, batch)
        for k in ("supervised_Mask", "dis_M", "dis_X1", "dis_X2", "rec_Z"):
            assert np.isfinite(float(metrics[k])), k
        assert int(ts2.step) == 1
        # fresh state for comparison (ts was donated)
        ts0 = create_train_state(model, conf, jax.random.PRNGKey(0))
        for name in model.GEN_COMPONENTS + model.DISC_COMPONENTS:
            if name == "balancer":
                # only trained in the automated-pairing path
                continue
            assert _params_changed(ts0.params[name], ts2.params[name]), name

    def test_d_mask_gets_two_adam_steps_per_batch(self):
        # reference fits D_Mask twice per batch (dafnet_executor.py:534,544);
        # two sequential Adam steps != one step on the summed loss, so the
        # dynamics are pinned via the Adam step counters
        conf = tiny_test_config("dafnet")
        model = build_model(conf)
        steps = make_steps(model, conf)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        ts2, _ = steps.step_supervised(ts, _tiny_batch(conf))

        def adam_count(opt_state):
            states = [
                x
                for x in jax.tree_util.tree_leaves(
                    opt_state, is_leaf=lambda l: hasattr(l, "mu")
                )
                if hasattr(x, "mu")
            ]
            assert states, "no ScaleByAdamState found"
            return int(states[0].count)

        assert adam_count(ts2.opt_disc["d_mask"]) == 2
        assert adam_count(ts2.opt_disc["d_image1"]) == 1
        assert adam_count(ts2.opt_disc["d_image2"]) == 1
        assert adam_count(ts2.opt_gen) == 1

    def test_production_shape_step_lowers_with_rotation(self):
        """Compile-check the fused supervised step at the PRODUCTION shape
        (batch 6, 192^2) with rotation augmentation enabled — the exact
        configuration whose Pallas augmentation kernel shipped uncompilable
        in round 4 (BENCH_r04 VMEM OOM at the C=10 concat). On CPU this
        validates lowering/shape logic; the Mosaic-level check at this
        shape is `make tpu-smoke` (mandatory before kernel changes land).
        """
        from bench import make_batch
        from multimodal_segmentation_tpu.config import dafnet_chaos
        from multimodal_segmentation_tpu.ops.pallas_kernels import (
            nearest_warp_block_points,
        )

        conf = dafnet_chaos()
        conf.compute_dtype = "bfloat16"
        assert conf.rotation_range > 0
        # every channel count the rotation concats reach in production
        # must have a VMEM-fitting block (C=10 is the round-4 OOM shape)
        for C in (2, 4, 6, 8, 10):
            assert nearest_warp_block_points(192, 192, C) > 0, C
        # and the fitted block must stay under the measured-cost budget
        P = nearest_warp_block_points(192, 192, 10)
        assert P * 192 * 10 * 9.1 <= 12 * 1024 * 1024

        model = build_model(conf)
        steps = make_steps(model, conf)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        batch = make_batch(conf)
        lowered = jax.jit(
            lambda t, b: steps._step(t, b, supervised=True, automated=False)
        ).lower(ts, batch)
        assert lowered is not None  # tracing + lowering succeeded

    def test_unsupervised_step_runs(self):
        conf = tiny_test_config("dafnet")
        model = build_model(conf)
        steps = make_steps(model, conf)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        batch = _tiny_batch(conf)
        batch.pop("m2")
        ts2, metrics = steps.step_unsupervised(ts, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_batch_stats_updated(self):
        conf = tiny_test_config("dafnet")
        model = build_model(conf)
        steps = make_steps(model, conf)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        ts0 = create_train_state(model, conf, jax.random.PRNGKey(0))
        ts2, _ = steps.step_supervised(ts, _tiny_batch(conf))
        assert _params_changed(
            ts0.model_state["batch_stats"], ts2.model_state["batch_stats"]
        )


class TestMMSDNetStep:
    def test_gen_zreg_and_disc_steps(self):
        conf = tiny_test_config("mmsdnet")
        model = build_model(conf)
        steps = make_steps(model, conf)
        ts = create_train_state(model, conf, jax.random.PRNGKey(0))
        batch = _tiny_batch(conf)
        ts, m1 = steps.step_supervised(ts, batch)
        assert np.isfinite(float(m1["rec_Z"]))
        dbatch = {"dm": batch["dm"], "dx1": batch["dx1"], "dx2": batch["dx2"]}
        ts, m2 = steps.step_discriminator(ts, dbatch)
        assert np.isfinite(float(m2["dis_M"]))


class TestSWA:
    def test_tracks_live_before_start(self):
        p = {"w": jnp.ones(3) * 5.0}
        swa = {"w": jnp.zeros(3)}
        out = swa_update(swa, p, jnp.asarray(10), 40)
        np.testing.assert_allclose(out["w"], p["w"])

    def test_running_mean_after_start(self):
        # reference swa.py:27-34: at epoch e > start:
        # swa <- (swa * (e - start) + live) / (e - start + 1)
        swa = {"w": jnp.ones(2) * 2.0}
        live = {"w": jnp.ones(2) * 8.0}
        out = swa_update(swa, live, jnp.asarray(42), 40)
        np.testing.assert_allclose(out["w"], (2 * 2.0 + 8.0) / 3.0)


class TestEarlyStopping:
    def test_stops_after_patience(self):
        es = EarlyStopping("v", min_delta=0.01, patience=3)
        assert not es.update(0, {"v": 1.0})
        stopped = [es.update(i, {"v": 1.0}) for i in range(1, 5)]
        assert stopped == [False, False, True, True]

    def test_improvement_resets(self):
        es = EarlyStopping("v", min_delta=0.01, patience=2)
        es.update(0, {"v": 1.0})
        es.update(1, {"v": 1.0})
        assert not es.update(2, {"v": 0.5})
        assert es.wait == 0


@pytest.mark.slow
class TestExecutorEndToEnd:
    def _conf(self, model):
        conf = tiny_test_config(model)
        conf.dataset_name = "synthetic"
        conf.test_dataset = "synthetic"
        conf.epochs = 2
        conf.steps_per_epoch = 2
        conf.swa_start_epoch = 0
        return conf

    def test_dafnet_two_epochs(self, tmp_path):
        conf = self._conf("dafnet")
        conf.folder = str(tmp_path / "dafnet_tiny")
        model = build_model(conf)
        from multimodal_segmentation_tpu.train.executor import make_executor

        ex = make_executor(conf, model)
        ts = ex.train()
        assert int(ts.step) == 4  # 2 epochs x 2 batches, one fused step each
        assert os.path.exists(os.path.join(conf.folder, "training.csv"))
        assert os.path.exists(os.path.join(conf.folder, "training_loss.png"))
        assert os.path.exists(os.path.join(conf.folder, "models", "segmentor.npz"))
        # per-epoch test_error.txt (image_callback.py:64-66): one
        # "epoch, -dice" line per epoch
        err = os.path.join(conf.folder, "test_error.txt")
        assert os.path.exists(err)
        with open(err) as f:
            lines = f.read().strip().splitlines()
        assert len(lines) == 2 and lines[0].startswith("0, ")
        # intensity-augmented epoch grid (image_callback.py:80-85) under
        # <folder>/training/
        assert os.path.exists(
            os.path.join(conf.folder, "training", "segmentations_epoch_1.png")
        )
        # discriminator diagnostics: real-vs-fake D_Mask panel
        # (dafnet_image_callback.py:193-235) + image-D real/fake histograms
        imgs = os.path.join(conf.folder, "training_images")
        assert os.path.exists(
            os.path.join(imgs, "discriminator_epoch_001.png")
        )
        assert os.path.exists(
            os.path.join(imgs, "discriminator_image_epoch_001.png")
        )

    def test_dafnet_spade_two_epochs(self, tmp_path):
        """SPADE decoder variant trains end-to-end (VERDICT r2 weak #3):
        the reference ships it as a first-class config
        (configuration/dafnet_spade_config_chaos.py:17); a gradient/shape
        bug in SPADE training mode must fail here, not in a user run."""
        conf = tiny_test_config("dafnet", decoder_type="spade")
        conf.dataset_name = "synthetic"
        conf.test_dataset = "synthetic"
        conf.epochs = 2
        conf.steps_per_epoch = 2
        conf.swa_start_epoch = 0
        conf.folder = str(tmp_path / "dafnet_spade_tiny")
        model = build_model(conf)
        from multimodal_segmentation_tpu.train.executor import make_executor

        ex = make_executor(conf, model)
        ts = ex.train()
        assert int(ts.step) == 4
        # decoder params actually moved (gradient flows through SPADE)
        p0, _ = build_model(conf).init(jax.random.PRNGKey(conf.seed))
        moved = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            p0["decoder"],
            jax.device_get(ts.params["decoder"]),
        )
        assert max(jax.tree_util.tree_leaves(moved)) > 0
        # losses are finite
        import csv as _csv

        with open(os.path.join(conf.folder, "training.csv")) as f:
            rows = list(_csv.DictReader(f))
        assert rows and all(
            np.isfinite(float(v)) for v in rows[-1].values()
        )

    def test_mmsdnet_one_epoch_and_test(self, tmp_path):
        conf = self._conf("mmsdnet")
        conf.epochs = 1
        conf.folder = str(tmp_path / "mmsdnet_tiny")
        # exercise the round-5 eval knob: the tester rebuilds its predict
        # model with bf16 activations (params apply unchanged)
        conf.eval_dtype = "bfloat16"
        model = build_model(conf)
        from multimodal_segmentation_tpu.train.executor import make_executor

        ex = make_executor(conf, model)
        ex.train()
        ex.test()
        res = os.path.join(
            conf.folder, "test_results_synthetic_t1_simple", "results.csv"
        )
        assert os.path.exists(res)
        with open(res) as f:
            lines = f.read().strip().splitlines()
        assert len(lines) == 4  # header + 3 test volumes


class TestFlatAdam:
    """flat_adam (train/state.py) must be Adam to float tolerance: one
    flattened-vector update pass replacing optax's per-leaf chains."""

    def test_matches_optax_adam_lockstep(self):
        from multimodal_segmentation_tpu.train.state import adam

        rng = np.random.RandomState(0)
        params = {
            "a": {"kernel": jnp.asarray(rng.randn(7, 5), jnp.float32),
                  "bias": jnp.asarray(rng.randn(5), jnp.float32)},
            "b": jnp.asarray(rng.randn(3, 2, 4), jnp.float32),
        }
        ref_opt = adam(1e-3, fused=False)
        fus_opt = adam(1e-3, fused=True)
        ref_state, fus_state = ref_opt.init(params), fus_opt.init(params)
        p_ref = p_fus = params
        import optax

        for step in range(5):
            grads = jax.tree_util.tree_map(
                lambda p: jnp.asarray(
                    rng.randn(*p.shape), jnp.float32) * (step + 1),
                params,
            )
            u_ref, ref_state = ref_opt.update(grads, ref_state, p_ref)
            p_ref = optax.apply_updates(p_ref, u_ref)
            u_fus, fus_state = fus_opt.update(grads, fus_state, p_fus)
            p_fus = optax.apply_updates(p_fus, u_fus)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_fus)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )

    def test_full_step_equivalence_fused_vs_per_leaf(self):
        """One DAFNet step with fused_adam on/off applies the same update.

        Single step only: both paths see identical gradients, so the
        param DELTAS must agree to float ulps. Multi-step comparison is
        meaningless here — Adam's |g|/(sqrt(v)+eps) normalisation turns
        1-ulp update differences into diverging trajectories through the
        GAN step (verified: 2 steps already drift to ~1e-4)."""
        results = []
        for fused in (False, True):
            conf = tiny_test_config()
            conf.fused_adam = fused
            model = build_model(conf)
            steps = make_steps(model, conf)
            ts = create_train_state(model, conf, jax.random.PRNGKey(3))
            batch = _tiny_batch(conf)
            p0 = jax.tree_util.tree_map(lambda x: np.array(x), ts.params)
            ts, _ = steps.step_supervised(ts, batch)
            results.append(
                (p0, jax.tree_util.tree_map(np.asarray, ts.params))
            )
        (p0a, p1a), (p0b, p1b) = results
        for x0, x1, y0, y1 in zip(
            *(jax.tree_util.tree_leaves(t) for t in (p0a, p1a, p0b, p1b))
        ):
            np.testing.assert_allclose(x1 - x0, y1 - y0, atol=5e-8, rtol=0)
