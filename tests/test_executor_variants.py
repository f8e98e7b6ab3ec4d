"""Executor variants: semi-supervised l_mix, automated pairing, randomised
pairs, checkpoint resume. All slow end-to-end paths on tiny configs."""

import os

import jax
import numpy as np
import pytest

from multimodal_segmentation_tpu.config import tiny_test_config
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.train.executor import make_executor


def _conf(model="dafnet", **kw):
    conf = tiny_test_config(model)
    conf.dataset_name = "synthetic"
    conf.test_dataset = "synthetic"
    conf.epochs = 1
    conf.steps_per_epoch = 1
    conf.swa_start_epoch = 0
    for k, v in kw.items():
        setattr(conf, k, v)
    return conf


@pytest.mark.slow
class TestSemiSupervised:
    def test_dafnet_l_mix_half_runs_both_paths(self, tmp_path):
        conf = _conf(l_mix=0.5)
        conf.folder = str(tmp_path / "semi")
        model = build_model(conf)
        ex = make_executor(conf, model)
        ts = ex.train()
        # per batch: supervised fused step + unsupervised fused step
        assert int(ts.step) == 2
        # labelled subset is a strict subset of volumes
        assert ex.data.num_volumes < 14
        assert ex.ul_data.num_volumes == 14 - ex.data.num_volumes

    def test_mmsdnet_l_mix_zero_unsupervised_only(self, tmp_path):
        conf = _conf("mmsdnet", l_mix=0.0)
        conf.folder = str(tmp_path / "unsup")
        model = build_model(conf)
        ex = make_executor(conf, model)
        ts = ex.train()
        # unsup gen step + disc step per batch
        assert int(ts.step) == 2


@pytest.mark.slow
class TestAutomatedPairing:
    def test_dafnet_automated_pairing_epoch(self, tmp_path):
        conf = _conf(automatedpairing=True)
        conf.folder = str(tmp_path / "auto")
        model = build_model(conf)
        ex = make_executor(conf, model)
        ex.init_train_data()
        # expand_pairs stacked n_pairs candidates channel-wise
        assert ex.data.get_images_modi(0).shape[-1] == conf.n_pairs
        ts = ex.train()
        assert int(ts.step) == 1
        # balancer must now receive gradient
        ts0_params, _ = build_model(conf).init(jax.random.PRNGKey(conf.seed))
        # the image callback runs under automated pairing too, fed pair-0
        # slices as x1/x2 (dafnet_executor.py:186-198,
        # dafnet_image_callback.py:75-76)
        imgs = os.path.join(conf.folder, "training_images")
        assert os.path.exists(
            os.path.join(imgs, "anatomies_epoch_000.png")
        )
        assert os.path.exists(
            os.path.join(imgs, "segmentations_epoch_000.png")
        )
        assert os.path.exists(
            os.path.join(imgs, "reconstructions_epoch_000.png")
        )
        assert os.path.exists(
            os.path.join(imgs, "discriminator_epoch_000.png")
        )

    def test_randomise_pairs_path(self, tmp_path):
        conf = _conf(randomise=True)
        conf.folder = str(tmp_path / "rand")
        model = build_model(conf)
        ex = make_executor(conf, model)
        ts = ex.train()
        assert int(ts.step) == 1


class TestComponentWeights:
    def test_save_mutate_load_one_component_roundtrip(self, tmp_path):
        """Per-component npz restore (reference models/dafnet.py:54-73):
        save all components, perturb one, restore ONLY that one, and check
        the others are untouched."""
        import jax.numpy as jnp

        from multimodal_segmentation_tpu.utils.checkpoint import (
            CheckpointManager,
        )

        conf = _conf()
        conf.folder = str(tmp_path / "compw")
        model = build_model(conf)
        params, _ = model.init(jax.random.PRNGKey(0))
        ckpt = CheckpointManager(conf.folder)
        mdir = os.path.join(conf.folder, "models")
        ckpt.save_component_weights(mdir, params)

        mutated = dict(params)
        mutated["segmentor"] = jax.tree_util.tree_map(
            lambda x: x + 1.0, params["segmentor"]
        )
        mutated["decoder"] = jax.tree_util.tree_map(
            lambda x: x + 1.0, params["decoder"]
        )

        restored, loaded = ckpt.load_component_weights(
            mdir, mutated, components=["segmentor"]
        )
        assert loaded == ["segmentor"]
        for a, b in zip(
            jax.tree_util.tree_leaves(restored["segmentor"]),
            jax.tree_util.tree_leaves(params["segmentor"]),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # non-requested component keeps its mutated values
        a0 = jax.tree_util.tree_leaves(restored["decoder"])[0]
        b0 = jax.tree_util.tree_leaves(params["decoder"])[0]
        assert not np.allclose(np.asarray(a0), np.asarray(b0))

        # full restore fixes everything
        restored_all, loaded_all = ckpt.load_component_weights(mdir, mutated)
        assert set(loaded_all) == set(params.keys())
        for name in params:
            for a, b in zip(
                jax.tree_util.tree_leaves(restored_all[name]),
                jax.tree_util.tree_leaves(params[name]),
            ):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_missing_files_are_tolerated(self, tmp_path):
        from multimodal_segmentation_tpu.utils.checkpoint import (
            CheckpointManager,
        )

        conf = _conf()
        conf.folder = str(tmp_path / "compw2")
        model = build_model(conf)
        params, _ = model.init(jax.random.PRNGKey(0))
        ckpt = CheckpointManager(conf.folder)
        out, loaded = ckpt.load_component_weights(
            str(tmp_path / "empty"), params
        )
        assert loaded == []
        assert out["segmentor"] is params["segmentor"]


@pytest.mark.slow
class TestResume:
    def test_restored_state_predicts_identically(self, tmp_path):
        import jax.numpy as jnp
        import numpy as np

        conf = _conf()
        conf.folder = str(tmp_path / "roundtrip")
        model = build_model(conf)
        ex = make_executor(conf, model)
        ts = ex.train()

        H, W = conf.input_hw
        imgs = [jnp.zeros((2, H, W, 1)), jnp.ones((2, H, W, 1)) * 0.3]
        before = np.asarray(
            model.predict_mask(ts.params, ts.model_state, 1, "max", imgs)
        )

        ex2 = make_executor(conf, build_model(conf))
        ts2, start = ex2.create_state()
        assert start == 1
        after = np.asarray(
            model.predict_mask(ts2.params, ts2.model_state, 1, "max", imgs)
        )
        np.testing.assert_allclose(before, after, atol=1e-6)

    def test_component_npz_fallback_seeds_state(self, tmp_path):
        """With no Orbax checkpoint but exported models/*.npz present,
        create_state seeds params from the per-component files (reference
        build-time weight loading, models/dafnet.py:54-73)."""
        import shutil

        conf = _conf()
        conf.folder = str(tmp_path / "npzfall")
        model = build_model(conf)
        ex = make_executor(conf, model)
        ts = ex.train()
        eval_params = ex.params_for_eval(ts)[0]

        shutil.rmtree(os.path.join(conf.folder, "checkpoints"))
        ex2 = make_executor(conf, build_model(conf))
        ts2, start = ex2.create_state()
        assert start == 0
        for a, b in zip(
            jax.tree_util.tree_leaves(ts2.params),
            jax.tree_util.tree_leaves(eval_params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_checkpoint_resume_continues_epochs(self, tmp_path):
        conf = _conf()
        conf.folder = str(tmp_path / "resume")
        model = build_model(conf)
        ex = make_executor(conf, model)
        ts1 = ex.train()

        # second executor resumes from epoch 0's checkpoint and trains epoch 1
        conf2 = _conf()
        conf2.epochs = 2
        conf2.folder = conf.folder
        ex2 = make_executor(conf2, build_model(conf2))
        ts2 = ex2.train()
        assert int(ts2.step) == 2  # one step epoch 0 (restored) + one epoch 1
        assert int(ts2.epoch) == 1


@pytest.mark.slow
class TestBalancerOrdering:
    def test_balancer_ranks_candidates_by_alignment_quality(self, tmp_path):
        """After automated-pairing training on the discriminative fixture
        (organ centres drift along the slice axis, so candidate pairs carry
        materially different alignment quality), the Balancer must rank
        candidates of CONTROLLED misalignment monotonically: the aligned
        expert pair above a 2-px-shifted candidate above a 6-px-shifted one
        (VERDICT r3 item 5; reference models/dafnet.py:248-334,
        model_components/balancer.py:11-38). Also checks the training.csv
        val_weight columns put the expert candidate first.

        Margins calibrated on this config: w0-w2 ~ 0.009 for (0,2,6)-px
        shifts at 32^2 after 120 tiny steps; asserted at half that.
        """
        import csv

        import jax.numpy as jnp
        import numpy as np

        conf = _conf(automatedpairing=True)
        conf.epochs = 6
        conf.steps_per_epoch = 20
        conf.folder = str(tmp_path / "balancer_order")
        model = build_model(conf)
        ex = make_executor(conf, model)
        ts = ex.train()

        # executor-logged validation weights: expert candidate weighted top
        with open(os.path.join(conf.folder, "training.csv")) as f:
            rows = list(csv.DictReader(f))
        last = rows[-1]
        w_log = [float(last["val_weight_%d" % j]) for j in range(conf.n_pairs)]
        print("logged balancer weights (expert, neighbours):", w_log)
        assert abs(sum(w_log) - 1.0) < 1e-3
        assert w_log[0] > max(w_log[1:]), w_log

        # controlled-misalignment probe: candidates = validation x1 shifted
        # by 0 / 2 / 6 px; the trained Balancer must order them strictly
        valid = ex.loader.load_all_modalities_concatenated(
            conf.split, "validation", conf.image_downsample
        )
        valid.crop(conf.input_hw)
        x1 = valid.get_images_modi(0)
        x2 = jnp.asarray(valid.get_images_modi(1), jnp.float32)
        params, state = ts.params, ts.model_state

        def enc1(x):
            s, _, _ = model.components.apply(
                "enc_anatomy", params, state, jnp.asarray(x, jnp.float32),
                method="encode1",
            )
            return s

        s2, _, _ = model.components.apply(
            "enc_anatomy", params, state, x2, method="encode2"
        )
        cands = [enc1(np.roll(x1, s, axis=1)) for s in (0, 2, 6)]
        (w, _, _) = model.components.apply("balancer", params, state, s2, cands)
        w = np.asarray(w).mean(0)
        print("balancer weights for 0/2/6-px shifted candidates:", w)
        assert w[0] > w[1] > w[2], w
        assert w[0] - w[2] > 0.004, (
            "expert-vs-6px margin collapsed: %r" % (w,)
        )
