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

    def test_randomise_pairs_path(self, tmp_path):
        conf = _conf(randomise=True)
        conf.folder = str(tmp_path / "rand")
        model = build_model(conf)
        ex = make_executor(conf, model)
        ts = ex.train()
        assert int(ts.step) == 1


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
