"""Model assembly tests: init shapes, forward passes, loss evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_segmentation_tpu.config import tiny_test_config
from multimodal_segmentation_tpu.models import build_model
from multimodal_segmentation_tpu.models.base import add_residual


def _split_params(params, gen_names):
    gen = {k: v for k, v in params.items() if k in gen_names}
    disc = {k: v for k, v in params.items() if k not in gen_names}
    return gen, disc


def make_batch(conf, rng=0):
    r = np.random.RandomState(rng)
    B = conf.batch_size
    H, W = conf.input_hw
    nm = conf.num_masks
    x1 = r.rand(B, H, W, 1).astype(np.float32) * 2 - 1
    x2 = r.rand(B, H, W, 1).astype(np.float32) * 2 - 1
    m_raw = (r.rand(B, H, W, nm) > 0.8).astype(np.float32)
    m1 = np.asarray(add_residual(jnp.asarray(m_raw)))
    z = r.randn(B, conf.num_z).astype(np.float32)
    return {
        "x1": jnp.asarray(x1),
        "x2": jnp.asarray(x2),
        "m1": jnp.asarray(m1),
        "m2": jnp.asarray(m1),
        "z1": jnp.asarray(z),
        "z2": jnp.asarray(z),
        "dx1": jnp.asarray(x1),
        "dx2": jnp.asarray(x2),
        "dm1": jnp.asarray(m1),
        "dm2": jnp.asarray(m1),
        "dm": jnp.asarray(m1),
    }


@pytest.mark.slow
class TestDAFNet:
    def setup_method(self):
        self.conf = tiny_test_config("dafnet")
        self.model = build_model(self.conf)
        self.params, self.state = self.model.init(jax.random.PRNGKey(0))

    def test_init_structure(self):
        assert set(self.params) == set(
            self.model.GEN_COMPONENTS + self.model.DISC_COMPONENTS
        )
        assert "batch_stats" in self.state
        assert "spectral" in self.state
        # shared decoder: dual encoder has exactly 2 private down paths
        enc = self.params["enc_anatomy"]
        assert "down1" in enc and "down2" in enc and "shared_up" in enc

    def test_gen_loss_expert_supervised(self):
        batch = make_batch(self.conf)
        gen, disc = _split_params(self.params, self.model.GEN_COMPONENTS)
        total, (metrics, new_state) = self.model.gen_loss_expert(
            gen, disc, self.state, batch, jax.random.PRNGKey(1), supervised=True
        )
        assert np.isfinite(float(total))
        for k in ("supervised_Mask", "adv_M", "rec_X", "KL", "rec_Z"):
            assert np.isfinite(float(metrics[k])), k

    def test_gen_loss_expert_unsupervised(self):
        batch = make_batch(self.conf)
        gen, disc = _split_params(self.params, self.model.GEN_COMPONENTS)
        total, _ = self.model.gen_loss_expert(
            gen, disc, self.state, batch, jax.random.PRNGKey(1), supervised=False
        )
        assert np.isfinite(float(total))

    def test_gen_grads_exclude_discriminators(self):
        batch = make_batch(self.conf)
        gen, disc = _split_params(self.params, self.model.GEN_COMPONENTS)

        grads = jax.grad(
            lambda g: self.model.gen_loss_expert(
                g, disc, self.state, batch, jax.random.PRNGKey(1), True
            )[0]
        )(gen)
        # all generator components receive gradient
        for name in ("enc_anatomy", "enc_modality", "segmentor", "decoder", "fuser"):
            leaves = jax.tree_util.tree_leaves(grads[name])
            assert any(np.any(np.asarray(l) != 0) for l in leaves), name

    def test_d_mask_pair_loss(self):
        # one reference D_Mask fit = one real/fake pair + penalty; the
        # train step applies two of these sequentially (dafnet_executor.py
        # :534,544) — see test_train.py for the two-Adam-steps dynamics pin
        batch = make_batch(self.conf)
        gen, disc = _split_params(self.params, self.model.GEN_COMPONENTS)
        nm = self.conf.num_masks
        fake_m1, _ = self.model.make_fake_masks(
            self.params, self.state, batch["dx1"], batch["dx2"],
            jax.random.PRNGKey(2),
        )
        total, (metrics, new_state) = self.model.d_mask_pair_loss(
            {"d_mask": disc["d_mask"]},
            {**gen, "d_image1": disc["d_image1"], "d_image2": disc["d_image2"]},
            self.state,
            batch["dm1"][..., :nm],
            fake_m1,
        )
        assert np.isfinite(float(total))
        assert np.isfinite(float(metrics["dis_M"]))
        # spectral u state must be updated
        old_u = jax.tree_util.tree_leaves(self.state["spectral"]["d_mask"])[0]
        new_u = jax.tree_util.tree_leaves(new_state["spectral"]["d_mask"])[0]
        assert not np.allclose(np.asarray(old_u), np.asarray(new_u))

    def test_d_image_loss(self):
        batch = make_batch(self.conf)
        gen, disc = _split_params(self.params, self.model.GEN_COMPONENTS)
        total, (metrics, _) = self.model.d_image_loss(
            {"d_image1": disc["d_image1"], "d_image2": disc["d_image2"]},
            {**gen, "d_mask": disc["d_mask"]},
            self.state,
            batch,
            jax.random.PRNGKey(3),
        )
        assert np.isfinite(float(total))
        assert np.isfinite(float(metrics["dis_X1"]))

    def test_predict_mask_types(self):
        B, (H, W) = 2, self.conf.input_hw
        imgs = [jnp.zeros((B, H, W, 1)), jnp.zeros((B, H, W, 1))]
        for t in ("simple", "def", "max", "maxnostn"):
            m = self.model.predict_mask(self.params, self.state, 1, t, imgs)
            assert m.shape == (B, H, W, self.conf.num_masks + 1)
            np.testing.assert_allclose(
                np.asarray(jnp.sum(m, -1)), np.ones((B, H, W)), atol=1e-5
            )

    def test_gen_loss_automated(self):
        conf = tiny_test_config("dafnet")
        conf.automatedpairing = True
        model = build_model(conf)
        params, state = model.init(jax.random.PRNGKey(0))
        gen, disc = _split_params(params, model.GEN_COMPONENTS)
        batch = make_batch(conf)
        B, (H, W) = conf.batch_size, conf.input_hw
        r = np.random.RandomState(9)
        batch["x1_pairs"] = jnp.asarray(r.rand(B, H, W, conf.n_pairs).astype(np.float32))
        batch["x2_pairs"] = jnp.asarray(r.rand(B, H, W, conf.n_pairs).astype(np.float32))
        total, (metrics, _) = model.gen_loss_automated(
            gen, disc, state, batch, jax.random.PRNGKey(4), supervised=True
        )
        assert np.isfinite(float(total))

    def test_automated_batched_equals_per_invocation(self):
        """The round-5 batched automated path must be value-identical to
        per-invocation component application (the reference loops over the
        K candidate pairs, models/dafnet.py:248-334): grouped BN with
        pair_groups=K reproduces per-pair statistics exactly, and the
        single 2K-wide fuse call must match per-pair fuses."""
        from multimodal_segmentation_tpu.models.base import (
            batch_deinterleave,
            batch_interleave,
        )

        conf = tiny_test_config("dafnet")
        conf.automatedpairing = True
        model = build_model(conf)
        params, state = model.init(jax.random.PRNGKey(0))
        B, (H, W) = conf.batch_size, conf.input_hw
        K = conf.n_pairs
        r = np.random.RandomState(11)
        x1s = [jnp.asarray(r.rand(B, H, W, 1).astype(np.float32)) for _ in range(K)]
        x2s = [jnp.asarray(r.rand(B, H, W, 1).astype(np.float32)) for _ in range(K)]

        # encoder: one pair_groups=K call vs K separate dual-encoder calls
        sa_cat, sb_cat, _ = model.encode_anatomies(
            params, state, batch_interleave(x1s), batch_interleave(x2s),
            True, True, pair_groups=K,
        )
        sa_parts = batch_deinterleave(sa_cat, K)
        sb_parts = batch_deinterleave(sb_cat, K)
        for j in range(K):
            sa_j, sb_j, _ = model.encode_anatomies(
                params, state, x1s[j], x2s[j], True, True
            )
            np.testing.assert_allclose(
                np.asarray(sa_parts[j]), np.asarray(sa_j), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(sb_parts[j]), np.asarray(sb_j), atol=1e-5
            )

        # fuse: one 2K-wide call vs per-pair fuses
        s1, s2 = sa_parts[0], sb_parts[0]
        s_def_all, _ = model.fuse(
            params, state,
            batch_interleave(list(sa_parts) + list(sb_parts)),
            batch_interleave([s2] * K + [s1] * K),
            True,
        )
        defs = batch_deinterleave(s_def_all, 2 * K)
        for j in range(K):
            sd_j, _ = model.fuse(params, state, sa_parts[j], s2, True)
            np.testing.assert_allclose(
                np.asarray(defs[j]), np.asarray(sd_j), atol=1e-4
            )

        # segmentor: one grouped call vs per-invocation calls
        stack = [s1, s2] + list(defs[K:]) + list(defs[:K])
        m_all, _ = model.segment(
            params, state, batch_interleave(stack), True, True,
            groups=2 + 2 * K,
        )
        m_parts = batch_deinterleave(m_all, 2 + 2 * K)
        for j, s in enumerate(stack):
            m_j, _ = model.segment(params, state, s, True, True)
            np.testing.assert_allclose(
                np.asarray(m_parts[j]), np.asarray(m_j), atol=1e-5
            )


@pytest.mark.slow
class TestMMSDNet:
    def setup_method(self):
        self.conf = tiny_test_config("mmsdnet")
        self.model = build_model(self.conf)
        self.params, self.state = self.model.init(jax.random.PRNGKey(0))

    def test_gen_loss_supervised(self):
        batch = make_batch(self.conf)
        gen, disc = _split_params(self.params, self.model.GEN_COMPONENTS)
        total, (metrics, _) = self.model.gen_loss(
            gen, disc, self.state, batch, jax.random.PRNGKey(1), supervised=True
        )
        assert np.isfinite(float(total))

    def test_gen_loss_unsupervised(self):
        batch = make_batch(self.conf)
        gen, disc = _split_params(self.params, self.model.GEN_COMPONENTS)
        total, _ = self.model.gen_loss(
            gen, disc, self.state, batch, jax.random.PRNGKey(1), supervised=False
        )
        assert np.isfinite(float(total))

    def test_z_regressor(self):
        batch = make_batch(self.conf)
        s_list = self.model.make_z_regressor_anatomies(
            self.params, self.state, batch["x1"], batch["x2"]
        )
        r = np.random.RandomState(3)
        z_list = [
            jnp.asarray(r.randn(self.conf.batch_size, self.conf.num_z).astype(np.float32))
            for _ in range(6)
        ]
        zreg = {k: self.params[k] for k in self.model.ZREG_COMPONENTS}
        other = {k: v for k, v in self.params.items() if k not in self.model.ZREG_COMPONENTS}
        total, _ = self.model.z_regressor_loss(
            zreg, other, self.state, s_list, z_list, jax.random.PRNGKey(5)
        )
        assert np.isfinite(float(total))
        grads = jax.grad(
            lambda p: self.model.z_regressor_loss(
                p, other, self.state, s_list, z_list, jax.random.PRNGKey(5)
            )[0]
        )(zreg)
        leaves = jax.tree_util.tree_leaves(grads["decoder"])
        assert any(np.any(np.asarray(l) != 0) for l in leaves)

    def test_d_mask_loss(self):
        batch = make_batch(self.conf)
        gen, disc = _split_params(self.params, self.model.GEN_COMPONENTS)
        total, _ = self.model.d_mask_loss(
            disc, gen, self.state, batch, jax.random.PRNGKey(2)
        )
        assert np.isfinite(float(total))

    def test_predict_mask(self):
        B, (H, W) = 2, self.conf.input_hw
        imgs = [jnp.zeros((B, H, W, 1)), jnp.zeros((B, H, W, 1))]
        m = self.model.predict_mask(self.params, self.state, 0, "max", imgs)
        assert m.shape == (B, H, W, self.conf.num_masks + 1)


@pytest.mark.slow
class TestSpadeDecoder:
    def test_dafnet_spade_forward(self):
        conf = tiny_test_config("dafnet", decoder_type="spade")
        model = build_model(conf)
        params, state = model.init(jax.random.PRNGKey(0))
        gen, disc = _split_params(params, model.GEN_COMPONENTS)
        batch = make_batch(conf)
        total, _ = model.gen_loss_expert(
            gen, disc, state, batch, jax.random.PRNGKey(1), supervised=True
        )
        assert np.isfinite(float(total))
