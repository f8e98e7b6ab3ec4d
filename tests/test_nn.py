"""Architecture-parity tests: parameter counts of components at the real
CHAOS configuration must match the reference Keras architectures
(hand-computed from model_components/* and models/discriminator.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_segmentation_tpu.nn import (
    Discriminator,
    FiLMDecoder,
    LocNet,
    ModalityEncoder,
    Segmentor,
)


def n_params(tree):
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


@pytest.mark.slow
class TestParamCounts:
    def test_image_discriminator(self):
        # models/discriminator.py with f=64, 3 blocks, 192x192x1 input:
        # conv(4x4,1->64)+b = 1088; blocks 64->128->256->512 = 131200 +
        # 524544 + 2097664; dense(19*19*512 -> 1) = 184833.
        d = Discriminator(filters=64, downsample_blocks=3)
        v = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 1)))
        assert n_params(v["params"]) == 1088 + 131200 + 524544 + 2097664 + 184833

    def test_mask_discriminator_mmsdnet(self):
        # f=4 (configuration/mmsdnet_config_chaos.py d_mask_params), 4-ch input
        d = Discriminator(filters=4, downsample_blocks=3)
        v = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 4)))
        expect = (
            (4 * 4 * 4 * 4 + 4)          # conv 4ch -> 4
            + (4 * 4 * 4 * 8 + 8)        # block0 -> 8
            + (4 * 4 * 8 * 16 + 16)      # block1 -> 16
            + (4 * 4 * 16 * 32 + 32)     # block2 -> 32 (stride 1)
            + (19 * 19 * 32 + 1)         # dense
        )
        assert n_params(v["params"]) == expect

    def test_modality_encoder(self):
        # model_components/modality_encoder.py:34-52 at 192x192, 8+1 input ch
        m = ModalityEncoder(num_z=8)
        v = m.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            jnp.zeros((1, 192, 192, 8)),
            jnp.zeros((1, 192, 192, 1)),
        )
        expect = (
            (3 * 3 * 9 * 16 + 16)
            + (3 * 3 * 16 * 32 + 32)
            + (3 * 3 * 32 * 64 + 64)
            + (3 * 3 * 64 * 128 + 128)
            + (11 * 11 * 128 * 32 + 32)  # valid-padding chain: 95,47,23,11
            + 2 * (32 * 8 + 8)
        )
        assert n_params(v["params"]) == expect

    def test_segmentor(self):
        s = Segmentor(num_masks=4)
        v = s.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 8)))
        # convs + 1x1 head; BN scale/bias
        expect = (3 * 3 * 8 * 64 + 64) + (3 * 3 * 64 * 64 + 64) + (64 * 5 + 5) + 2 * 128
        assert n_params(v["params"]) == expect
        assert "batch_stats" in v

    def test_locnet(self):
        # layers/stn_spline.py:94-118 at 192x192, two 8-ch inputs
        l = LocNet(cp_points=25)
        v = l.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 192, 192, 8)),
            jnp.zeros((1, 192, 192, 8)),
        )
        expect = (
            (5 * 5 * 16 * 20 + 20)
            + (5 * 5 * 20 * 20 + 20) * 2
            + (41 * 41 * 20 * 100 + 100)  # 188->94->90->45->41
            + (100 * 50 + 50)
        )
        assert n_params(v["params"]) == expect

    def test_locnet_final_dense_zero_init(self):
        l = LocNet(cp_points=25)
        v = l.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, 8)),
            jnp.zeros((1, 32, 32, 8)),
        )
        theta = l.apply(
            v, jnp.ones((2, 32, 32, 8)), jnp.ones((2, 32, 32, 8))
        )
        # zero-init final layer => identity warp at start (stn_spline.py:116)
        np.testing.assert_allclose(np.asarray(theta), 0.0)

    def test_film_decoder(self):
        d = FiLMDecoder()
        v = d.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 192, 192, 8)),
            jnp.zeros((1, 8)),
        )
        film_layer = (3 * 3 * 8 * 8 + 8) * 2 + (8 * 8 + 8) * 2
        expect = (3 * 3 * 8 * 8 + 8) + 4 * film_layer + (8 * 1 + 1)
        assert n_params(v["params"]) == expect


class TestDualEncoderSharing:
    def test_shared_decoder_params_are_shared(self):
        from multimodal_segmentation_tpu.nn import DualAnatomyEncoder

        m = DualAnatomyEncoder(filters=4, downsample=2, out_channels=4, rounding=False)
        v = m.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, 1)),
            jnp.zeros((1, 32, 32, 1)),
        )
        p = v["params"]
        # exactly one shared upsample path / bottleneck / out conv
        assert "shared_up" in p and "shared_bottleneck" in p and "conv_anatomy" in p
        assert "down1" in p and "down2" in p
        # swapping inputs swaps outputs through the same shared decoder
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 1), jnp.float32)
        y = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 1), jnp.float32)
        s1a, s2a = m.apply(v, x, y)
        s1b, s2b = m.apply(v, y, x)
        # private downsample paths differ, so s1a(x) != s2b(x) in general,
        # but shapes and normalisation hold
        assert s1a.shape == s2a.shape
        np.testing.assert_allclose(
            np.asarray(jnp.sum(s1a, -1)), np.ones((1, 32, 32)), atol=1e-5
        )

    def test_rounding_binarises(self):
        from multimodal_segmentation_tpu.nn import AnatomyEncoder

        m = AnatomyEncoder(filters=4, downsample=2, out_channels=4, rounding=True)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
        s = m.apply(v, jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 1), jnp.float32))
        vals = np.unique(np.asarray(s))
        assert set(vals.tolist()) <= {0.0, 1.0}


def test_fuser_tps_impl_routing():
    """On the CPU test backend 'auto' must resolve to the jnp path (the
    Pallas kernel needs a real single-chip TPU); explicit overrides win."""
    from multimodal_segmentation_tpu.nn.fuser import AnatomyFuser

    assert not AnatomyFuser(tps_impl="auto")._use_pallas()
    assert AnatomyFuser(tps_impl="pallas")._use_pallas()
    assert not AnatomyFuser(tps_impl="jnp")._use_pallas()
