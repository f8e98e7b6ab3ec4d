"""Loss parity tests against independent numpy implementations of the
reference costs.py formulas (including its argument-swap quirks)."""

import jax.numpy as jnp
import numpy as np

from multimodal_segmentation_tpu import losses


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _rand(shape, seed, binary=False):
    r = np.random.RandomState(seed)
    x = r.rand(*shape).astype(np.float32)
    if binary:
        x = (x > 0.6).astype(np.float32)
    return x


class TestDice:
    def test_dice_np_matches_formula(self):
        t = _rand((3, 8, 8, 4), 0, binary=True)
        p = _rand((3, 8, 8, 5), 1)
        # costs.py:31-41
        pr = np.round(p[..., :4])
        inter = (t * pr).sum(axis=(1, 2, 3))
        expect = np.mean(
            (2 * inter + 1e-12) / (t.sum(axis=(1, 2, 3)) + pr.sum(axis=(1, 2, 3)) + 1e-12)
        )
        np.testing.assert_allclose(losses.dice_np(t, p, binarise=True), expect, rtol=1e-6)

    def test_restricted_dice_ignores_extra_channels(self):
        t = _rand((2, 8, 8, 5), 2, binary=True)
        p = _rand((2, 8, 8, 5), 3)
        a = losses.restricted_dice_loss(jnp.asarray(t), jnp.asarray(p), 4)
        # changing channel 4 must not affect the restricted loss
        p2 = p.copy()
        p2[..., 4] = 0.123
        b = losses.restricted_dice_loss(jnp.asarray(t), jnp.asarray(p2), 4)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    def test_perfect_prediction_near_zero(self):
        t = _rand((2, 8, 8, 4), 4, binary=True)
        val = losses.dice_loss(jnp.asarray(t), jnp.asarray(t))
        assert float(val) < 1e-5

    def test_dice_jax_matches_dice_np(self):
        # on-device eval Dice (used by per-epoch validation) must equal
        # the numpy reference metric, binarised and not
        t = _rand((3, 8, 8, 4), 5, binary=True)
        p = _rand((3, 8, 8, 5), 6)
        for binarise in (False, True):
            np.testing.assert_allclose(
                float(losses.dice_jax(jnp.asarray(t), jnp.asarray(p), binarise=binarise)),
                losses.dice_np(t, p, binarise=binarise),
                rtol=1e-5,
            )


class TestSwappedArgBCE:
    """The reference calls weighted_cross_entropy_loss with swapped args
    (costs.py:129-136). Verify we reproduce that exact math."""

    def test_combined_dice_bce_value(self):
        t = _rand((2, 6, 6, 5), 5, binary=True)
        p = _softmax(_rand((2, 6, 6, 5), 6))
        got = float(losses.combined_dice_bce(jnp.asarray(t), jnp.asarray(p), 4))

        # independent numpy recompute of the swapped semantics
        n = p.reshape(-1, 5).sum(axis=0)  # class mass from PREDICTION
        w = n.sum() / (n + 1e-12)
        wce = -(p.reshape(-1, 5) * np.log(t.reshape(-1, 5) + 1e-12) * w).sum(1).mean()

        tt, pp = t[..., :4], p[..., :4]
        inter = (tt * pp).sum(axis=(1, 2, 3))
        union = tt.sum(axis=(1, 2, 3)) + pp.sum(axis=(1, 2, 3))
        dice = np.mean(1 - (2 * inter + 1e-12) / (union + 1e-12))

        np.testing.assert_allclose(got, dice + 0.01 * wce, rtol=1e-4)

    def test_perbatch_variant_shape_and_value(self):
        t = _rand((3, 6, 6, 5), 7, binary=True)
        p = _softmax(_rand((3, 6, 6, 5), 8))
        got = losses.combined_dice_bce_perbatch(jnp.asarray(t), jnp.asarray(p), 4)
        assert got.shape == (3,)

        # swapped semantics: softmax applied to the TRUTH (costs.py:88-108)
        n = p.sum(axis=(0, 1, 2))
        w = n.sum() / (n + 1e-12)
        sm_t = _softmax(t.reshape(3, 36, 5))
        wce = -(p.reshape(3, 36, 5) * np.log(sm_t + 1e-12) * w).sum(2).mean(1)
        tt, pp = t[..., :4], p[..., :4]
        inter = (tt * pp).sum(axis=(1, 2, 3))
        union = tt.sum(axis=(1, 2, 3)) + pp.sum(axis=(1, 2, 3))
        dice = 1 - (2 * inter + 1e-12) / (union + 1e-12)
        np.testing.assert_allclose(np.asarray(got), dice + 0.01 * wce, rtol=1e-4)


class TestVAEGan:
    def test_kl_formula(self):
        mu = _rand((4, 8), 9) - 0.5
        lv = _rand((4, 8), 10) - 0.5
        got = losses.kl_from_stats(jnp.asarray(mu), jnp.asarray(lv))
        expect = -0.5 * np.sum(1 + lv - mu ** 2 - np.exp(lv), axis=-1)[:, None]
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5)

    def test_lsgan_losses(self):
        d = jnp.asarray([[0.3], [0.8]])
        np.testing.assert_allclose(
            float(losses.lsgan_fool(d)), np.mean((np.array([0.3, 0.8]) - 1) ** 2), rtol=1e-6
        )
        got = float(losses.lsgan_disc(d, d))
        expect = np.mean((np.array([0.3, 0.8]) - 1) ** 2) + np.mean(
            np.array([0.3, 0.8]) ** 2
        )
        np.testing.assert_allclose(got, expect, rtol=1e-6)

    def test_mae_perbatch_shape(self):
        a = _rand((3, 6, 6, 1), 11)
        b = _rand((3, 6, 6, 1), 12)
        got = losses.mae_perbatch(jnp.asarray(a), jnp.asarray(b))
        assert got.shape == (3, 1)
        np.testing.assert_allclose(
            np.asarray(got)[:, 0], np.abs(a - b).mean(axis=(1, 2))[:, 0], rtol=1e-5
        )

    def test_similarity_weighted_mae(self):
        w = _rand((3, 1), 13)
        a = _rand((3, 6, 6, 1), 14)
        b = _rand((3, 6, 6, 1), 15)
        got = float(losses.similarity_weighted_mae(jnp.asarray(w), jnp.asarray(a), jnp.asarray(b)))
        expect = np.mean(np.abs(a - b) * w[:, None, None, :])
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_similarity_weighted_dice(self):
        w = _rand((3,), 16)
        t = _rand((3, 6, 6, 4), 17, binary=True)
        p = _rand((3, 6, 6, 5), 18)
        got = float(
            losses.similarity_weighted_dice(jnp.asarray(w), jnp.asarray(t), jnp.asarray(p), 4)
        )
        tt, pp = t[..., :4], p[..., :4]
        inter = (tt * pp).sum(axis=(1, 2, 3))
        union = tt.sum(axis=(1, 2, 3)) + pp.sum(axis=(1, 2, 3))
        d = (2 * inter + 1e-5) / (union + 1e-5)
        np.testing.assert_allclose(got, np.mean(w * (1 - d)), rtol=1e-5)


class TestDiceNpVolume:
    def test_whole_volume_per_class(self):
        # (D,H,W,C): class 0 half-overlaps, class 1 perfectly
        t = np.zeros((4, 8, 8, 2))
        p = np.zeros((4, 8, 8, 2))
        t[:, :4, :, 0] = 1.0
        p[:, 2:6, :, 0] = 1.0  # intersection half of each
        t[:, :, :2, 1] = 1.0
        p[:, :, :2, 1] = 1.0
        from multimodal_segmentation_tpu.losses import dice_np_volume

        got = dice_np_volume(t, p)
        np.testing.assert_allclose(got, (0.5 + 1.0) / 2, rtol=1e-6)

    def test_absent_class_not_inflated(self):
        # a class absent from both truth and prediction must NOT score 1.0
        # into the mean (the per-slice dice_np averaging bug, ADVICE r1)
        t = np.zeros((4, 8, 8, 2))
        p = np.zeros((4, 8, 8, 2))
        t[0, :4, :, 0] = 1.0  # class 0 exists only on slice 0
        p[0, :4, :, 0] = 1.0
        from multimodal_segmentation_tpu.losses import dice_np_volume

        # class 1 empty everywhere -> excluded; class 0 perfect -> 1.0
        np.testing.assert_allclose(dice_np_volume(t, p), 1.0, rtol=1e-6)
        # and a completely empty pair scores 1.0 (correctly empty)
        np.testing.assert_allclose(
            dice_np_volume(np.zeros((2, 4, 4, 1)), np.zeros((2, 4, 4, 1))), 1.0
        )

    def test_false_positive_on_empty_truth_counts(self):
        t = np.zeros((2, 4, 4, 1))
        p = np.ones((2, 4, 4, 1))
        from multimodal_segmentation_tpu.losses import dice_np_volume

        assert dice_np_volume(t, p) == 0.0
