"""Unit tests for core ops against independent numpy/scipy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_segmentation_tpu.ops import (
    bilinear_sample,
    control_grid,
    round_ste,
    spectral_penalty,
    tps_warp,
)
from multimodal_segmentation_tpu.ops.augment import random_rotate_batch
from multimodal_segmentation_tpu.ops.tps import solve_tps, _phi, _sq_dist


class TestRoundSTE:
    def test_forward_rounds(self):
        x = jnp.array([0.2, 0.5, 0.7, 1.4])
        np.testing.assert_allclose(round_ste(x), np.round([0.2, 0.5, 0.7, 1.4]))

    def test_gradient_is_identity(self):
        x = jnp.array([0.2, 0.7, 1.4])
        g = jax.grad(lambda v: jnp.sum(round_ste(v) * jnp.array([1.0, 2.0, 3.0])))(x)
        np.testing.assert_allclose(g, [1.0, 2.0, 3.0])


class TestBilinearSample:
    def test_integer_coords_identity(self):
        img = jnp.arange(24.0).reshape(4, 6, 1)
        ys, xs = np.mgrid[0:4, 0:6]
        coords = jnp.asarray(np.stack([ys.ravel(), xs.ravel()], -1), jnp.float32)
        out = bilinear_sample(img, coords).reshape(4, 6, 1)
        np.testing.assert_allclose(out, img)

    def test_midpoint_blend(self):
        img = jnp.array([[[0.0], [1.0]], [[2.0], [3.0]]])
        out = bilinear_sample(img, jnp.array([[0.5, 0.5]]))
        np.testing.assert_allclose(out, [[1.5]])

    def test_out_of_bounds_zero(self):
        img = jnp.ones((4, 4, 2))
        out = bilinear_sample(img, jnp.array([[-2.0, 1.0], [1.0, 10.0]]))
        np.testing.assert_allclose(out, np.zeros((2, 2)))

    def test_partial_boundary(self):
        # At y=-0.5 only the y=0 row is in-bounds; the resampler zeroes the
        # out-of-bounds corner so the result is half the edge value.
        img = jnp.ones((4, 4, 1))
        out = bilinear_sample(img, jnp.array([[-0.5, 1.0]]))
        np.testing.assert_allclose(out, [[0.5]])

    def test_gradient_flows(self):
        img = jnp.ones((4, 4, 1))

        def f(c):
            return jnp.sum(bilinear_sample(jnp.arange(16.0).reshape(4, 4, 1), c))

        g = jax.grad(f)(jnp.array([[1.3, 2.2]]))
        assert np.all(np.isfinite(g))
        assert np.any(g != 0)


@pytest.mark.slow
class TestTPS:
    def test_control_grid_matches_reference_layout(self):
        # reference layers/stn_spline.py:70-91: row-major (y,x), normalised
        g = np.asarray(control_grid([3, 3]))
        expected = np.array(
            [[0, 0], [0, 0.5], [0, 1], [0.5, 0], [0.5, 0.5], [0.5, 1],
             [1, 0], [1, 0.5], [1, 1]],
            dtype=np.float32,
        )
        np.testing.assert_allclose(g, expected)

    def test_solve_exactly_interpolates(self):
        rng = np.random.RandomState(0)
        pts = np.asarray(control_grid([4, 4]))
        vals = pts + 0.05 * rng.randn(16, 2).astype(np.float32)
        w, v = solve_tps(jnp.asarray(pts), jnp.asarray(vals))
        # Evaluate the spline at the training points: must reproduce values.
        phi = _phi(_sq_dist(jnp.asarray(pts), jnp.asarray(pts)))
        pad = jnp.concatenate([pts, np.ones((16, 1), np.float32)], axis=1)
        recon = phi @ w + pad @ v
        # f32 solve of the (moderately ill-conditioned) TPS system carries
        # ~0.5% error — same precision class as the reference's f32
        # tf.matrix_solve (layers/interpolate_spline.py:143).
        np.testing.assert_allclose(recon, vals, atol=5e-3)

    def test_zero_offsets_is_identity_warp(self):
        rng = np.random.RandomState(1)
        vol = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
        offsets = jnp.zeros((2, 25, 2))
        warped = tps_warp(vol, offsets)
        np.testing.assert_allclose(warped, vol, atol=1e-3)

    def test_constant_shift(self):
        # Shifting every control point by +1 pixel in y samples from y+1.
        H = W = 16
        vol = np.zeros((1, H, W, 1), np.float32)
        vol[0, :, :, 0] = np.arange(H)[:, None]  # value == row index
        shift = 1.0 / (H - 1)
        offsets = jnp.full((1, 25, 2), 0.0).at[:, :, 0].set(shift)
        warped = np.asarray(tps_warp(jnp.asarray(vol), offsets))
        # Interior rows should now hold row+1.
        np.testing.assert_allclose(
            warped[0, 2:-2, 2:-2, 0], vol[0, 3:-1, 2:-2, 0], atol=1e-2
        )

    def test_gradients_flow_to_offsets(self):
        vol = jnp.asarray(np.random.RandomState(2).rand(1, 12, 12, 2).astype(np.float32))

        def loss(off):
            return jnp.sum(tps_warp(vol, off) ** 2)

        g = jax.grad(loss)(jnp.zeros((1, 25, 2)) + 0.01)
        assert np.all(np.isfinite(g))
        assert np.any(np.abs(g) > 0)


@pytest.mark.slow
class TestSpectral:
    def test_penalty_matches_svd_normalised_target(self):
        rng = np.random.RandomState(3)
        w = rng.randn(3, 3, 8, 16).astype(np.float32)
        x = w.reshape(-1, 16)
        u0 = rng.rand(x.shape[0], 1).astype(np.float32) * 2 - 1
        # Converge power iteration well past the reference's 3 steps.
        penalty, u = spectral_penalty(jnp.asarray(w), jnp.asarray(u0), alpha=10.0, iters=50)
        sigma_true = np.linalg.svd(x, compute_uv=False)[0]
        expected = 10.0 * np.mean(np.abs(x / sigma_true - x))
        np.testing.assert_allclose(float(penalty), expected, rtol=1e-3)

    def test_gradient_only_through_raw_weights(self):
        rng = np.random.RandomState(4)
        w = jnp.asarray(rng.randn(4, 8).astype(np.float32))
        u0 = jnp.asarray(rng.rand(4, 1).astype(np.float32))

        def f(w_):
            p, _ = spectral_penalty(w_, u0, alpha=2.0, iters=3)
            return p

        g = jax.grad(f)(w)
        # d/dw of alpha*mean|stop_grad(t) - w| = alpha * sign(w - t) / N
        p, _ = spectral_penalty(w, u0, alpha=2.0, iters=3)
        x = np.asarray(w)
        # recompute target
        u = np.asarray(u0)
        for _ in range(3):
            wtu = x.T @ u
            v = wtu / np.sqrt((wtu ** 2).sum() + 1e-12)
            wv = x @ v
            u = wv / np.sqrt((wv ** 2).sum() + 1e-12)
        sigma = (u.T @ x @ v)[0, 0]
        target = x / sigma
        expected_g = 2.0 * np.sign(x - target) / x.size
        np.testing.assert_allclose(np.asarray(g), expected_g, atol=1e-5)


class TestAugment:
    def test_same_rotation_applied_to_all_arrays(self):
        rng = jax.random.PRNGKey(0)
        imgs = jnp.asarray(np.random.RandomState(5).rand(4, 16, 16, 1).astype(np.float32))
        out1, out2 = random_rotate_batch(rng, [imgs, imgs])
        np.testing.assert_allclose(out1, out2)

    def test_rotation_preserves_binary_masks(self):
        masks = np.zeros((2, 16, 16, 1), np.float32)
        masks[:, 4:10, 4:10] = 1.0
        (out,) = random_rotate_batch(jax.random.PRNGKey(1), [jnp.asarray(masks)])
        vals = np.unique(np.asarray(out))
        assert set(vals.tolist()) <= {0.0, 1.0}

    def test_zero_angle_identity(self):
        from multimodal_segmentation_tpu.ops.augment import rotate_batch

        imgs = jnp.asarray(np.random.RandomState(6).rand(2, 8, 8, 3).astype(np.float32))
        out = rotate_batch(imgs, jnp.zeros((2,)))
        np.testing.assert_allclose(out, imgs)

    def test_rotation_vs_scipy(self):
        from multimodal_segmentation_tpu.ops.augment import rotate_batch
        from scipy import ndimage

        rng = np.random.RandomState(7)
        img = rng.rand(1, 21, 21, 1).astype(np.float32)
        theta = 0.3
        out = np.asarray(rotate_batch(jnp.asarray(img), jnp.array([theta])))
        # scipy rotate with order-0, nearest mode, no reshape
        # rotation direction convention is irrelevant for the training
        # distribution (angles drawn symmetrically, base_executor.py:103);
        # accept either orientation, nearest-neighbour ties allowed.
        agree = max(
            np.mean(
                np.isclose(
                    out[0, :, :, 0],
                    ndimage.rotate(
                        img[0, :, :, 0], s * np.degrees(theta),
                        reshape=False, order=0, mode="nearest",
                    ),
                    atol=1e-6,
                )
            )
            for s in (1, -1)
        )
        assert agree > 0.9, agree
