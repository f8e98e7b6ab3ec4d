"""Pallas kernel tests (interpreter mode on CPU; real-TPU validation lives
in tools/bench_pallas.py, run on hardware)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from multimodal_segmentation_tpu.ops.pallas_kernels import (
    round_ste_pallas,
    tps_bilinear_warp_pallas,
)
from multimodal_segmentation_tpu.ops.tps import (
    control_grid,
    tps_coefficients,
    tps_warp,
)

pytestmark = pytest.mark.slow


class TestRoundPallas:
    def test_matches_jnp_round(self):
        x = jnp.asarray(
            np.random.RandomState(0).rand(4, 16, 16, 8).astype(np.float32) * 2
        )
        with pltpu.force_tpu_interpret_mode():
            out = round_ste_pallas(x)
        np.testing.assert_allclose(np.asarray(out), np.round(np.asarray(x)))

    def test_identity_gradient(self):
        x = jnp.asarray(np.random.RandomState(1).rand(256).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(lambda v: jnp.sum(round_ste_pallas(v) * 3.0))(x)
        np.testing.assert_allclose(np.asarray(g), 3.0)

    def test_unaligned_shape_fallback(self):
        x = jnp.asarray(np.random.RandomState(2).rand(7, 3).astype(np.float32))
        out = round_ste_pallas(x)  # falls back to jnp, no pallas_call
        np.testing.assert_allclose(np.asarray(out), np.round(np.asarray(x)))


class TestWarpPallas:
    def _setup(self, B=2, H=16, W=16, C=8, seed=3):
        r = np.random.RandomState(seed)
        vol = jnp.asarray(r.rand(B, H, W, C).astype(np.float32))
        off = jnp.asarray((r.rand(B, 25, 2).astype(np.float32) - 0.5) * 0.05)
        return vol, off

    def test_matches_jnp_path(self):
        vol, off = self._setup()
        ref = np.asarray(tps_warp(vol, off))
        wv = tps_coefficients(off)
        cp = control_grid([5, 5])
        with pltpu.force_tpu_interpret_mode():
            out = tps_bilinear_warp_pallas(vol, wv, cp, block_points=128)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    def test_identity_offsets(self):
        vol, _ = self._setup()
        off = jnp.zeros((2, 25, 2))
        wv = tps_coefficients(off)
        cp = control_grid([5, 5])
        with pltpu.force_tpu_interpret_mode():
            out = tps_bilinear_warp_pallas(vol, wv, cp, block_points=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=2e-3)

    def test_use_pallas_flag_in_tps_warp(self):
        vol, off = self._setup()
        ref = np.asarray(tps_warp(vol, off))
        with pltpu.force_tpu_interpret_mode():
            out = tps_warp(vol, off, use_pallas=True)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


class TestWarpPallasBackward:
    """tps_warp(use_pallas=True) is trainable: its custom VJP runs the
    dense bilinear-gather gradient in a Pallas kernel
    (tps_bilinear_warp_bwd_pallas) and the small solve chain through the
    XLA vjp, so gradients must match the jnp path."""

    def test_gradients_match_jnp_path(self):
        r = np.random.RandomState(11)
        vol = jnp.asarray(r.rand(2, 16, 16, 8).astype(np.float32))
        off = jnp.asarray((r.rand(2, 25, 2).astype(np.float32) - 0.5) * 0.05)
        tgt = jnp.asarray(r.rand(2, 16, 16, 8).astype(np.float32))

        def loss(fn):
            return lambda v, o: jnp.mean((fn(v, o) - tgt) ** 2)

        g_ref = jax.grad(loss(lambda v, o: tps_warp(v, o)), argnums=(0, 1))(
            vol, off
        )
        with pltpu.force_tpu_interpret_mode():
            g_pal = jax.grad(
                loss(lambda v, o: tps_warp(v, o, use_pallas=True)),
                argnums=(0, 1),
            )(vol, off)
        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
            )


class TestWarpPallasBf16Blends:
    """blend_bf16=True runs the bilinear blend matmuls in one bf16 MXU pass
    (the training default under bf16 compute, nn/fuser.py); the RBF flow
    matmul stays f32-HIGHEST, so the error budget is the bf16 rounding of
    blend weights and image values (~1e-2 absolute on O(1) data)."""

    def test_forward_close_to_f32(self):
        r = np.random.RandomState(5)
        vol = jnp.asarray(r.rand(2, 16, 16, 8).astype(np.float32))
        off = jnp.asarray((r.rand(2, 25, 2).astype(np.float32) - 0.5) * 0.05)
        ref = np.asarray(tps_warp(vol, off))
        with pltpu.force_tpu_interpret_mode():
            out = tps_warp(vol, off, use_pallas=True, blend_bf16=True)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2)

    def test_gradients_close_to_f32(self):
        r = np.random.RandomState(6)
        vol = jnp.asarray(r.rand(2, 16, 16, 8).astype(np.float32))
        off = jnp.asarray((r.rand(2, 25, 2).astype(np.float32) - 0.5) * 0.05)
        tgt = jnp.asarray(r.rand(2, 16, 16, 8).astype(np.float32))

        def loss(fn):
            return lambda v, o: jnp.mean((fn(v, o) - tgt) ** 2)

        g_ref = jax.grad(loss(lambda v, o: tps_warp(v, o)), argnums=(0, 1))(
            vol, off
        )
        with pltpu.force_tpu_interpret_mode():
            g_pal = jax.grad(
                loss(
                    lambda v, o: tps_warp(
                        v, o, use_pallas=True, blend_bf16=True
                    )
                ),
                argnums=(0, 1),
            )(vol, off)
        # vol grads are O(1e-2); offset grads are large (pixel-scale chain)
        np.testing.assert_allclose(
            np.asarray(g_ref[0]), np.asarray(g_pal[0]), atol=2e-2
        )
        scale = np.abs(np.asarray(g_ref[1])).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(g_ref[1]) / scale, np.asarray(g_pal[1]) / scale,
            atol=2e-2,
        )


class TestWarpPartitionRule:
    """GSPMD batch-partition rule for the warp kernels (VERDICT r3 item 2):
    under a mesh the pallas call shards along the batch axis instead of
    falling back to the XLA gather path. Exercised in interpret mode on the
    virtual 8-device CPU mesh; semantics: reference layers/stn_spline.py:55-67."""

    def test_mesh_parity_fwd_bwd(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        r = np.random.RandomState(11)
        vol = jnp.asarray(r.rand(8, 32, 32, 4), jnp.float32)
        off = jnp.asarray(r.randn(8, 25, 2) * 0.02, jnp.float32)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        sh = NamedSharding(mesh, P("data"))

        def loss(v, o, use_pallas):
            return jnp.sum(
                jnp.square(tps_warp(v, o, use_pallas=use_pallas, interpret=True))
            )

        f_pal = jax.jit(
            jax.value_and_grad(lambda v, o: loss(v, o, True), argnums=(0, 1)),
            in_shardings=(sh, sh),
        )
        f_jnp = jax.jit(
            jax.value_and_grad(lambda v, o: loss(v, o, False), argnums=(0, 1)),
        )
        vp, (gv_p, go_p) = f_pal(vol, off)
        vj, (gv_j, go_j) = f_jnp(vol, off)
        np.testing.assert_allclose(float(vp), float(vj), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_j), atol=1e-4)
        scale = float(jnp.max(jnp.abs(go_j))) + 1e-8
        assert float(jnp.max(jnp.abs(go_p - go_j))) / scale < 1e-4

        # the partition rule must actually engage (no unpartitioned
        # fallback): the compiled module carries the custom_partitioning
        # calls produced by the rule
        comp = f_pal.lower(vol, off).compile().as_text()
        assert "custom_partitioning" in comp


class TestWarpPallasBf16Volume:
    """The fuser feeds the kernel its NATIVE bf16 anatomies under mixed
    precision (round 4: the old f32 upcast cost ~1.6 GB/step of kernel HBM
    I/O). bf16 vol + bf16 blends must stay within the bf16 error budget of
    the f32 jnp path, fwd and bwd."""

    def test_bf16_volume_forward_and_grads(self):
        r = np.random.RandomState(7)
        vol32 = jnp.asarray(r.rand(2, 16, 16, 8).astype(np.float32))
        off = jnp.asarray((r.rand(2, 25, 2).astype(np.float32) - 0.5) * 0.05)
        tgt = jnp.asarray(r.rand(2, 16, 16, 8).astype(np.float32))
        ref = np.asarray(tps_warp(vol32, off))

        vol16 = vol32.astype(jnp.bfloat16)
        with pltpu.force_tpu_interpret_mode():
            out = tps_warp(vol16, off, use_pallas=True, blend_bf16=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), ref, atol=3e-2
        )

        def loss(fn, v, o):
            return jnp.mean((fn(v, o).astype(jnp.float32) - tgt) ** 2)

        g_ref = jax.grad(
            functools.partial(loss, lambda v, o: tps_warp(v, o)),
            argnums=(0, 1),
        )(vol32, off)
        with pltpu.force_tpu_interpret_mode():
            g_pal = jax.grad(
                functools.partial(
                    loss,
                    lambda v, o: tps_warp(
                        v, o, use_pallas=True, blend_bf16=True
                    ),
                ),
                argnums=(0, 1),
            )(vol16, off)
        assert g_pal[0].dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(g_pal[0], np.float32), np.asarray(g_ref[0]), atol=3e-2
        )
        scale = np.abs(np.asarray(g_ref[1])).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(g_pal[1]) / scale, np.asarray(g_ref[1]) / scale,
            atol=3e-2,
        )


class TestNearestWarpKernel:
    """ops/augment.py rotation routed through the nearest-warp kernel must
    match the jnp gather path exactly (one-hot selection: bit-exact for
    {0,1} masks, identical rounding/edge-clamp for images)."""

    def test_matches_jnp_rotation_exactly(self):
        from multimodal_segmentation_tpu.ops.augment import rotate_batch

        r = np.random.RandomState(11)
        B, H, W, C = 3, 16, 16, 8  # W*C = 128
        imgs = jnp.asarray(r.rand(B, H, W, C).astype(np.float32) * 2 - 1)
        masks = jnp.asarray((r.rand(B, H, W, C) > 0.7).astype(np.float32))
        thetas = jnp.asarray((r.rand(B).astype(np.float32) - 0.5) * 0.7)

        for x in (imgs, masks):
            ref = rotate_batch(x, thetas, impl="jnp")
            with pltpu.force_tpu_interpret_mode():
                got = rotate_batch(x, thetas, impl="pallas")
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_mask_binary_exact(self):
        from multimodal_segmentation_tpu.ops.augment import rotate_batch

        r = np.random.RandomState(12)
        masks = jnp.asarray((r.rand(2, 16, 16, 8) > 0.5).astype(np.float32))
        thetas = jnp.asarray(np.array([0.3, -0.2], np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(rotate_batch(masks, thetas, impl="pallas"))
        assert set(np.unique(got)) <= {0.0, 1.0}
