"""Halo-exchange spatially-sharded convolution vs unsharded reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_segmentation_tpu.parallel.halo import halo_conv2d, halo_conv3d


def _ref_conv(x, k):
    kh, kw = k.shape[:2]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class TestHaloConv:
    def _mesh(self, n=4):
        return Mesh(np.array(jax.devices()[:n]), ("space",))

    @pytest.mark.parametrize("kh", [1, 3, 5])
    def test_matches_unsharded_same_conv(self, kh):
        r = np.random.RandomState(kh)
        x = jnp.asarray(r.rand(2, 32, 16, 4).astype(np.float32))
        k = jnp.asarray(r.rand(kh, kh, 4, 8).astype(np.float32))
        mesh = self._mesh()
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "space", None, None)))
        out = halo_conv2d(xs, k, mesh)
        ref = _ref_conv(x, k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_output_stays_sharded(self):
        r = np.random.RandomState(0)
        x = jnp.asarray(r.rand(1, 32, 16, 2).astype(np.float32))
        k = jnp.asarray(r.rand(3, 3, 2, 2).astype(np.float32))
        mesh = self._mesh()
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "space", None, None)))
        out = halo_conv2d(xs, k, mesh)
        assert len(out.sharding.device_set) == 4

    def test_conv3d_matches_unsharded(self):
        r = np.random.RandomState(5)
        x = jnp.asarray(r.rand(1, 16, 8, 8, 3).astype(np.float32))
        k = jnp.asarray(r.rand(3, 3, 3, 3, 4).astype(np.float32))
        mesh = self._mesh()
        xs = jax.device_put(
            x, NamedSharding(mesh, P(None, "space", None, None, None))
        )
        out = halo_conv3d(xs, k, mesh)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_jit_and_grad(self):
        r = np.random.RandomState(1)
        x = jnp.asarray(r.rand(1, 32, 16, 2).astype(np.float32))
        k = jnp.asarray(r.rand(3, 3, 2, 2).astype(np.float32))
        mesh = self._mesh()

        @jax.jit
        def loss(k_):
            xs = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, "space", None, None))
            )
            return jnp.sum(halo_conv2d(xs, k_, mesh) ** 2)

        g = jax.grad(loss)(k)
        # gradient parity vs unsharded
        g_ref = jax.grad(lambda k_: jnp.sum(_ref_conv(x, k_) ** 2))(k)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=2e-3)
