"""Mixed-precision (bf16 activations, f32 params/losses) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_segmentation_tpu.config import tiny_test_config
from multimodal_segmentation_tpu.models import build_model
from tests.test_models import _split_params, make_batch

pytestmark = pytest.mark.slow


class TestBF16:
    def test_params_stay_f32(self):
        conf = tiny_test_config("dafnet")
        conf.compute_dtype = "bfloat16"
        model = build_model(conf)
        params, state = model.init(jax.random.PRNGKey(0))
        for leaf in jax.tree_util.tree_leaves(params):
            assert leaf.dtype == jnp.float32, leaf.dtype

    def test_gen_loss_finite_and_close_to_f32(self):
        conf32 = tiny_test_config("dafnet")
        conf16 = tiny_test_config("dafnet")
        conf16.compute_dtype = "bfloat16"
        m32 = build_model(conf32)
        m16 = build_model(conf16)
        p, s = m32.init(jax.random.PRNGKey(0))
        batch = make_batch(conf32)
        g, d = _split_params(p, m32.GEN_COMPONENTS)
        l32, (met32, _) = m32.gen_loss_expert(
            g, d, s, batch, jax.random.PRNGKey(1), True
        )
        l16, (met16, _) = m16.gen_loss_expert(
            g, d, s, batch, jax.random.PRNGKey(1), True
        )
        assert np.isfinite(float(l16))
        assert float(l16.dtype == jnp.float32)
        # same params, bf16 activations: loss within a few percent
        np.testing.assert_allclose(float(l16), float(l32), rtol=0.1)

    def test_bf16_gradients_finite(self):
        conf = tiny_test_config("dafnet")
        conf.compute_dtype = "bfloat16"
        model = build_model(conf)
        params, state = model.init(jax.random.PRNGKey(0))
        g, d = _split_params(params, model.GEN_COMPONENTS)
        batch = make_batch(conf)
        grads = jax.grad(
            lambda gp: model.gen_loss_expert(
                gp, d, state, batch, jax.random.PRNGKey(1), True
            )[0]
        )(g)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
