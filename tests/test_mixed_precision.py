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


class TestLockstepDivergence:
    def test_bf16_f32_lockstep_training_divergence_bounded(self):
        """Lockstep short-training comparison (same data, same rng): the
        bf16-activation step's loss trajectory must track the f32 step's
        within a tight relative bound, de-risking running the real-data
        parity experiment in the fast bf16 config (VERDICT r3 item 8;
        reference regime: configuration/dafnet_config_chaos.py:6-25).

        Calibrated on this config: max relative divergence 0.49% over 40
        steps (mean 0.23%); asserted at 4x that.
        """
        from multimodal_segmentation_tpu.train.state import create_train_state
        from multimodal_segmentation_tpu.train.steps import make_steps

        def run(dtype, n=40):
            conf = tiny_test_config("dafnet")
            conf.compute_dtype = dtype
            model = build_model(conf)
            steps = make_steps(model, conf)
            ts = create_train_state(model, conf, jax.random.PRNGKey(0))
            r = np.random.RandomState(0)
            B, (H, W) = conf.batch_size, conf.input_hw
            nm = conf.num_masks
            batches = []
            for _ in range(8):
                batches.append({
                    k: jnp.asarray(
                        r.rand(B, H, W, c) * (2 if "x" in k else 1)
                        - (1 if "x" in k else 0),
                        jnp.float32,
                    )
                    for k, c in [
                        ("x1", 1), ("x2", 1), ("m1", nm), ("m2", nm),
                        ("dm1", nm), ("dm2", nm), ("dx1", 1), ("dx2", 1),
                    ]
                })
            out = []
            for i in range(n):
                ts, m = steps.step_supervised(ts, batches[i % 8])
                out.append(float(m["loss"]))
            return np.asarray(out)

        lf = run("float32")
        lb = run("bfloat16")
        rel = np.abs(lf - lb) / np.maximum(np.abs(lf), 1e-6)
        print("max rel divergence %.4f (mean %.4f)" % (rel.max(), rel.mean()))
        # both runs actually train
        assert lf[-1] < lf[0] and lb[-1] < lb[0]
        assert rel.max() < 0.02, (
            "bf16 trajectory diverged from f32 beyond the locked bound: "
            "max rel %.4f" % rel.max()
        )
        # endpoints agree tightly: same optimisation trajectory, not two
        # different-but-both-decreasing runs
        assert abs(lf[-1] - lb[-1]) / abs(lf[-1]) < 0.01
