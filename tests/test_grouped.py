"""Grouped/batched component calls must reproduce per-invocation semantics.

The TPU train step batches what the reference runs as separate Keras layer
invocations (segmentor on 4 anatomy maps, shared UNet decoder on both
modalities, real+fake discriminator scoring) into single concatenated calls.
Grouped BatchNorm (nn/blocks.py::BatchNorm) must make the concatenated call
bit-compatible with per-call batch statistics (models/unet.py:94-101
semantics per invocation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_segmentation_tpu.nn.blocks import BatchNorm
from multimodal_segmentation_tpu.nn.anatomy_encoder import DualAnatomyEncoder
from multimodal_segmentation_tpu.nn.segmentor import Segmentor
from multimodal_segmentation_tpu.ops.batching import (
    batch_deinterleave,
    batch_interleave,
)


class TestGroupedBatchNorm:
    def _make(self, groups):
        return BatchNorm(
            use_running_average=False, momentum=0.99, epsilon=1e-3,
            groups=groups,
        )

    def test_matches_per_group_calls(self):
        G, B, H, W, C = 3, 4, 8, 8, 5
        xs = [
            jax.random.normal(jax.random.PRNGKey(g), (B, H, W, C))
            for g in range(G)
        ]
        bn1 = self._make(1)
        v = bn1.init(jax.random.PRNGKey(10), xs[0])
        # per-group reference: stock flax BN applied to each group's batch
        outs, stats = [], []
        for g in range(G):
            o, upd = bn1.apply(v, xs[g], mutable=["batch_stats"])
            outs.append(o)
            stats.append(upd["batch_stats"])
        ref = batch_interleave(outs)

        bng = self._make(G)
        # interleaved group layout (ops/batching.py): row b*G+g = group g
        got, upd_g = bng.apply(v, batch_interleave(xs), mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

        # running stats update = mean of the per-group updates (equal sizes)
        mean_ref = np.mean([np.asarray(s["mean"]) for s in stats], axis=0)
        np.testing.assert_allclose(
            np.asarray(upd_g["batch_stats"]["mean"]), mean_ref, atol=1e-6
        )

    def test_matches_per_group_calls_bf16(self):
        """Under bf16 compute the grouped path (stats in f32, one cast at
        the end) and the stock per-call path (flax's f32 stats, dtype-cast
        output) are numerically close but not bit-identical — lock the
        realistic tolerance (ADVICE r2)."""
        G, B, H, W, C = 2, 4, 8, 8, 5
        xs = [
            jax.random.normal(
                jax.random.PRNGKey(g), (B, H, W, C)
            ).astype(jnp.bfloat16)
            for g in range(G)
        ]
        bn1 = BatchNorm(
            use_running_average=False, momentum=0.99, epsilon=1e-3,
            groups=1, dtype=jnp.bfloat16,
        )
        v = bn1.init(jax.random.PRNGKey(10), xs[0])
        ref = batch_interleave(
            [bn1.apply(v, x, mutable=["batch_stats"])[0] for x in xs]
        )
        bng = BatchNorm(
            use_running_average=False, momentum=0.99, epsilon=1e-3,
            groups=G, dtype=jnp.bfloat16,
        )
        got, _ = bng.apply(v, batch_interleave(xs), mutable=["batch_stats"])
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=0.05, rtol=0.02,
        )

    def test_grouped_rejects_unsupported_config(self):
        x = jnp.zeros((4, 8, 8, 5))
        v = BatchNorm(use_running_average=False, groups=2).init(
            jax.random.PRNGKey(0), x
        )
        with pytest.raises(ValueError, match="axis=-1 only"):
            BatchNorm(use_running_average=False, groups=2, axis=1).apply(
                v, x, mutable=["batch_stats"]
            )
        with pytest.raises(ValueError, match="axis_name"):
            BatchNorm(
                use_running_average=False, groups=2, axis_name="data"
            ).apply(v, x, mutable=["batch_stats"])
        with pytest.raises(ValueError, match="divisible by groups"):
            BatchNorm(use_running_average=False, groups=3).apply(
                v, x, mutable=["batch_stats"]
            )

    def test_eval_mode_is_stock(self):
        B, H, W, C = 4, 8, 8, 5
        x = jax.random.normal(jax.random.PRNGKey(0), (2 * B, H, W, C))
        bn = BatchNorm(use_running_average=True, groups=2)
        v = bn.init(jax.random.PRNGKey(1), x)
        got = bn.apply(v, x)
        ref = BatchNorm(use_running_average=True, groups=1).apply(v, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref))

    def test_param_tree_unchanged(self):
        x = jnp.zeros((4, 8, 8, 5))
        v = BatchNorm(use_running_average=False, groups=2).init(
            jax.random.PRNGKey(0), x
        )
        assert set(v["params"].keys()) == {"scale", "bias"}
        assert set(v["batch_stats"].keys()) == {"mean", "var"}


class TestGroupedComponents:
    def test_dual_encoder_grouped_equals_per_modality(self):
        """__call__ (one grouped shared-path pass) == encode1/encode2
        (separate per-modality passes, per-call BN stats)."""
        enc = DualAnatomyEncoder(filters=4, downsample=2, out_channels=4,
                                 rounding=False)
        x1 = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 1))
        x2 = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
        v = enc.init(jax.random.PRNGKey(2), x1, x2)
        (s1g, s2g), _ = enc.apply(v, x1, x2, train=True,
                                  mutable=["batch_stats"])
        s1, _ = enc.apply(v, x1, train=True, mutable=["batch_stats"],
                          method=DualAnatomyEncoder.encode1)
        s2, _ = enc.apply(v, x2, train=True, mutable=["batch_stats"],
                          method=DualAnatomyEncoder.encode2)
        np.testing.assert_allclose(np.asarray(s1g), np.asarray(s1), atol=2e-5)
        np.testing.assert_allclose(np.asarray(s2g), np.asarray(s2), atol=2e-5)

    def test_segmentor_grouped_equals_per_call(self):
        seg = Segmentor(num_masks=4)
        ss = [
            jax.random.normal(jax.random.PRNGKey(i), (2, 16, 16, 8))
            for i in range(4)
        ]
        v = seg.init(jax.random.PRNGKey(9), ss[0])
        ref = batch_interleave(
            [seg.apply(v, s, train=True, mutable=["batch_stats"])[0]
             for s in ss]
        )
        got, _ = seg.apply(
            v, batch_interleave(ss), train=True, groups=4,
            mutable=["batch_stats"],
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
