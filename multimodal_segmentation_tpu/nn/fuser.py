"""Anatomy fuser: LocNet predicts TPS control-point offsets; the first
anatomy is deformed into the second's space and fused with pixelwise max.

Reference: model_components/anatomy_fuser.py:12-38 and
layers/stn_spline.py:94-118 (build_locnet).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_segmentation_tpu.nn.blocks import leaky_relu, max_pool2
from multimodal_segmentation_tpu.ops.tps import tps_warp


class LocNet(nn.Module):
    """Localisation net predicting 5x5x2 control-point offsets.

    Zero-initialised final Dense so training starts at the identity warp
    (stn_spline.py:116).
    """

    cp_points: int = 25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s1, s2, train: bool = False):
        x = jnp.concatenate(
            [s1.astype(self.dtype), s2.astype(self.dtype)], axis=-1
        )
        for _ in range(2):
            x = nn.Conv(20, (5, 5), padding="VALID", dtype=self.dtype)(x)
            x = leaky_relu(x)
            x = max_pool2(x)
        x = nn.Conv(20, (5, 5), padding="VALID", dtype=self.dtype)(x)
        x = leaky_relu(x)
        x = x.reshape(x.shape[0], -1)
        # offset head in f32: zero-init + sub-pixel offsets need range
        x = nn.tanh(nn.Dense(100)(x.astype(jnp.float32)))
        theta = nn.Dense(
            self.cp_points * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(x)
        return theta.reshape(-1, self.cp_points, 2)


class AnatomyFuser(nn.Module):
    """Deform s1 -> s2 space via TPS-STN; fuse with max (anatomy_fuser.py:28-33).

    tps_impl selects the warp implementation:
      'auto'   — the fused Pallas kernel on TPU backends under bf16
                 compute (single chip or mesh: the kernel carries a GSPMD
                 batch-partition rule, ops/pallas_kernels.py), the jnp
                 (XLA gather) path elsewhere (CPU tests, f32 runs);
      'pallas' — force the kernel (interpret mode off-TPU, so virtual-mesh
                 CPU runs exercise the real partitioned code path);
      'jnp'    — force the gather path.
    The warp is the step's dominant HBM consumer on TPU via the jnp path
    (PERF.md round 3), so 'auto' is the production default.
    """

    cp_dims: tuple = (5, 5)
    dtype: Any = jnp.float32
    tps_impl: str = "auto"
    # Eval-time fast-warp knob (config.eval_warp == 'bf16'): route the
    # inference warp through the Pallas kernel with single-pass bf16
    # blends even when the model computes in f32. The blend matmul rounds
    # the warped anatomy by ~1e-3 absolute (PERF.md round 3); binarised
    # test Dice on the synthetic protocol is unchanged to 3 decimals
    # (tools/eval_warp_parity.py), and it removes the dominant cost of the
    # 'def'/'max' fusion paths (BENCH_latency.json, VERDICT r4 weak #6).
    eval_blend_bf16: bool = False

    def setup(self):
        self.locnet = LocNet(self.cp_dims[0] * self.cp_dims[1], self.dtype)

    def _use_pallas(self):
        if self.tps_impl == "pallas":
            return True
        if self.tps_impl == "jnp":
            return False
        # auto: the kernel wins only with single-pass bf16 blends (f32
        # HIGHEST blends run 6 MXU passes and lose to the XLA gather,
        # tools/time_warp.py). Mesh runs keep the kernel: the pallas call
        # carries a GSPMD batch-partition rule.
        return (
            jax.default_backend() == "tpu"
            and jnp.dtype(self.dtype) == jnp.bfloat16
        )

    def __call__(self, s1, s2, train: bool = False, fast: bool = False):
        theta = self.locnet(s1, s2, train)
        # the TPS solve/flow is precision-sensitive: always f32. The image
        # being warped is not: on the Pallas path with bf16 blends the
        # kernel multiplies bf16 casts of the source anyway, so the source
        # stays in its native dtype — an f32 upcast here made the kernel's
        # HBM I/O (src + the 128-lane output + the backward cotangent)
        # ~1.6 GB/step of pure f32 waste (round-4 trace).
        # `fast` is the call-site opt-in (predict_mask only): the training
        # step's eval-mode fuses (discriminator fake pools) must not change
        # numerics under an f32 run, so the knob never applies there.
        fast_eval = (
            fast
            and not train
            and self.eval_blend_bf16
            and jax.default_backend() == "tpu"
        )
        use_pallas = self._use_pallas() or fast_eval
        blend_bf16 = jnp.dtype(self.dtype) == jnp.bfloat16 or fast_eval
        src = s1 if (use_pallas and blend_bf16) else s1.astype(jnp.float32)
        s1_def = tps_warp(
            src, theta.astype(jnp.float32),
            cp_dims=self.cp_dims,
            use_pallas=use_pallas,
            blend_bf16=blend_bf16,
            interpret=jax.default_backend() != "tpu",
        ).astype(s1.dtype)
        s_fused = jnp.maximum(s1_def, s2)
        return s1_def, s_fused
