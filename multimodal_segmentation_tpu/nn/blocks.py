"""Shared building blocks: conv blocks, normalisation, upsampling.

Reference semantics: models/unet.py:94-101 (conv_block) and
utils/model_utils.py:6-24 (normalise / upsample_block).
"""

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

he_normal = nn.initializers.he_normal()
glorot_uniform = nn.initializers.glorot_uniform()
glorot_normal = nn.initializers.glorot_normal()


class BatchNorm(nn.BatchNorm):
    """nn.BatchNorm with optional per-group batch statistics.

    The TPU train step batches what the reference runs as SEPARATE Keras
    layer invocations (e.g. the segmentor applied to 4 anatomy maps, the
    shared UNet decoder applied to both modalities) into ONE kernel on the
    batch-stacked input — far fewer, larger XLA fusions. Each reference
    invocation computed BatchNorm statistics over ITS OWN batch, so with
    `groups=G` the (B*G, ...) input is normalised with statistics over
    each B-sized group, reproducing per-invocation stats exactly. Running
    statistics are updated once with the mean of the group means/vars
    (equal group sizes: the global batch moments) — vs. the reference's G
    sequential momentum updates; the fixed point is identical and the
    transient difference is O((1-momentum)^2). Subclass (not a new module)
    so the auto-name stays "BatchNorm_N" and parameter trees/checkpoints
    are unchanged.

    Group layout is INTERLEAVED (models/base.py::batch_interleave): row
    b*G + g belongs to group g. The sharded batch dim then stays major
    through every reshape, so a 'data'-sharded mesh keeps all rows local
    and the only cross-device traffic grouped BN adds is the (G, C) stats
    all-reduce (round-4 collective audit).
    """

    groups: int = 1

    @nn.compact
    def __call__(self, x, use_running_average=None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        # This path hardcodes feature-axis -1 and plain batch stats; fail
        # loudly if a caller ever configures the inherited knobs it does
        # not honour.
        if self.axis != -1:
            raise ValueError(
                f"BatchNorm here supports axis=-1 only, got axis={self.axis}"
            )
        if self.axis_name is not None:
            raise ValueError(
                "BatchNorm here does not support axis_name "
                f"(got {self.axis_name!r}); cross-device stats are handled "
                "by GSPMD on the concatenated batch"
            )

        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,)
        )
        scale = (
            self.param("scale", self.scale_init, (c,), self.param_dtype)
            if self.use_scale else None
        )
        bias = (
            self.param("bias", self.bias_init, (c,), self.param_dtype)
            if self.use_bias else None
        )

        # Every mode (train grouped/ungrouped, eval) normalises in the
        # compute dtype with f32 statistics — NOT via stock flax, whose
        # _normalize computes (x - mean) * rsqrt(var + eps) entirely in
        # f32 and casts to the output dtype only at the end: under bf16
        # that materialises f32 copies of the largest activations in the
        # forward AND saves them for the backward (the dominant remaining
        # f32 HBM traffic in the round-4 copy/HLO analysis). Here the f32
        # casts feed only reductions (fused, nothing f32 is materialised)
        # and the elementwise normalise runs at the activation width. At
        # f32 the math is bit-identical to stock flax.
        g = 1 if use_ra else self.groups
        if x.shape[0] % g != 0:
            raise ValueError(
                f"grouped BatchNorm needs batch divisible by groups: "
                f"batch={x.shape[0]}, groups={g}"
            )
        # interleaved layout: row b*g + k is group k's sample b, so the
        # (possibly 'data'-sharded) per-group batch dim stays MAJOR
        xg = x.reshape((x.shape[0] // g, g) + x.shape[1:])
        red = (0,) + tuple(range(2, xg.ndim - 1))

        if use_ra:
            mean_g = ra_mean.value[None]  # (1, C) running statistics
            var_g = ra_var.value[None]
        else:
            mean_g = jnp.mean(xg.astype(jnp.float32), red)  # (G, C)
            var_g = jnp.maximum(
                jnp.mean(jnp.square(xg.astype(jnp.float32)), red)
                - jnp.square(mean_g),
                0.0,
            )
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * jnp.mean(mean_g, 0)
                ra_var.value = m * ra_var.value + (1 - m) * jnp.mean(var_g, 0)

        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        shape_g = (1, g) + (1,) * (xg.ndim - 3) + (c,)
        mean_c = mean_g.reshape(shape_g).astype(out_dtype)
        var_c = var_g.reshape(shape_g).astype(out_dtype)
        y = xg.astype(out_dtype) - mean_c
        mul = jax.lax.rsqrt(var_c + jnp.asarray(self.epsilon, out_dtype))
        if scale is not None:
            mul = mul * scale.astype(out_dtype)
        y = y * mul
        if bias is not None:
            y = y + bias.astype(out_dtype)
        return y.reshape(x.shape)


def leaky_relu(x, alpha=0.3):
    """Keras LeakyReLU default alpha is 0.3 (used where the reference calls
    LeakyReLU() with no argument, e.g. model_components/modality_encoder.py)."""
    return nn.leaky_relu(x, negative_slope=alpha)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalisation over spatial dims.

    Matches keras_contrib InstanceNormalization (utils/model_utils.py:3;
    layers/spade.py:27 uses scale=False, center=False). Statistics always
    compute in f32 regardless of the activation dtype.
    """

    epsilon: float = 1e-3
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        # Statistics in f32 via reduction inputs only (the f32 cast feeds
        # reductions, so XLA fuses it without materialising an f32 copy of
        # the activation); the normalised output stays in the input dtype,
        # which is what keeps activation HBM traffic bf16 under mixed
        # precision.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        inv = jax.lax.rsqrt(var + self.epsilon).astype(in_dtype)
        y = (x - mean.astype(in_dtype)) * inv
        c = x.shape[-1]
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (c,)).astype(in_dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (c,)).astype(in_dtype)
        return y


class Norm(nn.Module):
    """Switchable normalisation ('batch' | 'instance' | none).

    Matches utils/model_utils.py:6-13. BatchNorm hyperparameters follow
    Keras 2.1.6 defaults (momentum 0.99, epsilon 1e-3).
    """

    kind: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False, groups: int = 1):
        if self.kind == "batch":
            # BN batch statistics, running stats and scale/bias params stay
            # f32 (flax computes stats in f32 for low-precision inputs);
            # the normalised activation itself stays in the input dtype so
            # bf16 runs do not round-trip f32 tensors through HBM.
            return BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=x.dtype, groups=groups,
            )(x)
        if self.kind == "instance":
            return InstanceNorm()(x)
        return x


class ConvBlock(nn.Module):
    """[Conv3x3(he_normal) -> norm -> relu] x 2 (models/unet.py:94-101).

    remat=True rematerialises the block in the backward pass: only the
    block INPUT is saved; norm/activation intermediates are recomputed
    from it during the backward. On TPU the UNet step is HBM-bound with
    the MXU ~idle, so trading conv re-FLOPs for saved-activation traffic
    is the right direction (PERF.md round 3). The function-wrapping form
    keeps parameter/variable paths identical to the non-remat module.
    """

    filters: int
    norm: str = "batch"
    dtype: Any = jnp.float32
    remat: bool = False

    def _body(self, x, train, groups):
        x = nn.Conv(self.filters, (3, 3), padding="SAME", kernel_init=he_normal,
                    dtype=self.dtype)(x)
        x = Norm(self.norm)(x, train, groups)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (3, 3), padding="SAME", kernel_init=he_normal,
                    dtype=self.dtype)(x)
        x = Norm(self.norm)(x, train, groups)
        return nn.relu(x)

    @nn.compact
    def __call__(self, x, train: bool = False, groups: int = 1):
        if self.remat and train:
            def body(mdl, x):
                return mdl._body(x, train, groups)
            return nn.remat(body)(self, x)
        return self._body(x, train, groups)


def upsample2x(x):
    """Nearest-neighbour 2x upsampling (Keras UpSampling2D)."""
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class UpsampleBlock(nn.Module):
    """Upsample2x -> Conv3x3 -> norm -> activation (utils/model_utils.py:15-24)."""

    filters: int
    norm: str = "batch"
    activation: str = "relu"
    dtype: Any = jnp.float32
    remat: bool = False

    def _body(self, x, train, groups):
        x = upsample2x(x)
        x = nn.Conv(self.filters, (3, 3), padding="SAME", kernel_init=he_normal,
                    dtype=self.dtype)(x)
        x = Norm(self.norm)(x, train, groups)
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "leakyrelu":
            return leaky_relu(x)
        return x  # 'linear'

    @nn.compact
    def __call__(self, x, train: bool = False, groups: int = 1):
        if self.remat and train:
            def body(mdl, x):
                return mdl._body(x, train, groups)
            return nn.remat(body)(self, x)
        return self._body(x, train, groups)


def max_pool2(x):
    """2x2/stride-2 max pooling via reshape + reduce-max.

    Same forward as Keras MaxPooling2D for even H,W, but the backward of a
    reduce-max is a fused elementwise compare (gradient split evenly across
    exact ties), whereas a windowed `nn.max_pool` lowers its gradient to
    XLA select-and-scatter, which is a major serial bottleneck on TPU for
    these bandwidth-bound UNet steps. Ties only occur at exactly-equal
    activations (post-ReLU zeros), where the even split is as valid a
    subgradient as the reference's single-winner choice.
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(xr, axis=(2, 4))
