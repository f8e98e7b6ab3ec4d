"""Differentiable bilinear resampling.

TPU-native replacement for `tf.contrib.resampler.resampler` (reference:
layers/stn_spline.py:8,65). Semantics match the TF resampler: bilinear
blending of the four neighbouring pixels, with any corner that falls outside
the image contributing zero (so points sampled fully outside produce 0).

The default implementation is pure jnp (XLA gather); a fused Pallas warp
kernel (flow evaluation + bilinear gather in VMEM) lives in
ops/pallas_kernels.py::tps_bilinear_warp_pallas, selected via
`tps_warp(..., use_pallas=True)`.
"""

import jax.numpy as jnp


def bilinear_sample(img, coords_yx):
    """Sample `img` at fractional pixel coordinates.

    Args:
      img: (H, W, C) source image.
      coords_yx: (M, 2) float array of (y, x) pixel coordinates.

    Returns:
      (M, C) sampled values; out-of-bounds corner contributions are zero.
    """
    H, W, _ = img.shape
    y = coords_yx[:, 0]
    x = coords_yx[:, 1]

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = y0 + 1.0
    x1 = x0 + 1.0

    wy1 = y - y0  # weight of the y1 row
    wx1 = x - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    def gather(yi, xi):
        """Gather img[yi, xi] with a validity mask for out-of-bounds."""
        valid = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = img.reshape(H * W, -1)
        vals = jnp.take(flat, yc * W + xc, axis=0)
        return vals * valid[:, None].astype(img.dtype)

    out = (
        gather(y0, x0) * (wy0 * wx0)[:, None]
        + gather(y0, x1) * (wy0 * wx1)[:, None]
        + gather(y1, x0) * (wy1 * wx0)[:, None]
        + gather(y1, x1) * (wy1 * wx1)[:, None]
    )
    return out
