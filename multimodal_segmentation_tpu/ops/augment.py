"""On-device data augmentation.

The reference augments on the host with keras ImageDataGenerator
(model_executors/base_executor.py:37-78,103-110: rotation_range=20 only,
applied with identical seed to images and masks of both modalities, i.e. the
same rotation per sample across all arrays). Host-side augmentation is a
CPU bottleneck and an extra HBM transfer on TPU; here rotation runs inside
the jitted train step.

Interpolation semantics match Keras 2.1.6 apply_transform: nearest-neighbour
resampling (scipy affine_transform order=0) with 'nearest' edge fill.
"""

import os

import jax
import jax.numpy as jnp


def _rotate_one(img, theta):
    """Rotate one (H, W, C) image by theta radians about the image centre.

    Nearest-neighbour sampling, edge-clamp fill ('nearest' mode).
    """
    H, W, _ = img.shape
    cy = (H - 1) / 2.0
    cx = (W - 1) / 2.0
    ys = jnp.arange(H, dtype=img.dtype)[:, None]
    xs = jnp.arange(W, dtype=img.dtype)[None, :]
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    # Inverse mapping: source = R(-theta) @ (dest - c) + c
    dy = ys - cy
    dx = xs - cx
    src_y = cos_t * dy - sin_t * dx + cy
    src_x = sin_t * dy + cos_t * dx + cx
    yi = jnp.clip(jnp.round(src_y), 0, H - 1).astype(jnp.int32)
    xi = jnp.clip(jnp.round(src_x), 0, W - 1).astype(jnp.int32)
    flat = img.reshape(H * W, -1)
    out = jnp.take(flat, (yi * W + xi).reshape(-1), axis=0)
    return out.reshape(img.shape)


def random_rotation_angles(rng, batch, rotation_range_deg=20.0):
    """Uniform angles in (-range, range) degrees, returned in radians."""
    deg = jax.random.uniform(
        rng, (batch,), minval=-rotation_range_deg, maxval=rotation_range_deg
    )
    return deg * (jnp.pi / 180.0)


def rotation_locations(thetas, H, W, dtype=jnp.float32):
    """Per-sample pixel-space source locations for centre rotation.

    Returns (B, H*W, 2) (y, x): the inverse-mapped source coordinate of
    every destination pixel — the same mapping _rotate_one gathers with.
    """
    cy = (H - 1) / 2.0
    cx = (W - 1) / 2.0
    ys = jnp.arange(H, dtype=dtype)[:, None]
    xs = jnp.arange(W, dtype=dtype)[None, :]
    dy = (ys - cy) * jnp.ones((1, W), dtype)
    dx = jnp.ones((H, 1), dtype) * (xs - cx)
    cos_t = jnp.cos(thetas)[:, None, None]
    sin_t = jnp.sin(thetas)[:, None, None]
    src_y = cos_t * dy[None] - sin_t * dx[None] + cy
    src_x = sin_t * dy[None] + cos_t * dx[None] + cx
    B = thetas.shape[0]
    return jnp.stack(
        [src_y.reshape(B, H * W), src_x.reshape(B, H * W)], axis=-1
    )


def rotate_batch(batch_imgs, thetas, impl="auto"):
    """Rotate a (B, H, W, C) batch by per-sample angles (radians).

    impl='auto' routes through the Pallas nearest-warp kernel on TPU when
    the shape tiles AND fits the scoped-VMEM budget (otherwise the jnp
    row-gather). Both paths sample nearest with edge clamp and jnp.round
    ties; one measured difference on REAL TPU (not visible in interpret
    mode): the kernel's one-hot blend matmuls run at Mosaic's default
    bf16 matmul precision, so gathered IMAGE values are bf16-rounded
    (~1e-2 abs on [-1,1] data) while {0,1} mask channels stay exact.
    Acceptable for augmentation feeding a bf16 train step; use
    impl='jnp' where exact f32 pass-through matters.
    """
    B, H, W, C = batch_imgs.shape
    from multimodal_segmentation_tpu.ops.pallas_kernels import (
        nearest_warp_block_points,
        nearest_warp_pallas_sharded,
    )

    # benchmarking override (tools/bench_variants.py A/Bs the fused step
    # with each rotation path on the real chip)
    impl = os.environ.get("MMSEG_ROTATE_IMPL", impl)

    # Route to the kernel only when the shape both tiles AND fits the
    # scoped-VMEM budget (BENCH_r04: the fused labelled path concatenates
    # to C=10 and a fixed 1024-point block blew the 16 MB limit; the block
    # size is now chosen per-shape and this predicate rejects anything the
    # chooser cannot fit).
    use_kernel = impl == "pallas" or (
        impl == "auto"
        and jax.default_backend() == "tpu"
        and (W * C) % 128 == 0
        and nearest_warp_block_points(H, W, C) > 0
    )
    if use_kernel:

        locs = rotation_locations(thetas.astype(jnp.float32), H, W)
        return nearest_warp_pallas_sharded(
            batch_imgs, locs, interpret=jax.default_backend() != "tpu"
        )
    return jax.vmap(_rotate_one)(batch_imgs, thetas)


def random_brightness_contrast(rng, images, brightness=0.2, contrast=0.2):
    """Per-sample brightness/contrast jitter.

    On-device equivalent of the albumentations RandomBrightnessContrast the
    reference applies in its image callbacks (utils/image_utils.py:100-110):
    x' = x * (1 + c) + b with b ~ U(-brightness, brightness),
    c ~ U(-contrast, contrast).
    """
    B = images.shape[0]
    rb, rc = jax.random.split(rng)
    b = jax.random.uniform(rb, (B, 1, 1, 1), minval=-brightness, maxval=brightness)
    c = jax.random.uniform(rc, (B, 1, 1, 1), minval=-contrast, maxval=contrast)
    return images * (1.0 + c) + b


def random_rotate_batch(rng, arrays, rotation_range_deg=20.0):
    """Rotate every array in `arrays` by the SAME per-sample random angles.

    Mirrors the reference's shared-seed ImageDataGenerator behaviour where
    images and masks of both modalities receive identical transforms
    (model_executors/base_executor.py:37-78).

    Args:
      rng: PRNG key.
      arrays: list of (B, H, W, C) arrays (images and masks).

    Returns:
      list of rotated arrays.
    """
    if not arrays:
        return arrays
    thetas = random_rotation_angles(rng, arrays[0].shape[0], rotation_range_deg)
    # identical per-sample angles for every array -> concatenate along
    # channels and rotate once: ONE gather kernel instead of len(arrays)
    widths = [a.shape[-1] for a in arrays]
    dt = jnp.result_type(*[a.dtype for a in arrays])
    cat = jnp.concatenate([a.astype(dt) for a in arrays], axis=-1)
    out = rotate_batch(cat, thetas.astype(dt))
    splits = [sum(widths[: i + 1]) for i in range(len(widths) - 1)]
    outs = jnp.split(out, splits, axis=-1)
    return [o.astype(a.dtype) for o, a in zip(outs, arrays)]


def random_rotate_volumes(rng, volumes, masks, rotation_range_deg=20.0):
    """In-plane rotation of (B, D, H, W, C) volumes about the slice axis.

    One angle per study, shared across its slices and its masks — the
    volumetric analogue of the shared-seed 2-D augmentation. Sharding-
    friendly: the rotation is a per-slice gather in (H, W), so a 'space'-
    sharded D axis needs no cross-shard traffic.
    """
    B, D = volumes.shape[0], volumes.shape[1]
    thetas = random_rotation_angles(rng, B, rotation_range_deg)
    th = jnp.repeat(thetas, D)

    def rot(x):
        flat = x.reshape((B * D,) + x.shape[2:])
        out = rotate_batch(flat, th.astype(x.dtype))
        return out.reshape(x.shape)

    return rot(volumes), rot(masks)
