"""Spatially-sharded convolution with ICI halo exchange.

The stretch target (BASELINE.json config 5) is 3-D multi-sequence volumes
that do not fit one chip; the plan of record (SURVEY.md §5.7) is spatial
sharding of the volume over a 'space' mesh axis with halo exchange for the
convolution overlaps. This module implements that pattern for the H axis:

* the input (B, H, W, C) is sharded over 'space' on H,
* each shard exchanges `halo` edge rows with its mesh neighbours via
  `jax.lax.ppermute` (ICI neighbour traffic only — no all-gather),
* global-edge shards zero-fill instead (SAME zero padding semantics),
* the conv then runs VALID on the halo-extended block.

The result is bit-equivalent to an unsharded SAME conv (tests/test_halo.py
checks against lax.conv on an 8-device CPU mesh).
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _exchange_halos(x_blk, halo, axis):
    """Bring in `halo` rows from the up/down neighbours along mesh `axis`.

    x_blk: local (B, H_loc, W, C). Returns (B, H_loc + 2*halo, W, C) with
    zero fill at the global boundaries.
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    # send my bottom rows to the next shard (they become its top halo)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(x_blk[:, -halo:], axis, perm=fwd)
    from_next = jax.lax.ppermute(x_blk[:, :halo], axis, perm=bwd)

    zeros = jnp.zeros_like(from_prev)
    top = jnp.where(idx == 0, zeros, from_prev)
    bottom = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([top, x_blk, bottom], axis=1)


def halo_conv2d(x, kernel, mesh: Mesh, axis: str = "space"):
    """SAME conv2d with H sharded over `axis` of `mesh`.

    x: (B, H, W, C) with H divisible by mesh.shape[axis]; kernel:
    (kh, kw, C_in, C_out) with odd kh, kw. Returns (B, H, W, C_out) sharded
    the same way.
    """
    kh, kw = kernel.shape[:2]
    assert kh % 2 == 1 and kw % 2 == 1, "odd kernels only"
    halo = kh // 2

    def local(x_blk, k):
        xp = _exchange_halos(x_blk, halo, axis) if halo else x_blk
        return jax.lax.conv_general_dilated(
            xp,
            k,
            window_strides=(1, 1),
            padding=((0, 0), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None),
    )(x, kernel)


def halo_conv3d(x, kernel, mesh: Mesh, axis: str = "space"):
    """SAME conv3d with the depth (D) axis sharded over `axis`.

    The building block for the 3-D stretch models (BASELINE.json config 5):
    volumes too large for one chip shard their slice axis across the mesh;
    each shard exchanges `kd//2` boundary slices with its ICI neighbours.

    x: (B, D, H, W, C) with D divisible by mesh.shape[axis];
    kernel: (kd, kh, kw, C_in, C_out), odd kd/kh/kw.
    """
    kd, kh, kw = kernel.shape[:3]
    assert kd % 2 == 1 and kh % 2 == 1 and kw % 2 == 1, "odd kernels only"
    halo = kd // 2

    def local(x_blk, k):
        xp = _exchange_halos(x_blk, halo, axis) if halo else x_blk
        return jax.lax.conv_general_dilated(
            xp,
            k,
            window_strides=(1, 1, 1),
            padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None, None, None), P()),
        out_specs=P(None, axis, None, None, None),
    )(x, kernel)
