"""Pallas TPU kernels for the reference's custom-op hot spots.

Two kernels (the ★ ops of SURVEY.md §2):

* `round_ste_pallas` — straight-through rounding as a tiled VMEM
  elementwise kernel with a custom VJP (replaces layers/rounding.py).
  Numerically identical to the jnp path; used on TPU when shapes tile
  cleanly.

* `tps_bilinear_warp_pallas` — the TPS dense-flow evaluation fused with
  the bilinear resample in one kernel: per query-point block, the RBF
  distances, phi, the flow matmul and the bilinear gather all live in
  VMEM; the gather is expressed as two MXU matmuls (a row-blend matrix
  against the source image, then a column-blend contraction), so nothing
  but the warped output is written to HBM.

  Honest benchmark note (see PERF.md): at CHAOS size (192^2 x 8ch) XLA's
  native gather is already memory-bound-optimal and beats the matmul
  formulation, so the jnp path stays the default; the kernel exists for
  the 3-D / large-volume regime where XLA gathers degrade, and is
  selectable via `tps_warp(..., use_pallas=True)`.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

# ------------------------------------------------------------- round STE


def _round_kernel(x_ref, o_ref):
    # round in f32: Mosaic has no bf16 roundeven lowering
    o_ref[:] = jnp.round(x_ref[:].astype(jnp.float32)).astype(x_ref.dtype)


def _round_pallas_raw(x2d, block_rows=512):
    n, lanes = x2d.shape
    grid = (pl.cdiv(n, block_rows),)
    return pl.pallas_call(
        _round_kernel,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (block_rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(x2d)


@jax.custom_vjp
def round_ste_pallas(x):
    """Pallas straight-through rounding; identical contract to
    ops.rounding.round_ste."""
    size = int(np.prod(x.shape))
    if size % 128 == 0:
        out = _round_pallas_raw(x.reshape(size // 128, 128))
        return out.reshape(x.shape)
    return jnp.round(x)


def _round_fwd(x):
    return round_ste_pallas(x), None


def _round_bwd(_, g):
    return (g,)


round_ste_pallas.defvjp(_round_fwd, _round_bwd)


# -------------------------------------------------- fused TPS bilinear warp


def _blend_dot(a, b, blend_bf16):
    """Blend matmul at selectable precision.

    HIGHEST (f32) runs ~6 MXU passes per dot on TPU; the blend matrices
    hold bilinear weights in [0,1] (and the channel map is one-hot), so a
    single bf16 pass loses only ~1e-3 absolute — the precision-critical
    matmul in this op is the RBF *flow* evaluation, which always stays
    HIGHEST. bf16 blends make the warp MXU-bound at 1 pass instead of 6.
    """
    if blend_bf16:
        return jnp.dot(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _warp_kernel(src_ref, w_ref, cp_ref, v_ref, o_ref, *, H, W, C, P,
                 blend_bf16=False):
    """One (batch, point-block) tile: evaluate the TPS flow for P query
    points and bilinearly sample the full-resolution source.

    Layout choices avoid lane<->sublane transposes on tiny arrays:
    src_ref: (1, H, C*W) channel-major source image (VMEM).
    w_ref:   (1, 32, 2) RBF weights, rows >= n_cp zero-padded (VMEM).
    cp_ref:  (2, 32) control points, lane-oriented: row0=y, row1=x (VMEM).
    v_ref:   (1, 1, 8) affine coefficients in SMEM:
             [vyy, vyx, vyb, vxy, vxx, vxb, 0, 0] (flow_y = rbf_y +
             qy*vyy + qx*vyx + vyb, flow_x likewise).
    o_ref:   (1, P, C) output block — C lanes, NOT 128-padded: the padded
             output cost 128/C x write amplification in HBM (round-5 byte
             audit: the kernels' padded I/O was 25% of the step's true
             traffic) plus a separate slice pass after the call.
    """
    j = pl.program_id(1)
    q0 = j * P

    qi = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(jnp.float32)
    q = qi + jnp.float32(q0)
    qy = jnp.floor(q / W) / (H - 1.0)
    qx = jnp.mod(q, float(W)) / (W - 1.0)

    cpy = cp_ref[0:1, :]  # (1, 32) lane-oriented
    cpx = cp_ref[1:2, :]
    d2 = (qy - cpy) ** 2 + (qx - cpx) ** 2  # (P, 32)
    phi = 0.5 * d2 * jnp.log(jnp.maximum(d2, 1e-10))

    rbf = jnp.dot(phi, w_ref[0], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # (P, 2)
    flow_y = rbf[:, 0:1] + qy * v_ref[0, 0, 0] + qx * v_ref[0, 0, 1] + v_ref[0, 0, 2]
    flow_x = rbf[:, 1:2] + qy * v_ref[0, 0, 3] + qx * v_ref[0, 0, 4] + v_ref[0, 0, 5]

    y = flow_y * (H - 1.0)  # (P, 1) pixel coords
    x = flow_x * (W - 1.0)

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1 = y - y0
    wx1 = x - x0

    rows = jax.lax.broadcasted_iota(jnp.int32, (P, H), 1).astype(jnp.float32)
    in_y0 = (y0 >= 0) & (y0 <= H - 1)
    in_y1 = (y0 + 1 >= 0) & (y0 + 1 <= H - 1)
    a = (rows == y0) * (1.0 - wy1) * in_y0 + (rows == (y0 + 1.0)) * wy1 * in_y1

    src = src_ref[0]  # (H, C*W) channel-major flat layout
    r = _blend_dot(a, src, blend_bf16)  # (P, C*W)

    # Column blend built directly at (P, C*W) width in the channel-major
    # layout (r = c*W + w  =>  w = r mod W); avoids lane-repeat ops on
    # non-128-aligned widths.
    in_x0 = (x0 >= 0) & (x0 <= W - 1)
    in_x1 = (x0 + 1 >= 0) & (x0 + 1 <= W - 1)
    cw = jax.lax.broadcasted_iota(jnp.int32, (P, W * C), 1)
    wpos = jnp.mod(cw, W).astype(jnp.float32)
    bx_exp = (wpos == x0) * (1.0 - wx1) * in_x0 + (
        wpos == (x0 + 1.0)
    ) * wx1 * in_x1  # (P, C*W)

    m = r * bx_exp  # (P, C*W)
    # channel reduction: out[p, c] = sum_w m[p, c*W + w]
    lane = jax.lax.broadcasted_iota(jnp.int32, (W * C, C), 0) // W
    chan = jax.lax.broadcasted_iota(jnp.int32, (W * C, C), 1)
    s = (lane == chan).astype(jnp.float32)  # (C*W, C) one-hot channel map
    o_ref[0] = _blend_dot(m, s, blend_bf16).astype(o_ref.dtype)  # (P, C)


def _warp_bwd_kernel(src_ref, locs_ref, locs_t_ref, g_ref, gsrc_ref, gloc_ref,
                     *, H, W, C, P, blend_bf16=False):
    """Backward of the fused bilinear warp for one (batch, point-block) tile.

    Same scatter-as-matmul design as the forward: the gradient scatter into
    the source image is an (H, P) @ (P, C*W) MXU matmul accumulated across
    point blocks, and the sample-location gradients come from the exact
    derivatives of the row/column blend matrices — nothing leaves VMEM but
    the two gradient outputs.

    The kernel is deliberately transpose-free: the (H, P) scatter matrix is
    built directly from a pre-transposed copy of the locations, the one-hot
    channel map is generated in its used orientation, and the dy gradient
    uses  sum_l u * (da @ src)  instead of  sum_h (u @ src^T) * da  —
    Mosaic lowers in-kernel `.T` on large operands to catastrophically slow
    relayouts (measured 56 -> 310 ms/step fwd+bwd when combined with bf16
    operands).

    src_ref:    (1, H, C*W) channel-major source image.
    locs_ref:   (1, P, 2) pixel-space sample locations (y, x).
    locs_t_ref: (1, 2, P) the same locations, lane-oriented.
    g_ref:      (1, P, C) output cotangent — C lanes, unpadded (the old
                128-lane padding materialised a zero-padded cotangent copy
                in HBM before every backward call).
    gsrc_ref:   (1, H, C*W) source gradient, accumulated over the point grid.
    gloc_ref:   (1, P, 2) location gradient (lane 0 = dy, lane 1 = dx).
    """
    j = pl.program_id(1)

    y = locs_ref[0, :, 0:1]  # (P, 1) pixel coords
    x = locs_ref[0, :, 1:2]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1 = y - y0
    wx1 = x - x0

    rows = jax.lax.broadcasted_iota(jnp.int32, (P, H), 1).astype(jnp.float32)
    in_y0 = ((y0 >= 0) & (y0 <= H - 1)).astype(jnp.float32)
    in_y1 = ((y0 + 1 >= 0) & (y0 + 1 <= H - 1)).astype(jnp.float32)
    hit_y0 = (rows == y0).astype(jnp.float32) * in_y0
    hit_y1 = (rows == (y0 + 1.0)).astype(jnp.float32) * in_y1
    a = hit_y0 * (1.0 - wy1) + hit_y1 * wy1          # (P, H)
    da = hit_y1 - hit_y0                              # d a / d y

    # transposed scatter matrix, built directly in (H, P) orientation
    yT = locs_t_ref[0, 0:1, :]                        # (1, P)
    y0T = jnp.floor(yT)
    wy1T = yT - y0T
    rowsT = jax.lax.broadcasted_iota(jnp.int32, (H, P), 0).astype(jnp.float32)
    in_y0T = ((y0T >= 0) & (y0T <= H - 1)).astype(jnp.float32)
    in_y1T = ((y0T + 1 >= 0) & (y0T + 1 <= H - 1)).astype(jnp.float32)
    aT = (rowsT == y0T).astype(jnp.float32) * in_y0T * (1.0 - wy1T) + (
        rowsT == (y0T + 1.0)
    ).astype(jnp.float32) * in_y1T * wy1T             # (H, P)

    cw = jax.lax.broadcasted_iota(jnp.int32, (P, W * C), 1)
    wpos = jnp.mod(cw, W).astype(jnp.float32)
    in_x0 = ((x0 >= 0) & (x0 <= W - 1)).astype(jnp.float32)
    in_x1 = ((x0 + 1 >= 0) & (x0 + 1 <= W - 1)).astype(jnp.float32)
    hit_x0 = (wpos == x0).astype(jnp.float32) * in_x0
    hit_x1 = (wpos == (x0 + 1.0)).astype(jnp.float32) * in_x1
    bx = hit_x0 * (1.0 - wx1) + hit_x1 * wx1          # (P, C*W)
    dbx = hit_x1 - hit_x0                             # d bx / d x

    # expand the per-channel cotangent to the channel-major flat layout:
    # g_exp[p, c*W + w] = g[p, c]; the (C, C*W) map is built directly.
    chan_t = jax.lax.broadcasted_iota(jnp.int32, (C, W * C), 0)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (C, W * C), 1) // W
    s_t = (chan_t == lane_t).astype(jnp.float32)      # (C, C*W)
    g_exp = _blend_dot(g_ref[0], s_t, blend_bf16)     # (P, C*W)

    src = src_ref[0]                                  # (H, C*W)
    u = g_exp * bx                                    # cotangent of r = a @ src

    # source gradient: accumulate aT @ u over point blocks
    gsrc_tile = _blend_dot(aT, u, blend_bf16)         # (H, C*W)

    @pl.when(j == 0)
    def _():
        gsrc_ref[0] = gsrc_tile

    @pl.when(j > 0)
    def _():
        gsrc_ref[0] = gsrc_ref[0] + gsrc_tile

    # location gradients:
    # gy[p] = sum_h (u @ src^T)[p,h] * da[p,h] = sum_l u[p,l] * (da @ src)[p,l]
    dsrc = _blend_dot(da, src, blend_bf16)                # (P, C*W)
    gy = jnp.sum(u * dsrc, axis=1, keepdims=True)         # (P, 1)
    r = _blend_dot(a, src, blend_bf16)                    # (P, C*W)
    gx = jnp.sum(g_exp * r * dbx, axis=1, keepdims=True)  # (P, 1)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (P, 2), 1)
    gloc_ref[0] = gy * (out_lane == 0).astype(jnp.float32) + gx * (
        out_lane == 1
    ).astype(jnp.float32)


def tps_bilinear_warp_bwd_pallas(vol, locs, g, block_points=256,
                                 blend_bf16=False, interpret=False):
    """Backward of the fused warp: given vol (B, H, W, C), pixel-space
    sample locations locs (B, H*W, 2) and output cotangent g (B, H, W, C),
    returns (grad_vol, grad_locs)."""
    B, H, W, C = vol.shape
    P = min(block_points, H * W)
    assert (H * W) % P == 0, (H, W, P)
    assert (W * C) % 128 == 0, (W, C)

    # source + cotangent stay in their native dtype (bf16 under mixed
    # precision — the blend matmuls cast to bf16 anyway); the gradient
    # ACCUMULATOR across point blocks stays f32
    g_dt = g.dtype if blend_bf16 else jnp.float32
    src_dt = vol.dtype if blend_bf16 else jnp.float32

    kernel = functools.partial(_warp_bwd_kernel, H=H, W=W, C=C, P=P,
                               blend_bf16=blend_bf16)
    gsrc, gloc = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, C * W), jnp.float32),
            jax.ShapeDtypeStruct((B, H * W, 2), jnp.float32),
        ],
        grid=(B, (H * W) // P),
        in_specs=[
            pl.BlockSpec((1, H, W * C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 2), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, P), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, C * W), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 2), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(
        vol.astype(src_dt).transpose(0, 1, 3, 2).reshape(B, H, C * W),
        locs.astype(jnp.float32),
        locs.astype(jnp.float32).transpose(0, 2, 1),  # (B, 2, H*W) lane-major
        g.reshape(B, H * W, C).astype(g_dt),
    )
    grad_vol = gsrc.reshape(B, H, C, W).transpose(0, 1, 3, 2).astype(vol.dtype)
    return grad_vol, gloc


def tps_bilinear_warp_pallas(vol, wv, cp_grid, block_points=1024,
                             blend_bf16=False, interpret=False):
    """Fused TPS warp: vol (B, H, W, C), wv (B, 28, 2) solved spline
    coefficients, cp_grid (25, 2). Returns (B, H, W, C)."""
    B, H, W, C = vol.shape
    P = min(block_points, H * W)
    assert (H * W) % P == 0, (H, W, P)
    assert (W * C) % 128 == 0, (W, C)

    n_cp = cp_grid.shape[0]
    # RBF weight rows, zero-padded to 32 (sentinel cp rows contribute 0)
    w_pad = jnp.zeros((B, 32, 2), wv.dtype).at[:, :n_cp].set(wv[:, :n_cp])
    # affine terms as SMEM scalars: [vyy, vyx, vyb, vxy, vxx, vxb, 0, 0]
    v = wv[:, n_cp : n_cp + 3]  # (B, 3, 2)
    v_flat = jnp.concatenate([v[:, :, 0], v[:, :, 1]], axis=1)  # (B, 6)
    v_flat = jnp.pad(v_flat, ((0, 0), (0, 2))).reshape(B, 1, 8)
    # control points lane-oriented, sentinel 7.0 keeps phi finite
    cp_t = jnp.full((2, 32), 7.0, cp_grid.dtype).at[:, :n_cp].set(cp_grid.T)

    kernel = functools.partial(_warp_kernel, H=H, W=W, C=C, P=P,
                               blend_bf16=blend_bf16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H * W, C), vol.dtype),
        grid=(B, (H * W) // P),
        in_specs=[
            pl.BlockSpec((1, H, W * C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32, 2), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 32), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda b, j: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, P, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        # channel-major source layout (B, H, C*W) for the tiled column blend
        vol.transpose(0, 1, 3, 2).reshape(B, H, C * W),
        w_pad,
        cp_t,
        v_flat,
    )
    return out.reshape(B, H, W, C)


# ------------------------------------------------- nearest-neighbour warp


def _nearest_warp_kernel(src_ref, locs_ref, o_ref, *, H, W, C, P):
    """Nearest-neighbour resample at explicit per-point locations.

    The bilinear warp kernel's scatter-as-matmul design specialised to
    nearest sampling with edge clamping (Keras ImageDataGenerator
    apply_transform semantics — the on-device rotation augmentation,
    ops/augment.py). Row/column selectors are exact one-hots, so {0,1}
    mask channels survive bit-exactly.

    src_ref:  (1, H, C*W) channel-major source.
    locs_ref: (1, P, 2) pixel-space (y, x) sample locations.
    o_ref:    (1, P, C) output block (C lanes, unpadded).
    """
    y = jnp.clip(jnp.round(locs_ref[0, :, 0:1]), 0, H - 1)  # (P, 1)
    x = jnp.clip(jnp.round(locs_ref[0, :, 1:2]), 0, W - 1)

    rows = jax.lax.broadcasted_iota(jnp.int32, (P, H), 1).astype(jnp.float32)
    a = (rows == y).astype(jnp.float32)                      # (P, H) one-hot
    r = jnp.dot(a, src_ref[0], preferred_element_type=jnp.float32)  # (P, C*W)

    cw = jax.lax.broadcasted_iota(jnp.int32, (P, W * C), 1)
    wpos = jnp.mod(cw, W).astype(jnp.float32)
    bx = (wpos == x).astype(jnp.float32)                     # (P, C*W) one-hot
    m = r * bx

    lane = jax.lax.broadcasted_iota(jnp.int32, (W * C, C), 0) // W
    chan = jax.lax.broadcasted_iota(jnp.int32, (W * C, C), 1)
    s = (lane == chan).astype(jnp.float32)
    o_ref[0] = jnp.dot(m, s, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


# Scoped-VMEM stack cost of the warp kernels is ~9.1 bytes per P*C*W block
# element (measured: C*W=1920, P=1024 compiled to a 17.88 MB scoped
# allocation on v5e — BENCH_r04 OOM against the 16 MB limit). Budget well
# under the limit and shrink the point-block to fit.
_VMEM_BYTES_PER_ELEM = 9.1
_VMEM_BUDGET = 12 * 1024 * 1024


def nearest_warp_block_points(H, W, C, cap=1024):
    """Largest power-of-two point-block <= cap that divides H*W and keeps
    the kernel's scoped-VMEM footprint under budget. Returns 0 if even a
    128-point block would not fit (caller should use the jnp path)."""
    P = min(cap, H * W)
    while P >= 128:
        if (H * W) % P == 0 and P * W * C * _VMEM_BYTES_PER_ELEM <= _VMEM_BUDGET:
            return P
        P //= 2
    return 0


def nearest_warp_pallas(vol, locs, block_points=1024, interpret=False):
    """Nearest-neighbour warp: vol (B, H, W, C) at pixel locations
    locs (B, H*W, 2) -> (B, H, W, C), edge-clamped. Not differentiable
    (augmentation consumes data, not activations)."""
    B, H, W, C = vol.shape
    P = nearest_warp_block_points(H, W, C, cap=block_points)
    assert P > 0, (H, W, C, block_points)
    assert (W * C) % 128 == 0, (W, C)

    kernel = functools.partial(_nearest_warp_kernel, H=H, W=W, C=C, P=P)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H * W, C), vol.dtype),
        grid=(B, (H * W) // P),
        in_specs=[
            pl.BlockSpec((1, H, W * C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 2), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, P, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        vol.transpose(0, 1, 3, 2).reshape(B, H, C * W),
        locs.astype(jnp.float32),
    )
    return out.reshape(B, H, W, C)


@functools.lru_cache(maxsize=None)
def _nearest_warp_partitioned(interpret):
    """nearest_warp_pallas with the same GSPMD batch-partition rule as the
    TPS warp kernels: grid axis 0 is the batch, so the op shards 1:1 along
    the batch's mesh axis (the augmentation runs inside the 'data'-sharded
    train step)."""

    @custom_partitioning
    def fwd(vol, locs):
        return nearest_warp_pallas(vol, locs, interpret=interpret)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = _batch_shardings(arg_shapes, mesh)
        result_sharding = _batch_shardings([result_shape], mesh)[0]

        def lower_fn(vol, locs):
            return nearest_warp_pallas(vol, locs, interpret=interpret)

        return mesh, lower_fn, result_sharding, tuple(arg_shardings)

    def infer(mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        b = spec[0] if len(spec) > 0 else None
        return NamedSharding(mesh, PartitionSpec(b, None, None, None))

    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b i j c, b q t -> b i j c",
    )
    return fwd


def nearest_warp_pallas_sharded(vol, locs, interpret=False):
    """Partition-rule-carrying entry point for the nearest warp kernel."""
    return _nearest_warp_partitioned(bool(interpret))(vol, locs)


# -------------------------------------- GSPMD partition rule for the warp

def _batch_shardings(shapes, mesh):
    """Shardings that keep ONLY the leading (batch) mesh axes of each
    operand and replicate everything else — the kernel is independent
    per batch element (grid axis 0 is the batch), so batch partitioning
    is exact; any non-batch sharding is collapsed before the kernel."""
    out = []
    for s in shapes:
        spec = s.sharding.spec
        b = spec[0] if len(spec) > 0 else None
        out.append(
            NamedSharding(mesh, PartitionSpec(b, *([None] * (len(s.shape) - 1))))
        )
    return out


@functools.lru_cache(maxsize=None)
def _warp_fwd_partitioned(blend_bf16, interpret):
    """`tps_bilinear_warp_pallas` wrapped with a GSPMD partition rule.

    The kernel's grid axis 0 is the batch and every operand/result has a
    leading batch dim, so the op shards 1:1 along whatever mesh axis the
    batch carries (typically 'data'); the tiny spline coefficients ride
    along and cp_grid is replicated. Without this rule GSPMD treats the
    pallas custom-call as unpartitionable and mesh runs had to fall back
    to the XLA gather path (VERDICT r3 item 2).
    """

    @custom_partitioning
    def fwd(vol, wv, cp_grid):
        return tps_bilinear_warp_pallas(
            vol, wv, cp_grid, blend_bf16=blend_bf16, interpret=interpret
        )

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = _batch_shardings(arg_shapes, mesh)
        # cp_grid (rank 2, no batch) is replicated
        arg_shardings[2] = NamedSharding(mesh, PartitionSpec(None, None))
        result_sharding = _batch_shardings([result_shape], mesh)[0]

        def lower_fn(vol, wv, cp_grid):
            return tps_bilinear_warp_pallas(
                vol, wv, cp_grid, blend_bf16=blend_bf16, interpret=interpret
            )

        return mesh, lower_fn, result_sharding, tuple(arg_shardings)

    def infer(mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        b = spec[0] if len(spec) > 0 else None
        return NamedSharding(mesh, PartitionSpec(b, None, None, None))

    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b i j c, b k t, n t -> b i j c",
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _warp_bwd_partitioned(blend_bf16, interpret):
    """Backward-kernel twin of `_warp_fwd_partitioned` (same batch rule)."""

    @custom_partitioning
    def bwd(vol, locs, g):
        return tps_bilinear_warp_bwd_pallas(
            vol, locs, g, blend_bf16=blend_bf16, interpret=interpret
        )

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = _batch_shardings(arg_shapes, mesh)
        result_shardings = _batch_shardings(list(result_shape), mesh)

        def lower_fn(vol, locs, g):
            return tps_bilinear_warp_bwd_pallas(
                vol, locs, g, blend_bf16=blend_bf16, interpret=interpret
            )

        return mesh, lower_fn, tuple(result_shardings), tuple(arg_shardings)

    def infer(mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        b = spec[0] if len(spec) > 0 else None
        return (
            NamedSharding(mesh, PartitionSpec(b, None, None, None)),
            NamedSharding(mesh, PartitionSpec(b, None, None)),
        )

    bwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b i j c, b q t, b i j c -> b i j c, b q t",
    )
    return bwd


def tps_bilinear_warp_pallas_sharded(vol, wv, cp_grid, blend_bf16=False,
                                     interpret=False):
    """Partition-rule-carrying entry point for the forward warp kernel."""
    return _warp_fwd_partitioned(bool(blend_bf16), bool(interpret))(
        vol, wv, cp_grid
    )


def tps_bilinear_warp_bwd_pallas_sharded(vol, locs, g, blend_bf16=False,
                                         interpret=False):
    """Partition-rule-carrying entry point for the backward warp kernel."""
    return _warp_bwd_partitioned(bool(blend_bf16), bool(interpret))(
        vol, locs, g
    )
