"""Bisect the TPU warp kernel: dump per-stage intermediates and compare."""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_segmentation_tpu.ops.tps import (
    control_grid,
    tps_coefficients,
    tps_sample_locations,
)

B, H, W, C = 2, 192, 192, 8
P = 1024
r = np.random.RandomState(0)
off = jnp.asarray((r.rand(B, 25, 2).astype(np.float32) - 0.5) * 0.05)
wv = tps_coefficients(off)
cp_grid = control_grid([5, 5])

n_cp = 25
w_pad = jnp.zeros((B, 32, 2)).at[:, :n_cp].set(wv[:, :n_cp])
v = wv[:, n_cp : n_cp + 3]
v_flat = jnp.pad(jnp.concatenate([v[:, :, 0], v[:, :, 1]], axis=1), ((0, 0), (0, 2))).reshape(B, 1, 8)
cp_t = jnp.full((2, 32), 7.0).at[:, :n_cp].set(cp_grid.T)


def kernel(w_ref, cp_ref, v_ref, o_ref):
    j = pl.program_id(1)
    q0 = j * P
    qi = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(jnp.float32)
    q = qi + jnp.float32(q0)
    qy = jnp.floor(q / W) / (H - 1.0)
    qx = jnp.mod(q, float(W)) / (W - 1.0)
    cpy = cp_ref[0:1, :]
    cpx = cp_ref[1:2, :]
    d2 = (qy - cpy) ** 2 + (qx - cpx) ** 2
    phi = 0.5 * d2 * jnp.log(jnp.maximum(d2, 1e-10))
    rbf = jnp.dot(phi, w_ref[0], preferred_element_type=jnp.float32)
    flow_y = rbf[:, 0:1] + qy * v_ref[0, 0, 0] + qx * v_ref[0, 0, 1] + v_ref[0, 0, 2]
    flow_x = rbf[:, 1:2] + qy * v_ref[0, 0, 3] + qx * v_ref[0, 0, 4] + v_ref[0, 0, 5]
    out = jnp.concatenate(
        [
            flow_y * (H - 1.0),
            flow_x * (W - 1.0),
            qy,
            qx,
            phi[:, 0:1],
            jnp.zeros((P, 123), jnp.float32),
        ],
        axis=1,
    )
    o_ref[0] = out


flow_dbg = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((B, H * W, 128), jnp.float32),
    grid=(B, (H * W) // P),
    in_specs=[
        pl.BlockSpec((1, 32, 2), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 32), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8), lambda b, j: (b, 0, 0), memory_space=pltpu.SMEM),
    ],
    out_specs=pl.BlockSpec((1, P, 128), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
)(w_pad, cp_t, v_flat)

ref_locs = np.asarray(tps_sample_locations(off, (H, W)))  # (B, H*W, 2) pixel y,x
got = np.asarray(flow_dbg)
print("flow_y max diff:", np.max(np.abs(got[:, :, 0] - ref_locs[:, :, 0])))
print("flow_x max diff:", np.max(np.abs(got[:, :, 1] - ref_locs[:, :, 1])))
# reference qy/qx
q = np.arange(H * W)
qy_ref = (q // W) / (H - 1.0)
qx_ref = (q % W) / (W - 1.0)
print("qy max diff:", np.max(np.abs(got[0, :, 2] - qy_ref)))
print("qx max diff:", np.max(np.abs(got[0, :, 3] - qx_ref)))
# reference phi col 0
cp0 = np.asarray(cp_grid)[0]
d2_ref = (qy_ref - cp0[0]) ** 2 + (qx_ref - cp0[1]) ** 2
phi_ref = 0.5 * d2_ref * np.log(np.maximum(d2_ref, 1e-10))
print("phi0 max diff:", np.max(np.abs(got[0, :, 4] - phi_ref)))
