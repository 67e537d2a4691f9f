"""Pallas-fused bundle-adjustment block assembly.

One kernel pass over the observation stream computes, per tile of
observations, entirely in VMEM:

    residual (normalised camera coords) -> Huber sqrt-IRLS weight ->
    closed-form camera/point Jacobians -> per-observation normal-equation
    blocks (J_c^T J_c, J_p^T J_p, J_c^T J_p, J^T r) -> camera-axis
    reduction (one-hot matmul on the MXU, accumulated across the grid).

The XLA path (`ops/ba.py::_assemble`) materialises res/J_cam/J_pt to HBM
between fusion clusters and reduces the camera axis afterwards; here the
Jacobians never leave VMEM and the (V, 56) camera accumulator rides along
the sequential TPU grid. Point-axis outputs (D blocks, b_p) still leave the
kernel per-observation — the point axis is large and sharded, so its
segment-sum stays an XLA scatter outside.

This is the "robust-loss residual/Jacobian evaluation fused into Pallas
kernels" component of the BASELINE.json north star. Math is identical to
``ops/reproj.py::batched_residual_jacobians`` (the test oracle): R from the
normalised quaternion, d vec(R)/d q as the raw quadratic form
(reference ``campose_processor.py:636-702``), residual = meas - proj.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array


def _assemble_kernel(
    cam_ref, C_ref, q_ref, X_ref, uv_ref, w_ref,
    dtd_ref, wblk_ref, bp_ref, acc_ref,
    *, n_views: int, huber_delta: float,
):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    pi = pl.program_id(0)

    # transposed (component, TO) layout: observations ride the 128-lane
    # axis; a (TO, k) layout would pad every k-wide array to 128 lanes and
    # blow the 16 MB VMEM budget
    C0, C1, C2 = C_ref[0, :], C_ref[1, :], C_ref[2, :]
    qw, qx, qy, qz = q_ref[0, :], q_ref[1, :], q_ref[2, :], q_ref[3, :]
    X0, X1, X2 = X_ref[0, :], X_ref[1, :], X_ref[2, :]
    m0, m1 = uv_ref[0, :], uv_ref[1, :]
    wv = w_ref[0, :]

    # rotation from the normalised quaternion (quat_to_rotation convention)
    inv_n = lax.rsqrt(jnp.maximum(qw * qw + qx * qx + qy * qy + qz * qz, 1e-24))
    w_, x_, y_, z_ = qw * inv_n, qx * inv_n, qy * inv_n, qz * inv_n
    ww, xx, yy, zz = w_ * w_, x_ * x_, y_ * y_, z_ * z_
    wx, wy, wz = w_ * x_, w_ * y_, w_ * z_
    xy, xz, yz = x_ * y_, x_ * z_, y_ * z_
    r00 = ww + xx - yy - zz
    r01 = 2 * (xy - wz)
    r02 = 2 * (xz + wy)
    r10 = 2 * (xy + wz)
    r11 = ww - xx + yy - zz
    r12 = 2 * (yz - wx)
    r20 = 2 * (xz - wy)
    r21 = 2 * (yz + wx)
    r22 = ww - xx - yy + zz

    d0, d1, d2 = X0 - C0, X1 - C1, X2 - C2
    # x = R^T d
    x0 = r00 * d0 + r10 * d1 + r20 * d2
    x1 = r01 * d0 + r11 * d1 + r21 * d2
    x2 = r02 * d0 + r12 * d1 + r22 * d2
    z = jnp.where(jnp.abs(x2) < 1e-12, 1e-12, x2)
    inv_z = 1.0 / z
    u = x0 * inv_z
    v = x1 * inv_z
    res0 = m0 - u
    res1 = m1 - v

    # Huber sqrt-IRLS weight x validity
    if huber_delta > 0.0:
        nrm = jnp.sqrt(res0 * res0 + res1 * res1)
        hw = jnp.where(nrm <= huber_delta, 1.0, huber_delta / jnp.maximum(nrm, 1e-12))
        rw = jnp.sqrt(hw) * wv
    else:
        rw = wv

    # J_pt rows: J_pt[0,k] = (R[k,0] - u R[k,2]) / z ; [1,k] = (R[k,1] - v R[k,2]) / z
    jp00 = (r00 - u * r02) * inv_z
    jp01 = (r10 - u * r12) * inv_z
    jp02 = (r20 - u * r22) * inv_z
    jp10 = (r01 - v * r02) * inv_z
    jp11 = (r11 - v * r12) * inv_z
    jp12 = (r21 - v * r22) * inv_z

    # dx_i/dq_k from the RAW-quaternion d vec(R)/d q table
    #   dx0/dq_k = dR00k d0 + dR10k d1 + dR20k d2  etc.
    W2, X2_, Y2, Z2 = 2 * qw, 2 * qx, 2 * qy, 2 * qz
    dx0_w = W2 * d0 + Z2 * d1 - Y2 * d2
    dx0_x = X2_ * d0 + Y2 * d1 + Z2 * d2
    dx0_y = -Y2 * d0 + X2_ * d1 - W2 * d2
    dx0_z = -Z2 * d0 + W2 * d1 + X2_ * d2
    dx1_w = -Z2 * d0 + W2 * d1 + X2_ * d2
    dx1_x = Y2 * d0 - X2_ * d1 + W2 * d2
    dx1_y = X2_ * d0 + Y2 * d1 + Z2 * d2
    dx1_z = -W2 * d0 - Z2 * d1 + Y2 * d2
    dx2_w = Y2 * d0 - X2_ * d1 + W2 * d2
    dx2_x = Z2 * d0 - W2 * d1 - X2_ * d2
    dx2_y = W2 * d0 + Z2 * d1 - Y2 * d2
    dx2_z = X2_ * d0 + Y2 * d1 + Z2 * d2

    jq00 = (dx0_w - u * dx2_w) * inv_z
    jq01 = (dx0_x - u * dx2_x) * inv_z
    jq02 = (dx0_y - u * dx2_y) * inv_z
    jq03 = (dx0_z - u * dx2_z) * inv_z
    jq10 = (dx1_w - v * dx2_w) * inv_z
    jq11 = (dx1_x - v * dx2_x) * inv_z
    jq12 = (dx1_y - v * dx2_y) * inv_z
    jq13 = (dx1_z - v * dx2_z) * inv_z

    # weighted rows: J_cam = [-J_pt | J_q] * rw ; J_pt *= rw ; res *= rw
    res0, res1 = res0 * rw, res1 * rw
    row0 = [-jp00 * rw, -jp01 * rw, -jp02 * rw, jq00 * rw, jq01 * rw, jq02 * rw, jq03 * rw]
    row1 = [-jp10 * rw, -jp11 * rw, -jp12 * rw, jq10 * rw, jq11 * rw, jq12 * rw, jq13 * rw]
    p0 = [jp00 * rw, jp01 * rw, jp02 * rw]
    p1 = [jp10 * rw, jp11 * rw, jp12 * rw]

    # per-observation blocks, (component, TO) layout
    dtd = [p0[i] * p0[j] + p1[i] * p1[j] for i in range(3) for j in range(3)]
    dtd_ref[:, :] = jnp.stack(dtd, axis=0)
    wblk = [row0[i] * p0[j] + row1[i] * p1[j] for i in range(7) for j in range(3)]
    wblk_ref[:, :] = jnp.stack(wblk, axis=0)
    bp = [p0[j] * res0 + p1[j] * res1 for j in range(3)]
    bp_ref[:, :] = jnp.stack(bp, axis=0)

    # camera-axis accumulation: [UtU (49) | b_c (7) | cost (1)] via ONE
    # one-hot matmul — the squared-residual row reduces over observations
    # in the same contraction (Mosaic cannot lower 1-D reductions directly)
    utu_bc = [row0[i] * row0[j] + row1[i] * row1[j] for i in range(7) for j in range(7)]
    utu_bc += [row0[i] * res0 + row1[i] * res1 for i in range(7)]
    utu_bc += [res0 * res0 + res1 * res1]
    payload = jnp.stack(utu_bc, axis=0)  # (57, TO)
    ids = cam_ref[0, :]
    onehot = (
        ids[:, None]
        == lax.broadcasted_iota(jnp.int32, (ids.shape[0], n_views), 1)
    ).astype(payload.dtype)
    tile_acc = jnp.dot(payload, onehot, preferred_element_type=jnp.float32)  # (57, V)

    @pl.when(pi == 0)
    def _init():
        acc_ref[:, :] = tile_acc

    @pl.when(pi != 0)
    def _acc():
        acc_ref[:, :] += tile_acc


@functools.partial(
    jax.jit, static_argnames=("n_views", "huber_delta", "interpret")
)
def pallas_ba_blocks(
    cam: Array,
    C_o: Array,
    q_o: Array,
    X_o: Array,
    uv: Array,
    w: Array,
    n_views: int,
    huber_delta: float,
    interpret: bool = False,
):
    """Fused residual/Jacobian/block products over all observations.

    Inputs are pre-gathered per observation: ``cam`` (O,) int32, ``C_o``
    (O,3), ``q_o`` (O,4), ``X_o`` (O,3), ``uv`` (O,2) normalised-coordinate
    measurements, ``w`` (O,) validity weights. Returns
    (U (V,7,7), b_c (V,7), DtD (O,3,3), W (O,7,3), b_p_o (O,3), cost ()).
    Requires O to be a multiple of the 512-row tile.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    O = cam.shape[0]
    TO = 512
    assert O % TO == 0, O
    grid = (O // TO,)
    dtype = jnp.float32

    def tile(width):
        return pl.BlockSpec((width, TO), lambda i: (0, i), memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    dtd, wblk, bp, acc = pl.pallas_call(
        functools.partial(
            _assemble_kernel, n_views=n_views, huber_delta=huber_delta
        ),
        grid=grid,
        in_specs=[tile(1), tile(3), tile(4), tile(3), tile(2), tile(1)],
        out_specs=[
            tile(9),
            tile(21),
            tile(3),
            full((57, n_views)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, O), dtype),
            jax.ShapeDtypeStruct((21, O), dtype),
            jax.ShapeDtypeStruct((3, O), dtype),
            jax.ShapeDtypeStruct((57, n_views), dtype),
        ],
        interpret=interpret,
    )(
        cam.astype(jnp.int32)[None, :],
        C_o.astype(dtype).T,
        q_o.astype(dtype).T,
        X_o.astype(dtype).T,
        uv.astype(dtype).T,
        w.astype(dtype)[None, :],
    )
    cost = jnp.sum(acc[56])
    acc = acc[:56].T  # (V, 56)
    U = acc[:, :49].reshape(n_views, 7, 7)
    b_c = acc[:, 49:]
    return (
        U,
        b_c,
        dtd.T.reshape(O, 3, 3),
        wblk.T.reshape(O, 7, 3),
        bp.T,
        cost,
    )
