"""Shared reprojection residuals + closed-form Jacobians.

This is the computational core reused by nonlinear PnP (reference
``campose_processor.py:308-482``) and bundle adjustment (reference
``ba_processor.py:297-373``): residuals in *normalised camera coordinates*
(measurements premultiplied by K^-1; projection without K) of a camera
parameterised as ``[C (3), q (4)]`` (center + quaternion) observing world
points X.

Everything is written per-observation and vmapped — on TPU one fused
VPU kernel evaluates residual + both Jacobian blocks for every observation
at once, the SoA analogue of the reference's per-(point, view) Python loop.

Jacobian convention follows the reference: d vec(R)/d q is the raw
(unnormalised) quadratic form (``campose_processor.py:636-702``); q is
re-normalised after every LM update rather than projecting the Jacobian
onto the unit sphere. Residual sign is ``measurement - projection`` and
updates are ``params += delta``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from structure_from_motion_tpu.utils.rotations import (
    drotation_dquat,
    quat_to_rotation,
)


def project_normalized(C: Array, q: Array, X: Array):
    """Project world point(s) into normalised camera coordinates.

    ``C``: (..., 3), ``q``: (..., 4), ``X``: (..., 3) — all broadcastable.
    Returns (proj (..., 2), depth (...,)).
    """
    R = quat_to_rotation(q)
    d = X - C
    # x_cam = R^T d
    x = jnp.einsum("...ji,...j->...i", R, d)
    depth = x[..., 2]
    safe = jnp.where(jnp.abs(depth) < 1e-12, 1e-12, depth)
    return x[..., :2] / safe[..., None], depth


def observation_residual_jacobians(C: Array, q: Array, X: Array, meas: Array):
    """Residual + Jacobian blocks for ONE observation (vmap over leading axes).

    ``meas`` is the measurement already in normalised camera coordinates
    (pixels through K^-1). Returns:

        res   (2,)   = meas - proj
        J_cam (2, 7) = d proj / d [C, q]
        J_pt  (2, 3) = d proj / d X

    Closed form: with d = X - C, x = R^T d, u = x0/x2, v = x1/x2:
        d proj/d x = [[1/x2, 0, -u/x2], [0, 1/x2, -v/x2]]
        d x/d X    = R^T          (and d x/d C = -R^T)
        d x/d vec(R)[3j+k] = delta_{ik} d_j   (row-major vec, x_i = R_ji d_j)
    """
    R = quat_to_rotation(q)
    d = X - C
    x = R.T @ d
    z = jnp.where(jnp.abs(x[2]) < 1e-12, 1e-12, x[2])
    u, v = x[0] / z, x[1] / z
    proj = jnp.stack([u, v])
    res = meas - proj

    dproj_dx = jnp.array([[1.0, 0.0, -u], [0.0, 1.0, -v]], dtype=X.dtype) / z

    dproj_dX = dproj_dx @ R.T  # (2, 3)
    dproj_dC = -dproj_dX  # (2, 3)

    # dx/dvec(R): x_i = sum_j R_{ji} d_j; row-major vec index 3j+i.
    # Build as (3, 9) then chain with (9, 4) quaternion Jacobian.
    dx_dvecR = jnp.zeros((3, 9), dtype=X.dtype)
    for i in range(3):
        for j in range(3):
            dx_dvecR = dx_dvecR.at[i, 3 * j + i].set(d[j])
    dproj_dq = dproj_dx @ dx_dvecR @ drotation_dquat(q)  # (2, 4)

    J_cam = jnp.concatenate([dproj_dC, dproj_dq], axis=1)  # (2, 7)
    return res, J_cam, dproj_dX


def batched_residual_jacobians(C: Array, q: Array, X: Array, meas: Array):
    """Residual + Jacobian blocks for ALL observations at once.

    (O,3),(O,4),(O,3),(O,2) -> res (O,2), J_cam (O,2,7), J_pt (O,2,3).

    Identical math to :func:`observation_residual_jacobians` but written as
    direct batched einsums — the vmapped per-observation form builds its
    (3, 9) ``dx/dvec(R)`` with nine scatters per observation, which lowers
    to ~80% of a BA iteration's wall time on TPU (measured 119 ms of a
    153 ms iteration at 131k observations); this closed form is pure
    elementwise + (O, small) einsums.
    """
    R = quat_to_rotation(q)  # (O, 3, 3)
    d = X - C  # (O, 3)
    x = jnp.einsum("oji,oj->oi", R, d)  # R^T d
    z = jnp.where(jnp.abs(x[..., 2]) < 1e-12, 1e-12, x[..., 2])
    u = x[..., 0] / z
    v = x[..., 1] / z
    proj = jnp.stack([u, v], axis=-1)
    res = meas - proj

    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    dproj_dx = (
        jnp.stack(
            [
                jnp.stack([one, zero, -u], axis=-1),
                jnp.stack([zero, one, -v], axis=-1),
            ],
            axis=-2,
        )
        / z[..., None, None]
    )  # (O, 2, 3)

    dproj_dX = jnp.einsum("oik,ojk->oij", dproj_dx, R)  # dx/dX = R^T
    dproj_dC = -dproj_dX

    # dx_i/dq_k = sum_j dR_ji/dq_k d_j, from the 9x4 dvec(R)/dq (row-major)
    dRdq = drotation_dquat(q).reshape(*q.shape[:-1], 3, 3, 4)  # (O,3,3,4)
    dx_dq = jnp.einsum("ojik,oj->oik", dRdq, d)  # (O, 3, 4)
    dproj_dq = jnp.einsum("oik,okl->oil", dproj_dx, dx_dq)  # (O, 2, 4)

    J_cam = jnp.concatenate([dproj_dC, dproj_dq], axis=-1)  # (O, 2, 7)
    return res, J_cam, dproj_dX


def pixel_residuals(K: Array, C: Array, q: Array, X: Array, uv: Array):
    """Pixel-space reprojection residuals (meas - proj) and depths.

    Used for RANSAC inlier scoring, which the reference does in pixel space
    (``campose_processor.py:538-554``). Broadcasts over leading axes.
    """
    proj_n, depth = project_normalized(C, q, X)
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    px = jnp.stack(
        [proj_n[..., 0] * fx + cx, proj_n[..., 1] * fy + cy], axis=-1
    )
    return uv - px, depth
