"""Rotation / quaternion kit — batched, jittable, branch-free.

Covers the capabilities of the reference rotation utilities
(``utils.py:28-105``: trace-formula R->q with a qw~0 guard, closed-form q->R,
and a validity check), re-designed for TPU:

* every function maps over arbitrary leading batch axes,
* the R->q conversion uses the branch-free "pick the largest of the four
  squared components" construction (Shepperd's method via ``where`` selects)
  instead of the reference's Python ``if`` ladder, so it vmaps and jits,
* validity checks return boolean arrays instead of raising ``ValueError``
  (host code may ``checkify``/assert on them).

Quaternions are stored ``(w, x, y, z)``, matching the reference layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def quat_normalize(q: Array, eps: float = 1e-12) -> Array:
    """Normalise quaternions to unit length over the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_to_rotation(q: Array) -> Array:
    """Unit quaternion(s) ``(..., 4)`` -> rotation matrix(es) ``(..., 3, 3)``.

    Closed form, same convention as the reference's
    ``convert_quaternion_to_rotation`` (``utils.py:64-97``).
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotation_to_quat(R: Array) -> Array:
    """Rotation matrix(es) ``(..., 3, 3)`` -> unit quaternion(s) ``(..., 4)``.

    Branch-free Shepperd construction: compute all four candidate
    quaternions (each numerically stable when its pivot component is the
    largest) and select by the largest pivot with ``where``. Replaces the
    reference's trace formula + qw~0 special-case branches
    (``utils.py:28-60``) with something vmappable.

    The sign convention fixes ``w >= 0``.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four pivots: 4w^2-1, 4x^2-1, 4y^2-1, 4z^2-1 (each = 1 + signed trace combo)
    tw = 1.0 + tr
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-24))

    sw, sx, sy, sz = safe_sqrt(tw), safe_sqrt(tx), safe_sqrt(ty), safe_sqrt(tz)

    # Candidate quaternions (unnormalised), one per pivot.
    qw = jnp.stack([sw * sw, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, sx * sx, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, sy * sy, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, sz * sz], axis=-1)

    pivots = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: w >= 0 (matches the reference's positive-trace root).
    return jnp.where(q[..., :1] < 0, -q, q)


def rotation_is_valid(R: Array, tol: float = 1e-3) -> Array:
    """Boolean validity: det(R) ~ 1 and R^-1 ~ R^T.

    Array-valued analogue of the reference ``verify_rotation_mat``
    (``utils.py:101-105``) which raised ``ValueError``.
    """
    det_ok = jnp.abs(jnp.linalg.det(R) - 1.0) < tol
    eye = jnp.eye(3, dtype=R.dtype)
    orth_ok = jnp.max(
        jnp.abs(jnp.matmul(R, jnp.swapaxes(R, -1, -2)) - eye), axis=(-2, -1)
    ) < tol
    return jnp.logical_and(det_ok, orth_ok)


def so3_hat(w: Array) -> Array:
    """so(3) hat operator: ``(..., 3)`` -> skew-symmetric ``(..., 3, 3)``."""
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: Array, eps: float = 1e-8) -> Array:
    """Rodrigues exponential map ``(..., 3)`` -> ``(..., 3, 3)``.

    Used by the improved (local-parameterisation) optimizers; the reference
    only ever uses global quaternion updates. Small-angle safe.
    """
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, eps)
    k = w / theta
    K = so3_hat(k)
    theta = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * jnp.matmul(K, K)


def quat_multiply(a: Array, b: Array) -> Array:
    """Hamilton product of (w, x, y, z) quaternions, batched."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def drotation_dquat(q: Array) -> Array:
    """Analytic 9x4 Jacobian d vec(R)/d q for an (unnormalised) quaternion.

    Row order follows row-major vec(R). Equivalent in role to the reference's
    closed-form ``__construct_jacobian_rotation_wrt_quaternion``
    (``campose_processor.py:636-702``), derived here from the q->R closed form
    with jax.jacfwd-verified coefficients. Batched over leading axes.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two = jnp.asarray(2.0, dtype=q.dtype)
    # d vec(R) / d [w, x, y, z]; vec(R) row-major (R00 R01 R02 R10 ... R22).
    rows = [
        jnp.stack([two * w, two * x, -two * y, -two * z], axis=-1),  # R00
        jnp.stack([-two * z, two * y, two * x, -two * w], axis=-1),  # R01
        jnp.stack([two * y, two * z, two * w, two * x], axis=-1),  # R02
        jnp.stack([two * z, two * y, two * x, two * w], axis=-1),  # R10
        jnp.stack([two * w, -two * x, two * y, -two * z], axis=-1),  # R11
        jnp.stack([-two * x, -two * w, two * z, two * y], axis=-1),  # R12
        jnp.stack([-two * y, two * z, -two * w, two * x], axis=-1),  # R20
        jnp.stack([two * x, two * w, two * z, two * y], axis=-1),  # R21
        jnp.stack([two * w, -two * x, -two * y, two * z], axis=-1),  # R22
    ]
    return jnp.stack(rows, axis=-2)
