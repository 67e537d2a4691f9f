"""Homogeneous-coordinate and pinhole-projection primitives.

Replaces the reference's ``KeyPt``/``TriPt`` column-major array subclasses
(``utils.py:6-24``: 3xN / 4xN with a homogeneous last row) with plain
row-major arrays — points live as ``(N, 2)`` / ``(N, 3)`` (or homogeneous
``(N, 3)`` / ``(N, 4)``) so N sits on the TPU sublane axis and the small
coordinate dimension on lanes, and every op batches over leading axes.

Pose convention (identical to the reference, ``view_processor.py:40-57``):

* ``R``: cam-to-world rotation (3, 3)
* ``C``: camera center in world coordinates (3,)
* extrinsic (world->cam): ``[R^T | -R^T C]``
* projection: ``P = K [R^T | -R^T C]`` so that ``x ~ P X_h``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def to_homogeneous(pts: Array) -> Array:
    """``(..., N, D)`` -> ``(..., N, D+1)`` with a trailing 1."""
    ones = jnp.ones(pts.shape[:-1] + (1,), dtype=pts.dtype)
    return jnp.concatenate([pts, ones], axis=-1)


def from_homogeneous(pts_h: Array, eps: float = 1e-12) -> Array:
    """``(..., N, D+1)`` -> ``(..., N, D)`` by dividing out the last coord."""
    w = pts_h[..., -1:]
    denom = jnp.where(jnp.abs(w) < eps, jnp.where(w < 0, -eps, eps), w)
    return pts_h[..., :-1] / denom


def compose_K(fx: float, fy: float, cx: float, cy: float) -> Array:
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])


def camera_extrinsic(R: Array, C: Array) -> Array:
    """World->camera extrinsic ``[R^T | -R^T C]`` of shape ``(..., 3, 4)``."""
    Rt = jnp.swapaxes(R, -1, -2)
    t = -jnp.matmul(Rt, C[..., None])
    return jnp.concatenate([Rt, t], axis=-1)


def camera_projection(K: Array, R: Array, C: Array) -> Array:
    """Full projection ``P = K [R^T | -R^T C]`` of shape ``(..., 3, 4)``.

    Same quantity as the reference ``View.cam_proj`` (``view_processor.py:57``).
    """
    return jnp.matmul(K, camera_extrinsic(R, C))


def transform_world_to_camera(X: Array, R: Array, C: Array) -> Array:
    """World points ``(..., N, 3)`` -> camera frame ``(..., N, 3)``.

    ``X_cam = R^T (X - C)``; the third component is the depth used by the
    cheirality test (reference ``campose_processor.py:181-188``).
    """
    Rt = jnp.swapaxes(R, -1, -2)
    return jnp.matmul(X - C[..., None, :], jnp.swapaxes(Rt, -1, -2))


def project_points(P: Array, X: Array, eps: float = 1e-12) -> Array:
    """Project world points through ``(..., 3, 4)`` onto the image plane.

    ``X`` is ``(..., N, 3)`` (inhomogeneous); returns pixel coords
    ``(..., N, 2)``. Pure matmul + divide — fuses on TPU.
    """
    Xh = to_homogeneous(X)
    x = jnp.matmul(Xh, jnp.swapaxes(P, -1, -2))  # (..., N, 3)
    return from_homogeneous(x, eps)


def project_with_depth(P: Array, X: Array, eps: float = 1e-12):
    """Like :func:`project_points` but also returns the projective depth
    (the third homogeneous coordinate, positive when in front)."""
    Xh = to_homogeneous(X)
    x = jnp.matmul(Xh, jnp.swapaxes(P, -1, -2))
    return from_homogeneous(x, eps), x[..., 2]


def normalized_camera_coords(K: Array, uv: Array) -> Array:
    """Pixels ``(..., N, 2)`` -> normalised camera coords via ``K^-1``.

    The reference applies ``K^-1`` to measurements for nonlinear PnP and BA
    residuals (``campose_processor.py:386-400``, ``ba_processor.py:336-349``).
    Closed form (no solve): assumes zero skew like every K in the pipeline.
    """
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    x = (uv[..., 0] - cx[..., None]) / fx[..., None]
    y = (uv[..., 1] - cy[..., None]) / fy[..., None]
    return jnp.stack([x, y], axis=-1)


def normalized_camera_coords_per_obs(K: Array, uv: Array) -> Array:
    """Per-observation ``K^-1``: ``K`` (..., 3, 3) and ``uv`` (..., 2) share
    leading axes element-wise (one K per pixel — the per-view-intrinsics
    gather ``state.K[state.obs_cam]``), unlike
    :func:`normalized_camera_coords` where one K serves a trailing point
    axis."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack(
        [(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1
    )
