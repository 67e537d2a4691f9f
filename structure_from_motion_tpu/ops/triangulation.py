"""Batched multi-view triangulation: linear DLT + Gauss-Newton/LM refinement.

Replaces the reference ``TriangulationProcessor`` (``triangulation_processor.py``):

* Linear DLT (reference ``:91-157``): per point, per view the two rows
  ``u * P3 - P1`` and ``v * P3 - P2``; SVD nullspace; normalise by the
  homogeneous W. The reference loops per point in Python — here the whole
  (N, 2V, 4) system batch goes through one batched SVD. Rows of masked-out
  observations are zeroed, which leaves the nullspace of the remaining rows
  untouched, so fixed-capacity observation buffers just work.
* Nonlinear refinement (reference ``:160-234``): 3-parameter per-point LM
  with residuals in *image* coordinates (projection includes K — this stage
  is deliberately inconsistent with PnP/BA's normalised-coordinate
  residuals in the reference; we reproduce that) and a fixed damping, fixed
  iteration count. The 2Vx3 Jacobian is the closed-form projective
  derivative; the 3x3 normal equations invert in closed form, so one LM
  step per point is a handful of fused VPU ops: the whole refinement is a
  ``lax.fori_loop`` over iterations of shape-(N, ...) math with no Python
  loop over points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from structure_from_motion_tpu.config import LMConfig
from structure_from_motion_tpu.ops.linalg import (
    inv3x3,
    nullspace,
    nullspace_gram,
    use_fast_nullspace,
)


def linear_triangulate(P: Array, uv: Array, obs_mask: Array) -> Array:
    """Batched DLT.

    ``P``: (V, 3, 4) projections shared by all points, or (N, V, 3, 4)
    per-point projections (e.g. every point triangulated from its own view
    pair); ``uv``: (N, V, 2) pixel observations; ``obs_mask``: (N, V) which
    views observe each point. Returns homogeneous points (N, 4), W=1.
    """
    if P.ndim == 3:
        P = P[None]  # broadcast (1, V, 3, 4)
    p0 = P[..., 0, :]  # (N|1, V, 4)
    p1 = P[..., 1, :]
    p2 = P[..., 2, :]
    u = uv[..., 0][..., None]  # (N, V, 1)
    v = uv[..., 1][..., None]
    row_u = u * p2 - p0  # (N, V, 4)
    row_v = v * p2 - p1
    rows = jnp.concatenate([row_u, row_v], axis=1)  # (N, 2V, 4)
    m = jnp.concatenate([obs_mask, obs_mask], axis=1)[..., None]
    rows = rows * m
    if use_fast_nullspace():
        X = nullspace_gram(rows)  # (N, 4): ~30x the batched SVD on TPU
    else:
        X = nullspace(rows)  # (N, 4)
    w = X[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    return X / w


def _project(P: Array, Xh: Array) -> Array:
    """(V,3,4) shared or (N,V,3,4) per-point projections -> (N, V, 3)."""
    if P.ndim == 3:
        return jnp.einsum("vij,nj->nvi", P, Xh)
    return jnp.einsum("nvij,nj->nvi", P, Xh)


def reprojection_residuals(P: Array, X: Array, uv: Array, obs_mask: Array):
    """Residuals (proj - measurement) and depths for (N,3) points.

    Returns residuals (N, V, 2) zeroed at masked observations and the
    projective depths (N, V).
    """
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)  # (N, 4)
    proj = _project(P, Xh)  # (N, V, 3)
    depth = proj[..., 2]
    safe = jnp.where(jnp.abs(depth) < 1e-12, 1e-12, depth)
    pix = proj[..., :2] / safe[..., None]
    res = (pix - uv) * obs_mask[..., None]
    return res, depth


def _projection_jacobian(P: Array, X: Array, obs_mask: Array) -> Array:
    """Closed-form d(pix)/dX: (N, V, 2, 3).

    For rows (a, b, c) of P: d(u)/dX = (a3 - u * c3) / depth where a3/c3 are
    the rotation-part rows. Masked observations contribute zero rows.
    """
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    proj = _project(P, Xh)  # (N, V, 3)
    depth = proj[..., 2]
    safe = jnp.where(jnp.abs(depth) < 1e-12, 1e-12, depth)
    Pb = P[None] if P.ndim == 3 else P  # (N|1, V, 3, 4)
    A = Pb[..., :2, :3]  # (N|1, V, 2, 3)
    c = Pb[..., 2, :3]  # (N|1, V, 3)
    pix = proj[..., :2] / safe[..., None]  # (N, V, 2)
    J = (A - pix[..., None] * c[..., None, :]) / safe[..., None, None]
    return J * obs_mask[..., None, None]


def refine_triangulate(
    P: Array,
    uv: Array,
    obs_mask: Array,
    X0_h: Array,
    config: LMConfig,
) -> Array:
    """Fixed-damping LM refinement of all points at once.

    One iteration: residual e = proj - meas (image coords), Jacobian J
    (N, 2V, 3), step d = (J^T J + lambda I)^-1 J^T e, X <- X - d (the sign
    matches the reference's proj-minus-measurement convention,
    ``triangulation_processor.py:227-228,306-307``).

    ``X0_h``: (N, 4) homogeneous initial points (from :func:`linear_triangulate`).
    Returns refined (N, 4) with W=1.
    """
    X0 = X0_h[..., :3] / jnp.where(
        jnp.abs(X0_h[..., 3:4]) < 1e-12, 1e-12, X0_h[..., 3:4]
    )
    lam = jnp.asarray(config.damping, dtype=X0.dtype)
    eye = jnp.eye(3, dtype=X0.dtype)

    def step(X):
        res, _ = reprojection_residuals(P, X, uv, obs_mask)  # (N, V, 2)
        J = _projection_jacobian(P, X, obs_mask)  # (N, V, 2, 3)
        Jf = J.reshape(J.shape[0], -1, 3)  # (N, 2V, 3)
        rf = res.reshape(res.shape[0], -1)  # (N, 2V)
        JtJ = jnp.einsum("nki,nkj->nij", Jf, Jf) + lam * eye
        Jte = jnp.einsum("nki,nk->ni", Jf, rf)
        delta = jnp.einsum("nij,nj->ni", inv3x3(JtJ), Jte)
        return X - delta, delta

    # convergence early exit on the WORST point: each fixed-damping LM
    # iteration is ~0.2 ms of sequential latency at production batch sizes,
    # and the whole batch typically converges in a fraction of the budget;
    # stopping once the largest ||delta||^2 is below f32 resolution returns
    # the same points as the full budget
    def cond(state):
        _, i, dn = state
        return jnp.logical_and(i < config.iterations, dn > 1e-14)

    def body(state):
        X, i, _ = state
        X2, delta = step(X)
        return X2, i + 1, jnp.max(jnp.sum(delta * delta, axis=-1))

    X, _, _ = jax.lax.while_loop(
        cond, body, (X0, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, X0.dtype))
    )
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def triangulate(
    P: Array,
    uv: Array,
    obs_mask: Array,
    config: LMConfig,
) -> Array:
    """Linear DLT then LM refinement — the reference's two-stage
    ``TriangulationProcessor.triangulate`` (``triangulation_processor.py:31-88``)
    over the whole point batch at once. Returns (N, 4) homogeneous points."""
    X0 = linear_triangulate(P, uv, obs_mask)
    return refine_triangulate(P, uv, obs_mask, X0, config)


def mean_reprojection_error(
    P: Array, X_h: Array, uv: Array, obs_mask: Array
) -> Array:
    """Mean L2 pixel reprojection error over valid observations — the
    pipeline-level quality metric (BASELINE.json)."""
    X = X_h[..., :3] / jnp.where(
        jnp.abs(X_h[..., 3:4]) < 1e-12, 1e-12, X_h[..., 3:4]
    )
    res, _ = reprojection_residuals(P, X, uv, obs_mask)
    err = jnp.linalg.norm(res, axis=-1)  # (N, V); masked entries are 0
    count = jnp.maximum(jnp.sum(obs_mask), 1)
    return jnp.sum(err) / count
