"""Camera pose from the essential matrix + cheirality disambiguation.

Replaces the reference ``CamposeProcessor.extract_cam_pose_from_essential_mat``
/ ``disambiguate_cam_pose_four`` / ``evalulate_cam_pose_cheirality``
(``campose_processor.py:29-189``), with identical conventions:

* SVD E = U diag(s) V^T; candidate translations t = +-u3 (last column of
  U); candidate rotations R_a = U W V^T, R_b = U W^T V^T with a det<0
  global sign fix; rotations are returned **transposed** — i.e.
  cam-to-world — and candidates are ordered (Ra,+t), (Ra,-t), (Rb,+t),
  (Rb,-t) (the reference's block, ``campose_processor.py:87-95``).
  **Deliberate fix:** the reference uses u3 directly as the camera CENTER
  (``campose_processor.py:69-70``), but u3 is the *translation* (cam-2
  frame): E = [t]x R_w2c with t = -R_w2c C, so the center is C = -R_w2c^T t
  — candidate-dependent. The reference's convention mislocates the second
  camera by the candidate rotation (verified ~30 deg of center-direction
  error vs cv2.recoverPose on the upenn bootstrap pair); we return the
  correct centers and additionally expose ``t`` for fixture comparisons.
* Cheirality: a point passes if its projective depth (third row of P X_h)
  is positive in BOTH views (reference ``:181-188``); the best candidate is
  the first one with the maximal count (ties -> lowest index, matching the
  reference's strict ``>`` keep-best).

All functions are batched/vmapped-friendly and mask-aware; the per-point
Python loop of the reference becomes one matmul over the point axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from structure_from_motion_tpu.utils.geometry import camera_extrinsic


class PoseCandidates(NamedTuple):
    R: Array  # (4, 3, 3) cam-to-world rotations
    C: Array  # (4, 3) camera centers, C = -R t
    t: Array  # (4, 3) unit translations +-u3 (cam-2 frame)


def decompose_essential(E: Array) -> PoseCandidates:
    """Four (R, C) candidates from an essential matrix."""
    W = jnp.array(
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype
    )
    u, _, vh = jnp.linalg.svd(E)
    t = u[:, 2]
    Ra = u @ W @ vh
    Rb = u @ W.T @ vh
    Ra = jnp.where(jnp.linalg.det(Ra) < 0, -Ra, Ra)
    Rb = jnp.where(jnp.linalg.det(Rb) < 0, -Rb, Rb)
    # world-from-camera (transpose of the world->cam rotation the SVD yields)
    R = jnp.stack([Ra.T, Ra.T, Rb.T, Rb.T], axis=0)
    ts = jnp.stack([t, -t, t, -t], axis=0)
    # center: C = -R_w2c^T t = -(cam-to-world R) t  (NOT +-u3 — see module
    # docstring; deliberate fix of campose_processor.py:69-70)
    C = -jnp.einsum("cij,cj->ci", R, ts)
    return PoseCandidates(R=R, C=C, t=ts)


def refine_relative_pose(
    R: Array,
    t: Array,
    x1n: Array,
    x2n: Array,
    mask: Array,
    iterations: int = 20,
    damping: float = 1e-6,
):
    """Gauss-Newton refinement of a relative pose on the essential manifold.

    Minimises the Sampson error of E = [t]x R_w2c over the 5 dof
    (so(3) for R, 2-dof tangent at t on the unit sphere), using
    ``jax.jacfwd`` for the (N, 5) Jacobian. Upgrades the 8-point F -> E
    -> decompose chain (reference ``epipolar_processor.py`` +
    ``campose_processor.py:29-99``), whose translation direction is the
    two-view accuracy ceiling: measured ~11 deg off the cv2.recoverPose
    oracle on the upenn bootstrap pair before refinement, ~1-2 deg after.

    ``R``: (3, 3) cam-to-world; ``t``: (3,) unit translation (cam-2 frame);
    ``x1n``/``x2n``: (N, 2) K^-1-normalised correspondences. Returns
    (R, t, C) with C = -R t.
    """
    from structure_from_motion_tpu.utils.rotations import so3_exp

    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    def tangent_basis(tt):
        # recomputed from the CURRENT t every step — a basis frozen at the
        # initial t stops being orthogonal to t as it drifts, and the
        # off-sphere step component is then silently removed by the
        # renormalisation (shrinking the effective translation update)
        up = jnp.where(
            jnp.abs(tt[2]) < 0.9,
            jnp.array([0.0, 0.0, 1.0], tt.dtype),
            jnp.array([1.0, 0.0, 0.0], tt.dtype),
        )
        e1 = jnp.cross(tt, up)
        e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
        return e1, jnp.cross(tt, e1)

    x1h = jnp.concatenate([x1n, jnp.ones_like(x1n[:, :1])], axis=1)
    x2h = jnp.concatenate([x2n, jnp.ones_like(x2n[:, :1])], axis=1)
    m = mask.astype(R.dtype)

    from structure_from_motion_tpu.utils.rotations import so3_hat

    def residuals(p, R0, t0):
        # quadratic exp approximation: exact value AND derivative at p=0
        # (so3_exp's ||w|| has an undefined jacfwd derivative at zero, and
        # residuals are only ever evaluated/differentiated at p=0)
        W = so3_hat(p[:3])
        dR = jnp.eye(3, dtype=R.dtype) + W + 0.5 * (W @ W)
        R_w2c = (R0 @ dR).T  # update cam-to-world R0 on the right
        e1, e2 = tangent_basis(t0)
        tt = t0 + p[3] * e1 + p[4] * e2
        tt = tt / jnp.maximum(jnp.linalg.norm(tt), 1e-12)
        tx = jnp.array(
            [[0.0, -tt[2], tt[1]], [tt[2], 0.0, -tt[0]], [-tt[1], tt[0], 0.0]],
            R.dtype,
        )
        E = tx @ R_w2c
        Ex1 = x1h @ E.T  # (N, 3)
        Etx2 = x2h @ E
        num = jnp.sum(x2h * Ex1, axis=1)
        den = jnp.sqrt(
            jnp.maximum(
                Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2
                + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2,
                1e-18,
            )
        )
        return (num / den) * m

    def step(_, carry):
        R_cur, t_cur = carry
        p0 = jnp.zeros(5, R.dtype)
        r = residuals(p0, R_cur, t_cur)
        J = jax.jacfwd(residuals)(p0, R_cur, t_cur)  # (N, 5)
        JtJ = J.T @ J + damping * jnp.eye(5, dtype=R.dtype)
        p = -jnp.linalg.solve(JtJ, J.T @ r)
        dR = so3_exp(p[:3])
        R_new = R_cur @ dR  # cam-to-world, right-multiplied local update
        e1, e2 = tangent_basis(t_cur)
        t_new = t_cur + p[3] * e1 + p[4] * e2
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new), 1e-12)
        return R_new, t_new

    R_f, t_f = jax.lax.fori_loop(0, iterations, step, (R, t))
    C_f = -R_f @ t_f
    return R_f, t_f, C_f


def candidate_projections(K: Array, cands: PoseCandidates) -> Array:
    """(4, 3, 4) projection matrices K [R^T | -R^T C] for the candidates."""
    ext = camera_extrinsic(cands.R, cands.C)  # (4, 3, 4)
    return jnp.einsum("ij,cjk->cik", K, ext)


def cheirality_mask(P1: Array, P2: Array, X_h: Array, mask: Array) -> Array:
    """Points with positive projective depth in both cameras.

    ``P1``/``P2``: (3, 4) (or batched (..., 3, 4)); ``X_h``: (N, 4)
    homogeneous world points; ``mask``: (N,) validity. Returns (..., N) bool.
    """
    d1 = jnp.einsum("...j,nj->...n", P1[..., 2, :], X_h)
    d2 = jnp.einsum("...j,nj->...n", P2[..., 2, :], X_h)
    return jnp.logical_and(jnp.logical_and(d1 > 0, d2 > 0), mask)


def disambiguate_poses(
    P_ref: Array, P_cands: Array, X_cands_h: Array, mask: Array
) -> tuple[Array, Array, Array]:
    """Pick the candidate with the most points in front of both cameras.

    ``P_ref``: (3, 4) reference-view projection; ``P_cands``: (4, 3, 4);
    ``X_cands_h``: (4, N, 4) — each candidate's own triangulated points
    (the reference triangulates per candidate, ``ba_processor.py:93-96``).
    Returns (best_idx, per-candidate counts, valid mask of the winner).
    """
    valid = jnp.stack(
        [
            cheirality_mask(P_ref, P_cands[i], X_cands_h[i], mask)
            for i in range(4)
        ],
        axis=0,
    )  # (4, N)
    counts = jnp.sum(valid, axis=1)
    best = jnp.argmax(counts)
    return best, counts, valid[best]
