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
