"""Camera pose from the essential matrix + cheirality disambiguation.

Replaces the reference ``CamposeProcessor.extract_cam_pose_from_essential_mat``
/ ``disambiguate_cam_pose_four`` / ``evalulate_cam_pose_cheirality``
(``campose_processor.py:29-189``), with identical conventions:

* SVD E = U diag(s) V^T; candidate centers C = +-u3 (last column of U);
  candidate rotations R_a = U W V^T, R_b = U W^T V^T with a det<0 global
  sign fix; rotations are returned **transposed** — i.e. cam-to-world —
  and candidates are ordered (Ra,C1), (Ra,C2), (Rb,C1), (Rb,C2)
  (the reference's commented 4x3x4 block, ``campose_processor.py:87-95``).
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
    C: Array  # (4, 3) camera centers


def decompose_essential(E: Array) -> PoseCandidates:
    """Four (R, C) candidates from an essential matrix."""
    W = jnp.array(
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype
    )
    u, _, vh = jnp.linalg.svd(E)
    c = u[:, 2]
    Ra = u @ W @ vh
    Rb = u @ W.T @ vh
    Ra = jnp.where(jnp.linalg.det(Ra) < 0, -Ra, Ra)
    Rb = jnp.where(jnp.linalg.det(Rb) < 0, -Rb, Rb)
    # world-from-camera (transpose of the world->cam rotation the SVD yields)
    R = jnp.stack([Ra.T, Ra.T, Rb.T, Rb.T], axis=0)
    C = jnp.stack([c, -c, c, -c], axis=0)
    return PoseCandidates(R=R, C=C)


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
