"""Standalone two-view metric reconstruction.

The minimal "model": given two sets of keypoints+descriptors (or raw match
coordinates), recover the relative pose and a triangulated point cloud.
This is the reference's view-1 bootstrap path (``ba_processor.py:63-135``)
packaged as one jittable function — useful on its own (visual odometry
seeding, tests) and reused by :class:`IncrementalSfM`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from structure_from_motion_tpu.config import PipelineConfig
from structure_from_motion_tpu.ops.campose import (
    candidate_projections,
    decompose_essential,
    disambiguate_poses,
    refine_relative_pose,
)
from structure_from_motion_tpu.ops.epipolar import (
    essential_from_fundamental,
    find_fundamental,
)
from structure_from_motion_tpu.ops.triangulation import (
    linear_triangulate,
    mean_reprojection_error,
    refine_triangulate,
)
from structure_from_motion_tpu.utils.geometry import (
    camera_projection,
    normalized_camera_coords,
)


class TwoViewResult(NamedTuple):
    R: Array  # (3, 3) cam-to-world rotation of view 2 (view 1 at identity)
    C: Array  # (3,) center of view 2 (unit-scale baseline)
    points: Array  # (N, 4) homogeneous triangulated points
    point_valid: Array  # (N,) bool (F-inlier and in front of both cameras)
    f_inliers: Array  # (N,) bool
    reprojection_px: Array  # () mean pixel reprojection error over valid pts


def two_view_reconstruction(
    key: Array,
    uv1: Array,
    uv2: Array,
    valid: Array,
    K: Array,
    config: PipelineConfig,
) -> TwoViewResult:
    """Correspondences (N,2)+(N,2) with validity mask -> metric two-view
    reconstruction with the baseline normalised to 1."""
    F = find_fundamental(key, uv1, uv2, valid, config.fundamental_ransac)
    E = essential_from_fundamental(F.F, K, K)
    cands = decompose_essential(E)

    P_ref = camera_projection(K, jnp.eye(3, dtype=K.dtype), jnp.zeros(3, K.dtype))
    P_cands = candidate_projections(K, cands)

    uv = jnp.stack([uv1, uv2], axis=1)
    obs_mask = jnp.stack([valid, valid], axis=1)
    X4 = jax.vmap(
        lambda P2: linear_triangulate(jnp.stack([P_ref, P2]), uv, obs_mask)
    )(P_cands)
    best, _, cheir_ok = disambiguate_poses(P_ref, P_cands, X4, valid)

    # essential-manifold Gauss-Newton refinement (Sampson error) of the
    # winning pose — the 8-point F -> E chain alone leaves ~10 deg of
    # translation-direction error on real pairs
    x1n = normalized_camera_coords(K, uv1)
    x2n = normalized_camera_coords(K, uv2)
    R2, t2, C2 = refine_relative_pose(
        cands.R[best], cands.t[best], x1n, x2n,
        jnp.logical_and(valid, F.inliers),
    )

    P2 = camera_projection(K, R2, C2)
    X2l = linear_triangulate(jnp.stack([P_ref, P2]), uv, obs_mask)
    refine_mask = jnp.stack([cheir_ok, cheir_ok], axis=1)
    Xh = refine_triangulate(
        jnp.stack([P_ref, P2]), uv, refine_mask, X2l, config.triangulation_lm
    )
    keep = jnp.logical_and(cheir_ok, F.inliers)
    err = mean_reprojection_error(
        jnp.stack([P_ref, P2]), Xh, uv, jnp.stack([keep, keep], axis=1)
    )
    return TwoViewResult(
        R=R2,
        C=C2,
        points=Xh,
        point_valid=keep,
        f_inliers=F.inliers,
        reprojection_px=err,
    )
