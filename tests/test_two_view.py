"""Standalone two-view reconstruction: synthetic ground truth + the real
upenn bootstrap pair against the cv2.recoverPose oracle."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from structure_from_motion_tpu.config import (
    CapacityConfig,
    FrontendConfig,
    PipelineConfig,
    RansacConfig,
)
from structure_from_motion_tpu.models import two_view_reconstruction


CFG = PipelineConfig(
    frontend=FrontendConfig(max_keypoints=512, upsample_first_octave=False),
    fundamental_ransac=RansacConfig(inlier_threshold=2.0, iteration=256),
    capacity=CapacityConfig(max_views=4, max_keypoints=512, max_points=2048,
                            max_observations=8192),
)


def test_two_view_synthetic_ground_truth():
    rng = np.random.default_rng(0)
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    n = 300
    X = rng.uniform([-4, -3, 8], [4, 3, 20], size=(n, 3))
    R2 = ScipyRotation.from_rotvec([0.03, -0.1, 0.02]).as_matrix()
    C2 = np.array([1.0, 0.1, 0.2])
    C2 /= np.linalg.norm(C2)  # unit baseline gauge

    def project(R, C):
        Xc = (R.T @ (X - C).T).T
        return (Xc[:, :2] / Xc[:, 2:3]) * [500, 500] + [320, 240]

    uv1 = project(np.eye(3), np.zeros(3))
    uv2 = project(R2, C2)
    cap = 512
    pad = cap - n
    u1 = jnp.asarray(np.vstack([uv1, np.zeros((pad, 2))]), jnp.float32)
    u2 = jnp.asarray(np.vstack([uv2, np.zeros((pad, 2))]), jnp.float32)
    valid = jnp.asarray(np.arange(cap) < n)

    res = two_view_reconstruction(jax.random.key(0), u1, u2, valid, jnp.asarray(K, jnp.float32), CFG)
    # pose (baseline already unit in both)
    assert np.linalg.norm(np.asarray(res.C) - C2) < 1e-2, res.C
    dR = ScipyRotation.from_matrix(np.asarray(res.R) @ R2.T).magnitude()
    assert np.degrees(dR) < 0.5
    # reconstruction quality
    assert int(res.point_valid.sum()) > 0.9 * n
    assert float(res.reprojection_px) < 0.5
    Xr = np.asarray(res.points)[:n, :3]
    assert np.abs(Xr - X).max() < 0.2  # same gauge: unit baseline


def test_two_view_upenn_pair_vs_opencv(reference_dataset_path):
    cv2 = pytest.importorskip("cv2")
    from structure_from_motion_tpu.io import load_image_grayscale, upenn_intrinsics

    d = os.path.join(reference_dataset_path, "upenn")
    i1 = load_image_grayscale(os.path.join(d, "image0000001.bmp")).astype(np.uint8)
    i2 = load_image_grayscale(os.path.join(d, "image0000002.bmp")).astype(np.uint8)
    K = upenn_intrinsics()
    sift = cv2.SIFT_create()
    k1, d1 = sift.detectAndCompute(i1, None)
    k2, d2 = sift.detectAndCompute(i2, None)
    bf = cv2.BFMatcher(cv2.NORM_L2)
    good = [a for a, b in bf.knnMatch(d1, d2, k=2) if a.distance < 0.7 * b.distance]
    p1 = np.float32([k1[g.queryIdx].pt for g in good])
    p2 = np.float32([k2[g.trainIdx].pt for g in good])

    E, m = cv2.findEssentialMat(p1, p2, K, cv2.RANSAC, 0.999, 1.0)
    _, R_cv, t_cv, _ = cv2.recoverPose(E, p1, p2, K, mask=m.copy())
    C_cv = (-R_cv.T @ t_cv).ravel()
    C_cv /= np.linalg.norm(C_cv)

    cap = 1024
    n = min(len(p1), cap)
    u1 = np.zeros((cap, 2), np.float32); u1[:n] = p1[:n]
    u2 = np.zeros((cap, 2), np.float32); u2[:n] = p2[:n]
    valid = np.arange(cap) < n
    res = two_view_reconstruction(
        jax.random.key(0), jnp.asarray(u1), jnp.asarray(u2),
        jnp.asarray(valid), jnp.asarray(K, jnp.float32), CFG
    )
    C = np.array(res.C)
    C = C / np.linalg.norm(C)
    # Sanity band vs the OpenCV oracle: the two pipelines optimise slightly
    # different inlier sets (ours: 2px-Sampson F-RANSAC + essential-manifold
    # GN; cv: 1px 5-point E-RANSAC), and on this pair OUR pose has ~3.5x
    # LOWER Sampson cost than cv's over our inliers — so agreement is
    # expected only to ~15 deg in translation direction, ~3 deg in rotation.
    assert float(np.dot(C, C_cv)) > np.cos(np.deg2rad(15.0)), (C, C_cv)
    dR = ScipyRotation.from_matrix(np.asarray(res.R) @ R_cv).magnitude()
    assert np.degrees(dR) < 3.0  # our R is cam-to-world = R_cv^T
