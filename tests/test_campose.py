"""Pose-from-essential tests against the reference's OpenCV-generated golden
tensors (test_dataset/opencv/ess_*.npy; reference campose_processor.py:813-960)."""

import numpy as np
import jax.numpy as jnp

from structure_from_motion_tpu.ops.campose import (
    candidate_projections,
    cheirality_mask,
    decompose_essential,
    disambiguate_poses,
)


def test_decompose_essential_matches_fixtures(opencv_fixtures):
    E = jnp.asarray(opencv_fixtures["ess_ess_mat"])
    cands = decompose_essential(E)
    R = np.asarray(cands.R)
    C = np.asarray(cands.C)
    # Truth rotations are stored world->cam; the reference (and we) return
    # cam-to-world, so compare against the transpose.
    t = np.asarray(cands.t)
    r1_truth = opencv_fixtures["ess_r1"].T
    r2_truth = opencv_fixtures["ess_r2"].T
    c1_truth = opencv_fixtures["ess_c1"].ravel()
    c2_truth = opencv_fixtures["ess_c2"].ravel()
    assert np.abs(R[0] - r1_truth).sum() < 1e-2  # candidates 0,1 share Ra
    assert np.abs(R[2] - r2_truth).sum() < 1e-2  # candidates 2,3 share Rb
    # The fixture "c" vectors are OpenCV's unit TRANSLATIONS (+-u3). The
    # reference misuses them as camera centers (campose_processor.py:69-70);
    # we expose them as .t and derive the true centers C = -R t.
    assert np.abs(t[0] - c1_truth).sum() < 1e-2
    assert np.abs(t[1] - c2_truth).sum() < 1e-2
    np.testing.assert_allclose(C, -np.einsum("cij,cj->ci", R, t), atol=1e-12)
    # orthonormal, det +1
    for i in range(4):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(R[i]), 1.0, atol=1e-10)
    # centers/translations are unit (|det R| = 1 preserves the norm)
    np.testing.assert_allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-6)
    np.testing.assert_allclose(C[0], -C[1], atol=1e-12)


def test_disambiguation_picks_r1c2(opencv_fixtures):
    """The fixture scene's true pose is candidate 1 (Ra, -t) — the reference
    asserts best_idx == 1 (campose_processor.py:937-945). Each candidate's
    points are triangulated with OUR projections (the fixture's *_result
    arrays were triangulated under the reference's misplaced centers and are
    only consistent with that convention)."""
    import jax

    from structure_from_motion_tpu.ops.triangulation import linear_triangulate

    E = jnp.asarray(opencv_fixtures["ess_ess_mat"])
    K = jnp.asarray(opencv_fixtures["ess_intrinsic_mat"])
    cands = decompose_essential(E)
    P_cands = candidate_projections(K, cands)

    ref_r = opencv_fixtures["ess_self_r"].T  # stored world->cam; we use c2w
    ref_c = opencv_fixtures["ess_self_c"].ravel()
    P_ref = np.asarray(K) @ np.hstack([ref_r.T, (-ref_r.T @ ref_c).reshape(3, 1)])

    pt1 = opencv_fixtures["ess_pixel_pt1"].reshape(-1, 2)
    pt2 = opencv_fixtures["ess_pixel_pt2"].reshape(-1, 2)
    uv = jnp.asarray(np.stack([pt1, pt2], axis=1))  # (N, 2, 2)
    mask = jnp.ones(uv.shape[0], dtype=bool)
    obs_mask = jnp.stack([mask, mask], axis=1)
    X_cands = jax.vmap(
        lambda P2: linear_triangulate(
            jnp.stack([jnp.asarray(P_ref), P2]), uv, obs_mask
        )
    )(P_cands)  # (4, N, 4)

    best, counts, valid = disambiguate_poses(jnp.asarray(P_ref), P_cands, X_cands, mask)
    assert int(best) == 1, (int(best), np.asarray(counts))
    # the winning candidate must dominate
    c = np.asarray(counts)
    assert c[1] == c.max() and c[1] > 0.5 * uv.shape[0]


def test_cheirality_mask_synthetic():
    # camera at origin looking +z; second camera shifted on x
    K = jnp.asarray(np.diag([500.0, 500.0, 1.0]))
    P1 = np.asarray(K) @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = np.asarray(K) @ np.hstack([np.eye(3), -np.array([[1.0], [0], [0]])])
    X = np.array(
        [
            [0.0, 0.0, 5.0, 1.0],  # in front of both
            [0.0, 0.0, -5.0, 1.0],  # behind both
            [0.5, 0.0, 5.0, 1.0],  # in front
        ]
    )
    mask = jnp.asarray([True, True, False])
    ok = np.asarray(
        cheirality_mask(jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(X), mask)
    )
    assert ok.tolist() == [True, False, False]  # masked point never passes


def test_refine_relative_pose_converges_from_distant_init():
    """Essential-manifold GN pulls a 20-deg-off translation direction back
    to the truth (the upenn bootstrap starts ~11 deg off; see
    refine_relative_pose docstring) and keeps t unit-norm."""
    import jax

    from structure_from_motion_tpu.ops.campose import refine_relative_pose
    from structure_from_motion_tpu.utils.rotations import so3_exp

    rng = np.random.default_rng(1)
    n = 200
    X = rng.uniform([-4, -3, 8], [4, 3, 16], size=(n, 3)).astype(np.float32)
    R_true = np.asarray(so3_exp(jnp.asarray([0.05, -0.12, 0.03], jnp.float32)))
    t_true = np.array([0.8, 0.15, 0.55], np.float32)
    t_true /= np.linalg.norm(t_true)
    # x2'^T E x1 = 0 with E = [t]x R_w2c and R cam-to-world
    Xc2 = X @ R_true + t_true
    x1n = (X[:, :2] / X[:, 2:3]).astype(np.float32)
    x2n = (Xc2[:, :2] / Xc2[:, 2:3]).astype(np.float32)
    mask = np.ones(n, bool)

    ang = np.deg2rad(20.0)
    ax = np.cross(t_true, [0.0, 0.0, 1.0])
    ax /= np.linalg.norm(ax)
    W = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    rot = np.eye(3) + np.sin(ang) * W + (1 - np.cos(ang)) * W @ W
    t0 = (rot @ t_true).astype(np.float32)

    R2, t2, C2 = refine_relative_pose(
        jnp.asarray(R_true), jnp.asarray(t0),
        jnp.asarray(x1n), jnp.asarray(x2n), jnp.asarray(mask),
    )
    t2 = np.asarray(t2)
    assert abs(np.linalg.norm(t2) - 1.0) < 1e-5
    err_deg = np.rad2deg(np.arccos(np.clip(abs(t2 @ t_true), -1.0, 1.0)))
    assert err_deg < 0.1, err_deg
    # C = -R t consistency
    np.testing.assert_allclose(
        np.asarray(C2), -np.asarray(R2) @ t2, rtol=1e-5, atol=1e-6
    )
