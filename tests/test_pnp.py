"""PnP tests against the reference's OpenCV fixture scene
(test_dataset/opencv/pnp_*.npy; reference campose_processor.py:1021-1120)
and cv2.solvePnPRansac as a cross-check oracle."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from structure_from_motion_tpu.config import LMConfig, RansacConfig
from structure_from_motion_tpu.ops.pnp import (
    estimate_pnp,
    linear_pnp_ransac,
    refine_pnp,
    solve_pnp_dlt,
)
from structure_from_motion_tpu.ops.reproj import (
    batched_residual_jacobians,
    observation_residual_jacobians,
)
from structure_from_motion_tpu.utils.geometry import normalized_camera_coords


def fixture_scene(opencv_fixtures, upenn_K):
    """The pnp_* fixtures: 1639 3D-2D correspondences with ground truth.

    ``pnp_rotation``/``pnp_translation`` store the world->cam pose (OpenCV
    convention): x_cam = R X + t, so cam-to-world R_c2w = R^T, C = -R^T t.
    """
    X = opencv_fixtures["pnp_points_3d"]
    uv = opencv_fixtures["pnp_points_2d"]
    R_w2c = opencv_fixtures["pnp_rotation"]
    t = opencv_fixtures["pnp_translation"].ravel()
    R_true = R_w2c.T
    C_true = -R_w2c.T @ t
    return X, uv, R_true, C_true


def pose_errors(R, C, R_true, C_true):
    dR = ScipyRotation.from_matrix(np.asarray(R) @ R_true.T).magnitude()
    return np.degrees(dR), np.linalg.norm(np.asarray(C) - C_true)


def test_jacobians_match_autodiff():
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.normal(size=3))
    q = jnp.asarray(rng.normal(size=4))
    q = q / jnp.linalg.norm(q)
    X = jnp.asarray(rng.normal(size=3) + np.array([0, 0, 6.0]))
    meas = jnp.asarray(rng.normal(size=2) * 0.1)

    res, J_cam, J_pt = observation_residual_jacobians(C, q, X, meas)

    def proj_fn(params):
        from structure_from_motion_tpu.ops.reproj import project_normalized

        p, _ = project_normalized(params[:3], params[3:7], params[7:10])
        return p

    params = jnp.concatenate([C, q, X])
    J_auto = jax.jacfwd(proj_fn)(params)
    np.testing.assert_allclose(np.asarray(J_cam), np.asarray(J_auto[:, :7]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(J_pt), np.asarray(J_auto[:, 7:10]), atol=1e-9)


def test_dlt_exact_pose(upenn_K):
    rng = np.random.default_rng(1)
    R_true = ScipyRotation.from_rotvec([0.2, -0.3, 0.1]).as_matrix()
    C_true = np.array([1.0, 2.0, -0.5])
    X = rng.uniform([-3, -3, 6], [3, 3, 14], size=(12, 3))
    Xc = (R_true.T @ (X - C_true).T).T
    meas = Xc[:, :2] / Xc[:, 2:3]
    R, C = solve_pnp_dlt(jnp.asarray(X), jnp.asarray(meas))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-8)
    np.testing.assert_allclose(np.asarray(C), C_true, atol=1e-7)


def test_linear_pnp_fixture(opencv_fixtures, upenn_K):
    """Reference bound: euler diff < 1 deg, loc diff < 0.1
    (campose_processor.py:1056-1064)."""
    X, uv, R_true, C_true = fixture_scene(opencv_fixtures, upenn_K)
    K = opencv_fixtures["ess_intrinsic_mat"]
    cfg = RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=300)
    res = linear_pnp_ransac(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K),
        jnp.ones(len(X), dtype=bool), cfg,
    )
    ang, loc = pose_errors(res.R, res.C, R_true, C_true)
    assert ang < 1.0, ang
    assert loc < 0.1, loc
    # the fixture correspondences are noisy; at 8 px a bit over half qualify
    assert int(res.num_inliers) > 0.5 * len(X)


def test_full_pnp_fixture_and_opencv_crosscheck(opencv_fixtures, upenn_K):
    X, uv, R_true, C_true = fixture_scene(opencv_fixtures, upenn_K)
    K = opencv_fixtures["ess_intrinsic_mat"]
    res = estimate_pnp(
        jax.random.key(1), jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K),
        jnp.ones(len(X), dtype=bool),
        RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=300),
        LMConfig(damping=5.0, iterations=100),
    )
    ang, loc = pose_errors(res.R, res.C, R_true, C_true)
    assert ang < 1.0, ang
    assert loc < 0.1, loc

    # cross-check vs cv2.solvePnPRansac (reference does the same,
    # campose_processor.py:1035-1042)
    ok, rvec, tvec, _ = cv2.solvePnPRansac(
        X.astype(np.float64), uv.astype(np.float64), K, None
    )
    assert ok
    R_cv = cv2.Rodrigues(rvec)[0].T
    C_cv = (-R_cv @ tvec).ravel()
    ang_cv, loc_cv = pose_errors(res.R, res.C, R_cv.T.T, C_cv)
    assert ang_cv < 1.0
    assert loc_cv < 0.1


def test_pnp_with_outliers_and_padding(upenn_K):
    rng = np.random.default_rng(2)
    R_true = ScipyRotation.from_rotvec([-0.1, 0.25, 0.05]).as_matrix()
    C_true = np.array([0.5, -1.0, 0.3])
    n, cap = 300, 512
    X = rng.uniform([-4, -4, 5], [4, 4, 15], size=(n, 3))
    Xc = (R_true.T @ (X - C_true).T).T
    uv = (upenn_K @ np.vstack([(Xc[:, :2] / Xc[:, 2:3]).T, np.ones(n)])).T[:, :2]
    uv += rng.normal(size=(n, 2)) * 0.5
    out_idx = rng.choice(n, 90, replace=False)
    uv[out_idx] += rng.uniform(40, 200, size=(90, 2))
    X_p = np.vstack([X, np.zeros((cap - n, 3))])
    uv_p = np.vstack([uv, np.zeros((cap - n, 2))])
    mask = np.concatenate([np.ones(n, dtype=bool), np.zeros(cap - n, dtype=bool)])

    res = jax.jit(
        lambda k, X, uv, m: estimate_pnp(
            k, X, uv, jnp.asarray(upenn_K), m,
            RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=300),
            LMConfig(damping=5.0, iterations=100),
        )
    )(jax.random.key(3), jnp.asarray(X_p), jnp.asarray(uv_p), jnp.asarray(mask))

    ang, loc = pose_errors(res.R, res.C, R_true, C_true)
    assert ang < 0.5, ang
    assert loc < 0.05, loc
    inl = np.asarray(res.inliers)
    assert not inl[n:].any()
    true_in = np.ones(n, dtype=bool)
    true_in[out_idx] = False
    assert (inl[:n] & true_in).sum() > 0.9 * true_in.sum()


def test_pnp_subset_scoring_matches_full(upenn_K):
    """``RansacConfig.score_subset``: ranking hypotheses on a random valid
    subset (the (hypotheses x points) scoring matrix is the bandwidth cost)
    must still land in the true consensus basin, and the winner's inlier
    set is re-scored exactly on the full point set — so padded rows stay
    excluded and the recovered pose matches the full-scoring path's
    quality bounds on the same contaminated scene."""
    rng = np.random.default_rng(2)
    R_true = ScipyRotation.from_rotvec([-0.1, 0.25, 0.05]).as_matrix()
    C_true = np.array([0.5, -1.0, 0.3])
    n, cap = 300, 512
    X = rng.uniform([-4, -4, 5], [4, 4, 15], size=(n, 3))
    Xc = (R_true.T @ (X - C_true).T).T
    uv = (upenn_K @ np.vstack([(Xc[:, :2] / Xc[:, 2:3]).T, np.ones(n)])).T[:, :2]
    uv += rng.normal(size=(n, 2)) * 0.5
    out_idx = rng.choice(n, 90, replace=False)
    uv[out_idx] += rng.uniform(40, 200, size=(90, 2))
    X_p = np.vstack([X, np.zeros((cap - n, 3))])
    uv_p = np.vstack([uv, np.zeros((cap - n, 2))])
    mask = np.concatenate([np.ones(n, dtype=bool), np.zeros(cap - n, dtype=bool)])

    res = jax.jit(
        lambda k, X, uv, m: estimate_pnp(
            k, X, uv, jnp.asarray(upenn_K), m,
            RansacConfig(
                inlier_threshold=8.0, sample_num=6, iteration=300,
                score_subset=128,
            ),
            LMConfig(damping=5.0, iterations=100),
        )
    )(jax.random.key(3), jnp.asarray(X_p), jnp.asarray(uv_p), jnp.asarray(mask))

    ang, loc = pose_errors(res.R, res.C, R_true, C_true)
    assert ang < 0.5, ang
    assert loc < 0.05, loc
    inl = np.asarray(res.inliers)
    assert not inl[n:].any()
    true_in = np.ones(n, dtype=bool)
    true_in[out_idx] = False
    assert (inl[:n] & true_in).sum() > 0.9 * true_in.sum()


def test_refine_pnp_recovers_from_perturbation(upenn_K):
    rng = np.random.default_rng(4)
    R_true = ScipyRotation.from_rotvec([0.05, -0.15, 0.2]).as_matrix()
    C_true = np.array([-0.3, 0.8, 0.1])
    n = 100
    X = rng.uniform([-3, -3, 4], [3, 3, 12], size=(n, 3))
    Xc = (R_true.T @ (X - C_true).T).T
    uv = (upenn_K @ np.vstack([(Xc[:, :2] / Xc[:, 2:3]).T, np.ones(n)])).T[:, :2]
    R0 = ScipyRotation.from_rotvec([0.08, -0.12, 0.17]).as_matrix()
    C0 = C_true + np.array([0.1, -0.1, 0.05])
    R, C = refine_pnp(
        jnp.asarray(X), jnp.asarray(uv), jnp.asarray(upenn_K),
        jnp.ones(n, dtype=bool), jnp.asarray(R0), jnp.asarray(C0),
        LMConfig(damping=5.0, iterations=200),
    )
    ang, loc = pose_errors(R, C, R_true, C_true)
    assert ang < 0.01, ang
    assert loc < 1e-3, loc


def test_motion_prior_rescues_contaminated_set():
    """At ~25% inlier ratio a 6-point RANSAC rarely draws a clean sample;
    the Huber-LM candidate seeded from a nearby prior pose must rescue the
    localisation (deliberate improvement over the reference, which has no
    fallback path)."""
    import jax

    from structure_from_motion_tpu.config import LMConfig, RansacConfig
    from structure_from_motion_tpu.ops.pnp import estimate_pnp

    rng = np.random.default_rng(4)
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    n_in, n_out = 60, 180  # 25% inliers
    X_in = rng.uniform([-3, -3, 8], [3, 3, 16], size=(n_in, 3))
    R_true = ScipyRotation.from_rotvec([0.02, -0.05, 0.01]).as_matrix()
    C_true = np.array([1.0, 0.2, 0.3])
    Xc = (R_true.T @ (X_in - C_true).T).T
    uv_in = (Xc[:, :2] / Xc[:, 2:3]) * [500, 500] + [320, 240]
    # outliers: random 3D paired with random pixels
    X_out = rng.uniform([-3, -3, 8], [3, 3, 16], size=(n_out, 3))
    uv_out = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    X = np.vstack([X_in, X_out])
    uv = np.vstack([uv_in, uv_out])
    mask = np.ones(n_in + n_out, bool)

    prior_R = ScipyRotation.from_rotvec([0.0, -0.04, 0.0]).as_matrix()
    prior_C = np.array([0.9, 0.15, 0.25])  # ~0.1 units off

    cfg_r = RansacConfig(inlier_threshold=4.0, sample_num=6, iteration=256)
    cfg_lm = LMConfig(damping=5.0, iterations=100)
    res = estimate_pnp(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K),
        jnp.asarray(mask), cfg_r, cfg_lm,
        prior_R=jnp.asarray(prior_R), prior_C=jnp.asarray(prior_C),
    )
    C_err = np.linalg.norm(np.asarray(res.C) - C_true)
    R_err = ScipyRotation.from_matrix(
        np.asarray(res.R) @ R_true.T
    ).magnitude()
    assert C_err < 0.05, C_err
    assert np.degrees(R_err) < 1.0
    assert int(res.num_inliers) >= 0.9 * n_in
