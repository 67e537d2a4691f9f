"""Two-view geometry tests: 8-point vs OpenCV, RANSAC robustness, the
46-point real pair (reference test strategy, SURVEY.md section 4)."""

import os

import cv2
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from structure_from_motion_tpu.config import RansacConfig
from structure_from_motion_tpu.io import load_points_txt
from structure_from_motion_tpu.ops.epipolar import (
    eight_point,
    epipolar_errors,
    essential_from_fundamental,
    find_fundamental,
    hartley_normalization,
    mean_epipolar_constraint,
    point_line_distances,
)
from structure_from_motion_tpu.utils.geometry import to_homogeneous


def synthetic_pair(n=100, seed=0, noise=0.0):
    """Random 3D scene seen by two cameras; returns pixel pairs + truth."""
    rng = np.random.default_rng(seed)
    K = np.array([[520.0, 0, 325.0], [0, 515.0, 250.0], [0, 0, 1.0]])
    X = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))
    R = ScipyRotation.from_rotvec([0.02, 0.25, -0.03]).as_matrix()  # cam2->world
    C = np.array([1.2, 0.1, 0.3])
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R.T, -R.T @ C.reshape(3, 1)])

    def proj(P, X):
        xh = (P @ np.vstack([X.T, np.ones((1, len(X)))])).T
        return xh[:, :2] / xh[:, 2:3]

    uv1 = proj(P1, X) + rng.normal(size=(n, 2)) * noise
    uv2 = proj(P2, X) + rng.normal(size=(n, 2)) * noise
    return K, R, C, X, uv1, uv2


def test_hartley_normalization_properties():
    _, _, _, _, uv1, _ = synthetic_pair(64, seed=1)
    mask = np.ones(64, dtype=bool)
    T, pts_h = hartley_normalization(jnp.asarray(uv1), jnp.asarray(mask))
    pts = np.asarray(pts_h)
    np.testing.assert_allclose(pts[:, :2].mean(axis=0), 0.0, atol=1e-9)
    mean_dist = np.linalg.norm(pts[:, :2], axis=1).mean()
    np.testing.assert_allclose(mean_dist, np.sqrt(2.0), atol=1e-9)
    # masked points must not influence the transform
    uv_bad = np.vstack([uv1, [[1e6, -1e6]] * 8])
    mask2 = np.concatenate([mask, np.zeros(8, dtype=bool)])
    T2, _ = hartley_normalization(jnp.asarray(uv_bad), jnp.asarray(mask2))
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-9)


def test_eight_point_vs_opencv():
    """Mirror of the reference synthetic test (epipolar_processor.py:269-343):
    epipolar-constraint sums of ours and OpenCV FM_8POINT both ~ 0."""
    _, _, _, _, uv1, uv2 = synthetic_pair(8, seed=2)
    # normalise first, as the pipeline does
    mask = jnp.ones(8, dtype=bool)
    T1, h1 = hartley_normalization(jnp.asarray(uv1), mask)
    T2, h2 = hartley_normalization(jnp.asarray(uv2), mask)
    Fn = eight_point(h1, h2)
    F = np.asarray(T2).T @ np.asarray(Fn) @ np.asarray(T1)
    F /= F[2, 2]

    F_cv, _ = cv2.findFundamentalMat(uv1, uv2, cv2.FM_8POINT)
    x1 = np.hstack([uv1, np.ones((8, 1))])
    x2 = np.hstack([uv2, np.ones((8, 1))])
    ours = np.abs(np.sum(x2 * (x1 @ F.T), axis=1)).sum()
    theirs = np.abs(np.sum(x2 * (x1 @ F_cv.T), axis=1)).sum()
    assert ours < 1e-2, ours
    assert abs(ours - theirs) < 1e-2


def test_ransac_fundamental_with_outliers():
    K, R, C, X, uv1, uv2 = synthetic_pair(200, seed=3, noise=0.2)
    rng = np.random.default_rng(4)
    n_out = 60
    uv2_corrupt = uv2.copy()
    out_idx = rng.choice(200, n_out, replace=False)
    uv2_corrupt[out_idx] += rng.uniform(30, 120, size=(n_out, 2))
    # pad to fixed capacity with garbage + mask, as the pipeline will
    cap = 256
    pad = cap - 200
    uv1_p = np.vstack([uv1, np.zeros((pad, 2))])
    uv2_p = np.vstack([uv2_corrupt, np.zeros((pad, 2))])
    mask = np.concatenate([np.ones(200, dtype=bool), np.zeros(pad, dtype=bool)])

    cfg = RansacConfig(inlier_threshold=2.0, iteration=300, sample_num=8)
    res = jax.jit(
        lambda k, a, b, m: find_fundamental(k, a, b, m, cfg)
    )(jax.random.key(0), jnp.asarray(uv1_p), jnp.asarray(uv2_p), jnp.asarray(mask))

    inliers = np.asarray(res.inliers)
    # no padded point may be an inlier; most true inliers recovered,
    # most outliers rejected
    assert not inliers[200:].any()
    true_inlier = np.ones(200, dtype=bool)
    true_inlier[out_idx] = False
    recovered = inliers[:200]
    assert (recovered & true_inlier).sum() > 0.8 * true_inlier.sum()
    assert (recovered & ~true_inlier).sum() < 0.1 * n_out
    # quality: mean constraint on true inliers in pixel space
    m = jnp.asarray(np.concatenate([true_inlier, np.zeros(pad, dtype=bool)]))
    err = float(
        mean_epipolar_constraint(res.F, jnp.asarray(uv1_p), jnp.asarray(uv2_p), m)
    )
    assert err < 1.0, err


def test_exact_eight_points_bypass():
    _, _, _, _, uv1, uv2 = synthetic_pair(8, seed=5)
    cap = 32
    pad = cap - 8
    uv1_p = np.vstack([uv1, np.zeros((pad, 2))])
    uv2_p = np.vstack([uv2, np.zeros((pad, 2))])
    mask = np.concatenate([np.ones(8, dtype=bool), np.zeros(pad, dtype=bool)])
    cfg = RansacConfig(inlier_threshold=2.0, iteration=50, sample_num=8)
    res = find_fundamental(
        jax.random.key(1), jnp.asarray(uv1_p), jnp.asarray(uv2_p), jnp.asarray(mask), cfg
    )
    assert int(res.num_inliers) == 8
    errs = epipolar_errors(res.F, to_homogeneous(jnp.asarray(uv1)), to_homogeneous(jnp.asarray(uv2)))
    assert float(np.abs(np.asarray(errs)).sum()) < 1e-2


def test_real_pair_mean_constraint(reference_dataset_path):
    """Reference integration test (epipolar_processor.py:345-447): mean
    |x'^T F x| < 1 on the 46 hand-labeled correspondences."""
    d = os.path.join(reference_dataset_path, "epipolar_set")
    p1 = load_points_txt(os.path.join(d, "pt_2D_1.txt"))[:, :2]
    p2 = load_points_txt(os.path.join(d, "pt_2D_2.txt"))[:, :2]
    n = len(p1)
    mask = np.ones(n, dtype=bool)
    cfg = RansacConfig(inlier_threshold=2.0, iteration=300, sample_num=8)
    res = find_fundamental(
        jax.random.key(7), jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(mask), cfg
    )
    err = float(mean_epipolar_constraint(res.F, jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(mask)))
    assert err < 1.0, err
    # geometric sanity too: median point-to-line distance small
    d_pix = np.asarray(point_line_distances(res.F, jnp.asarray(p1), jnp.asarray(p2)))
    assert np.median(d_pix) < 2.0


def test_essential_from_fundamental_synthetic():
    K, R, C, X, uv1, uv2 = synthetic_pair(100, seed=6)
    F_cv, _ = cv2.findFundamentalMat(uv1, uv2, cv2.FM_8POINT)
    E = np.asarray(
        essential_from_fundamental(jnp.asarray(F_cv), jnp.asarray(K), jnp.asarray(K))
    )
    # ground-truth essential: E ~ [t]x R_wc  (world->cam of view 2 rel view 1)
    R_wc = R.T
    t = -R_wc @ C
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_true = tx @ R_wc
    E_true /= E_true[2, 2]
    np.testing.assert_allclose(E, E_true, rtol=1e-4, atol=1e-5)
    # rank 2 with two equal singular values
    s = np.linalg.svd(E, compute_uv=False)
    np.testing.assert_allclose(s[0], s[1], rtol=1e-9)
    assert s[2] < 1e-12
