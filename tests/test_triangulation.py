"""Triangulation tests: DLT vs cv2.triangulatePoints (reference tolerance
1e-10, triangulation_processor.py:462-468) and LM refinement vs scipy
least_squares (reference :470-521)."""

import cv2
import numpy as np
import jax.numpy as jnp
from scipy.optimize import least_squares
from scipy.spatial.transform import Rotation as ScipyRotation

from structure_from_motion_tpu.config import LMConfig
from structure_from_motion_tpu.ops.triangulation import (
    linear_triangulate,
    mean_reprojection_error,
    refine_triangulate,
    triangulate,
)


def two_view_setup(n=50, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320.0], [0, 505.0, 240.0], [0, 0, 1.0]])
    X = rng.uniform([-3, -2, 5], [3, 2, 12], size=(n, 3))
    R2 = ScipyRotation.from_rotvec([0.05, 0.3, 0.01]).as_matrix()
    C2 = np.array([1.5, -0.2, 0.4])
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R2.T, -R2.T @ C2.reshape(3, 1)])

    def proj(P, X):
        xh = (P @ np.vstack([X.T, np.ones((1, len(X)))])).T
        return xh[:, :2] / xh[:, 2:3]

    uv1 = proj(P1, X) + rng.normal(size=(n, 2)) * noise
    uv2 = proj(P2, X) + rng.normal(size=(n, 2)) * noise
    P = np.stack([P1, P2])
    uv = np.stack([uv1, uv2], axis=1)  # (N, 2 views, 2)
    return P, uv, X


def test_linear_dlt_vs_opencv():
    P, uv, X = two_view_setup(50, seed=1, noise=0.3)
    mask = np.ones((50, 2), dtype=bool)
    Xh = np.asarray(
        linear_triangulate(jnp.asarray(P), jnp.asarray(uv), jnp.asarray(mask))
    )
    X_cv_h = cv2.triangulatePoints(P[0], P[1], uv[:, 0].T, uv[:, 1].T)
    X_cv = (X_cv_h[:3] / X_cv_h[3]).T
    np.testing.assert_allclose(Xh[:, :3], X_cv, atol=1e-8)


def test_linear_dlt_masked_views():
    # 3 views; one point observed only by views 0 and 2 — the zeroed rows of
    # the masked view must not perturb the solution
    P, uv, X = two_view_setup(20, seed=2)
    K = P[0][:, :3]
    R3 = ScipyRotation.from_rotvec([-0.1, 0.2, 0.05]).as_matrix()
    C3 = np.array([0.3, 1.0, -0.2])
    P3 = K @ np.hstack([R3.T, -R3.T @ C3.reshape(3, 1)])

    def proj(P, X):
        xh = (P @ np.vstack([X.T, np.ones((1, len(X)))])).T
        return xh[:, :2] / xh[:, 2:3]

    uv3 = proj(P3, X)
    P_all = np.concatenate([P, P3[None]], axis=0)
    garbage = np.full_like(uv[:, 0], 1e5)
    uv_all = np.concatenate([uv[:, :1], garbage[:, None], uv3[:, None]], axis=1)
    mask = np.ones((20, 3), dtype=bool)
    mask[:, 1] = False  # middle view invalid
    Xh = np.asarray(
        linear_triangulate(jnp.asarray(P_all), jnp.asarray(uv_all), jnp.asarray(mask))
    )
    np.testing.assert_allclose(Xh[:, :3], X, atol=1e-6)


def test_refinement_beats_linear_and_matches_scipy():
    P, uv, X_true = two_view_setup(30, seed=3, noise=1.0)
    mask = np.ones((30, 2), dtype=bool)
    Pj, uvj, mj = jnp.asarray(P), jnp.asarray(uv), jnp.asarray(mask)
    X_lin = linear_triangulate(Pj, uvj, mj)
    cfg = LMConfig(damping=5.0, iterations=100)
    X_ref = refine_triangulate(Pj, uvj, mj, X_lin, cfg)

    err_lin = float(mean_reprojection_error(Pj, X_lin, uvj, mj))
    err_ref = float(mean_reprojection_error(Pj, X_ref, uvj, mj))
    assert err_ref <= err_lin + 1e-9

    # scipy trf as ground-truth optimum (reference uses the same oracle)
    def resid_fn(x, uv_i):
        xh = np.append(x, 1.0)
        r = []
        for v in range(2):
            p = P[v] @ xh
            r.extend(p[:2] / p[2] - uv_i[v])
        return np.array(r)

    X_opt = np.stack(
        [
            least_squares(resid_fn, np.asarray(X_lin)[i, :3], args=(uv[i],), method="trf").x
            for i in range(30)
        ]
    )
    err_opt = float(
        mean_reprojection_error(Pj, jnp.asarray(np.hstack([X_opt, np.ones((30, 1))])), uvj, mj)
    )
    # our fixed-damping LM should be within 1e-2 px of the trf optimum
    assert err_ref - err_opt < 1e-2, (err_ref, err_opt)


def test_triangulate_end_to_end_exact():
    P, uv, X_true = two_view_setup(40, seed=4, noise=0.0)
    mask = np.ones((40, 2), dtype=bool)
    Xh = np.asarray(
        triangulate(jnp.asarray(P), jnp.asarray(uv), jnp.asarray(mask), LMConfig(iterations=20))
    )
    np.testing.assert_allclose(Xh[:, :3], X_true, atol=1e-5)


def test_nullspace_gram_matches_svd():
    """The TPU-fast gram/inverse-iteration nullspace must agree with the
    exact SVD null vector on DLT-shaped systems (it is the product path on
    accelerator backends; CPU tests would otherwise never cover it)."""
    from structure_from_motion_tpu.ops.linalg import nullspace, nullspace_gram

    rng = np.random.default_rng(0)
    # rank-3 (..., 4, 4) systems: random rows projected off a ground-truth
    # null direction, mimicking two-view DLT design matrices
    n_true = rng.normal(size=(512, 4))
    n_true /= np.linalg.norm(n_true, axis=1, keepdims=True)
    A = rng.normal(size=(512, 4, 4))
    A -= np.einsum("bkj,bj,bi->bki", A, n_true, n_true)
    ns = np.asarray(nullspace(jnp.asarray(A)))
    ng = np.asarray(nullspace_gram(jnp.asarray(A)))
    dots = np.abs(np.sum(ns * ng, axis=1))
    assert dots.min() > 1 - 1e-9, dots.min()

    # tall 12-column systems (PnP DLT refit shape)
    n12 = rng.normal(size=(64, 12))
    n12 /= np.linalg.norm(n12, axis=1, keepdims=True)
    B = rng.normal(size=(64, 40, 12))
    B -= np.einsum("bkj,bj,bi->bki", B, n12, n12)
    ns = np.asarray(nullspace(jnp.asarray(B)))
    ng = np.asarray(nullspace_gram(jnp.asarray(B)))
    dots = np.abs(np.sum(ns * ng, axis=1))
    assert dots.min() > 1 - 1e-9, dots.min()
