"""Homogeneous/projection primitive tests."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from structure_from_motion_tpu.utils import (
    camera_extrinsic,
    camera_projection,
    compose_K,
    from_homogeneous,
    project_points,
    to_homogeneous,
    transform_world_to_camera,
)
from structure_from_motion_tpu.utils.geometry import (
    normalized_camera_coords,
    project_with_depth,
)


def make_camera(seed=0):
    rng = np.random.default_rng(seed)
    R = ScipyRotation.random(random_state=rng).as_matrix()
    C = rng.normal(size=(3,))
    K = np.array([[600.0, 0, 320.0], [0, 610.0, 240.0], [0, 0, 1.0]])
    return K, R, C


def test_homogeneous_roundtrip():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(7, 5, 2))
    h = to_homogeneous(jnp.asarray(pts))
    assert h.shape == (7, 5, 3)
    np.testing.assert_allclose(np.asarray(from_homogeneous(h)), pts, atol=1e-12)
    # scaling homogeneous coords is a no-op after dividing out
    np.testing.assert_allclose(np.asarray(from_homogeneous(h * 2.5)), pts, atol=1e-12)


def test_projection_matches_manual():
    K, R, C = make_camera()
    rng = np.random.default_rng(2)
    # points well in front of the camera
    X = C + (R @ np.array([0, 0, 5.0])) + rng.normal(size=(50, 3)) * 0.5
    P = camera_projection(jnp.asarray(K), jnp.asarray(R), jnp.asarray(C))
    got = np.asarray(project_points(P, jnp.asarray(X)))
    # manual column-major reference computation
    P_np = K @ np.hstack([R.T, -R.T @ C.reshape(3, 1)])
    xh = P_np @ np.vstack([X.T, np.ones((1, 50))])
    want = (xh[:2] / xh[2]).T
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_extrinsic_and_depth_sign():
    K, R, C = make_camera(seed=3)
    X_front = (C + R @ np.array([0, 0, 3.0]))[None, :]
    X_back = (C - R @ np.array([0, 0, 3.0]))[None, :]
    Xc_f = np.asarray(transform_world_to_camera(jnp.asarray(X_front), jnp.asarray(R), jnp.asarray(C)))
    Xc_b = np.asarray(transform_world_to_camera(jnp.asarray(X_back), jnp.asarray(R), jnp.asarray(C)))
    assert Xc_f[0, 2] > 0 and Xc_b[0, 2] < 0
    P = camera_projection(jnp.asarray(K), jnp.asarray(R), jnp.asarray(C))
    _, depth = project_with_depth(P, jnp.asarray(np.vstack([X_front, X_back])))
    assert depth[0] > 0 and depth[1] < 0
    E = np.asarray(camera_extrinsic(jnp.asarray(R), jnp.asarray(C)))
    np.testing.assert_allclose(E, np.hstack([R.T, -R.T @ C.reshape(3, 1)]), atol=1e-12)


def test_normalized_camera_coords():
    K = compose_K(568.996140852, 568.988362396, 643.21055941, 477.982801038)
    rng = np.random.default_rng(4)
    uv = rng.uniform(0, 1280, size=(30, 2))
    got = np.asarray(normalized_camera_coords(K, jnp.asarray(uv)))
    Kinv = np.linalg.inv(np.asarray(K))
    want = (Kinv @ np.vstack([uv.T, np.ones((1, 30))]))[:2].T
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_polar_rotation_3x3_matches_svd():
    """polar_rotation_3x3 (the TPU PnP path: Newton polar + analytic
    s_max, no batched-SVD custom call) must reproduce the SVD polar factor
    U V^T and the largest singular value on PnP-shaped inputs."""
    import numpy as np
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from structure_from_motion_tpu.ops.linalg import polar_rotation_3x3

    rng = np.random.default_rng(3)
    B = 256
    Rm = Rotation.random(B, rng).as_matrix()
    s = rng.uniform(0.05, 20.0, (B, 1, 1))
    A = s * Rm + rng.normal(size=(B, 3, 3)) * 0.02 * s
    A = jnp.asarray(A)

    u, sv, vh = jnp.linalg.svd(A)
    R_ref = np.asarray(u @ vh)
    R_got, s_got = polar_rotation_3x3(A)
    R_got, s_got = np.asarray(R_got), np.asarray(s_got)
    np.testing.assert_allclose(R_got, R_ref, atol=5e-6)
    np.testing.assert_allclose(s_got, np.asarray(sv)[:, 0], rtol=1e-6)
    # orthogonality + sign convention
    eye = np.einsum("bij,bkj->bik", R_got, R_got)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (B, 3, 3)), atol=5e-6)
    assert (np.sign(np.linalg.det(R_got)) == np.sign(np.linalg.det(np.asarray(A)))).all()
