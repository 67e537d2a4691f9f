"""Rotation/quaternion kit tests (property tests mirroring the reference's
``utils.py:101-105`` invariants, plus SciPy as an oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from structure_from_motion_tpu.utils import (
    quat_normalize,
    quat_to_rotation,
    rotation_is_valid,
    rotation_to_quat,
    so3_exp,
)
from structure_from_motion_tpu.utils.rotations import drotation_dquat, quat_multiply


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    return ScipyRotation.random(n, random_state=rng)


def test_quat_to_rotation_matches_scipy():
    rots = random_rotations(64)
    # scipy stores (x, y, z, w); ours is (w, x, y, z)
    q_xyzw = rots.as_quat()
    q = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, :3]], axis=1)
    R_ours = np.asarray(quat_to_rotation(jnp.asarray(q)))
    np.testing.assert_allclose(R_ours, rots.as_matrix(), atol=1e-12)


def test_rotation_to_quat_roundtrip():
    rots = random_rotations(128, seed=1)
    R = jnp.asarray(rots.as_matrix())
    q = rotation_to_quat(R)
    R2 = quat_to_rotation(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-10)
    # unit norm and canonical sign
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-12)
    assert np.all(np.asarray(q)[:, 0] >= 0)


def test_rotation_to_quat_near_degenerate():
    # 180-degree rotations hit the qw ~ 0 branch the reference special-cases
    # (utils.py:43-51); the branch-free construction must stay stable.
    axes = np.eye(3)
    for axis in axes:
        R = ScipyRotation.from_rotvec(np.pi * axis).as_matrix()
        q = rotation_to_quat(jnp.asarray(R))
        R2 = quat_to_rotation(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-10)


def test_rotation_is_valid():
    rots = random_rotations(8, seed=2)
    R = jnp.asarray(rots.as_matrix())
    assert np.all(np.asarray(rotation_is_valid(R)))
    bad = R.at[:, 0, 0].add(0.1)
    assert not np.any(np.asarray(rotation_is_valid(bad)))


def test_so3_exp_matches_scipy():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(32, 3))
    R_ours = np.asarray(so3_exp(jnp.asarray(w)))
    R_ref = ScipyRotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R_ours, R_ref, atol=1e-10)
    # tiny angles
    w_small = rng.normal(size=(8, 3)) * 1e-9
    R_small = np.asarray(so3_exp(jnp.asarray(w_small)))
    np.testing.assert_allclose(R_small, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-7)


def test_quat_multiply_matches_scipy():
    ra, rb = random_rotations(16, seed=4), random_rotations(16, seed=5)

    def to_wxyz(r):
        q = r.as_quat()
        return np.concatenate([q[:, 3:4], q[:, :3]], axis=1)

    got = quat_to_rotation(quat_multiply(jnp.asarray(to_wxyz(ra)), jnp.asarray(to_wxyz(rb))))
    want = (ra * rb).as_matrix()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_drotation_dquat_matches_autodiff():
    rng = np.random.default_rng(6)
    q = rng.normal(size=(4,))

    def vecR(qv):
        # raw (unnormalised) quadratic form, the function the analytic
        # Jacobian differentiates
        w, x, y, z = qv
        return jnp.array(
            [
                w * w + x * x - y * y - z * z,
                2 * (x * y - w * z),
                2 * (x * z + w * y),
                2 * (x * y + w * z),
                w * w - x * x + y * y - z * z,
                2 * (y * z - w * x),
                2 * (x * z - w * y),
                2 * (y * z + w * x),
                w * w - x * x - y * y + z * z,
            ]
        )

    J_auto = jax.jacfwd(vecR)(jnp.asarray(q))
    J_analytic = drotation_dquat(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(J_analytic), np.asarray(J_auto), atol=1e-12)


def test_batched_and_jitted():
    rots = random_rotations(10, seed=7)
    R = jnp.asarray(rots.as_matrix()).reshape(2, 5, 3, 3)
    q = jax.jit(rotation_to_quat)(R)
    assert q.shape == (2, 5, 4)
    R2 = jax.jit(quat_to_rotation)(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(quat_normalize(q * 3.7)), np.asarray(q), atol=1e-12
    )
