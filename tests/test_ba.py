"""Bundle adjustment tests: synthetic multi-view scenes with known optimum.

Oracle strategy mirrors the reference's (SURVEY.md section 4): perturb a
perfect scene, BA must pull poses+points back; costs must be monotone
non-increasing; masked cameras/points/observations must stay frozen."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from structure_from_motion_tpu.config import BAConfig
from structure_from_motion_tpu.ops.ba import (
    BAObservations,
    BAState,
    run_bundle_adjustment,
    total_reprojection_cost,
)
from structure_from_motion_tpu.utils.geometry import normalized_camera_coords
from structure_from_motion_tpu.utils.rotations import rotation_to_quat


def make_scene(n_views=4, n_points=60, seed=0, cap_v=8, cap_m=128, cap_o=1024):
    """Perfect synthetic scene in fixed-capacity buffers."""
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    X = rng.uniform([-3, -3, 8], [3, 3, 16], size=(n_points, 3))
    Cs, qs = [], []
    for v in range(n_views):
        R = ScipyRotation.from_rotvec(rng.normal(size=3) * 0.05).as_matrix()
        C = np.array([v * 0.8, 0.0, 0.0]) + rng.normal(size=3) * 0.1
        Cs.append(C)
        qs.append(np.asarray(rotation_to_quat(jnp.asarray(R))))
    Cs, qs = np.stack(Cs), np.stack(qs)

    obs_cam, obs_pt, obs_uv = [], [], []
    for v in range(n_views):
        R = np.asarray(
            jnp.asarray(qs[v]), dtype=np.float64
        )
        from structure_from_motion_tpu.utils.rotations import quat_to_rotation

        Rm = np.asarray(quat_to_rotation(jnp.asarray(qs[v])))
        Xc = (Rm.T @ (X - Cs[v]).T).T
        uvn = Xc[:, :2] / Xc[:, 2:3]
        uv = uvn * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        for m in range(n_points):
            obs_cam.append(v)
            obs_pt.append(m)
            obs_uv.append(uv[m])
    obs_cam = np.array(obs_cam)
    obs_pt = np.array(obs_pt)
    obs_uv = np.array(obs_uv)

    n_obs = len(obs_cam)
    state = BAState(
        C=jnp.asarray(np.vstack([Cs, np.zeros((cap_v - n_views, 3))])),
        q=jnp.asarray(
            np.vstack([qs, np.tile([1.0, 0, 0, 0], (cap_v - n_views, 1))])
        ),
        X=jnp.asarray(np.vstack([X, np.zeros((cap_m - n_points, 3))])),
        cam_valid=jnp.asarray(np.arange(cap_v) < n_views),
        pt_valid=jnp.asarray(np.arange(cap_m) < n_points),
    )
    uv_norm = np.asarray(
        normalized_camera_coords(jnp.asarray(K), jnp.asarray(obs_uv))
    )
    obs = BAObservations(
        cam=jnp.asarray(
            np.concatenate([obs_cam, np.zeros(cap_o - n_obs, dtype=int)])
        ),
        point=jnp.asarray(
            np.concatenate([obs_pt, np.zeros(cap_o - n_obs, dtype=int)])
        ),
        uv_norm=jnp.asarray(
            np.vstack([uv_norm, np.zeros((cap_o - n_obs, 2))])
        ),
        valid=jnp.asarray(np.arange(cap_o) < n_obs),
    )
    return state, obs, K


def perturb(state, seed=1, pose_sigma=0.02, pt_sigma=0.05):
    rng = np.random.default_rng(seed)
    C = np.asarray(state.C) + rng.normal(size=state.C.shape) * pose_sigma
    q = np.asarray(state.q) + rng.normal(size=state.q.shape) * pose_sigma * 0.3
    X = np.asarray(state.X) + rng.normal(size=state.X.shape) * pt_sigma
    return BAState(
        C=jnp.asarray(C),
        q=jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True)),
        X=jnp.asarray(X),
        cam_valid=state.cam_valid,
        pt_valid=state.pt_valid,
    )


def test_ba_restores_perturbed_scene():
    clean, obs, K = make_scene()
    noisy = perturb(clean)
    cost0 = float(total_reprojection_cost(noisy, obs))
    cfg = BAConfig(iterations=15, damping=5.0, fix_first_camera_gauge=True)
    out, costs = jax.jit(
        lambda s, o: run_bundle_adjustment(s, o, cfg)
    )(noisy, obs)
    cost1 = float(total_reprojection_cost(out, obs))
    assert cost1 < 1e-3 * cost0, (cost0, cost1)
    # costs monotone non-increasing (fixed small damping on a clean problem)
    c = np.asarray(costs)
    assert (np.diff(c) <= 1e-9 + c[:-1] * 1e-6).all(), c


def test_ba_masked_entries_frozen():
    clean, obs, K = make_scene()
    noisy = perturb(clean)
    cfg = BAConfig(iterations=3, damping=5.0)
    out, _ = run_bundle_adjustment(noisy, obs, cfg)
    # padded cameras/points must not move
    np.testing.assert_array_equal(
        np.asarray(out.C)[4:], np.asarray(noisy.C)[4:]
    )
    np.testing.assert_array_equal(
        np.asarray(out.X)[60:], np.asarray(noisy.X)[60:]
    )
    # quaternions stay unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.q), axis=1), 1.0, atol=1e-9
    )


def test_ba_gauge_fix_pins_first_camera():
    clean, obs, K = make_scene()
    noisy = perturb(clean)
    cfg = BAConfig(iterations=5, damping=5.0, fix_first_camera_gauge=True)
    out, _ = run_bundle_adjustment(noisy, obs, cfg)
    np.testing.assert_allclose(np.asarray(out.C)[0], np.asarray(noisy.C)[0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.q)[0], np.asarray(noisy.q)[0], atol=1e-12)


def test_ba_huber_downweights_outliers():
    clean, obs, K = make_scene()
    # corrupt 5% of observations grossly
    rng = np.random.default_rng(3)
    uvn = np.array(obs.uv_norm)  # writable copy
    n_obs = int(np.asarray(obs.valid).sum())
    bad = rng.choice(n_obs, n_obs // 20, replace=False)
    uvn[bad] += rng.uniform(0.3, 0.8, size=(len(bad), 2))
    obs_bad = obs._replace(uv_norm=jnp.asarray(uvn))
    noisy = perturb(clean, pose_sigma=0.01, pt_sigma=0.02)

    out_plain, _ = run_bundle_adjustment(
        noisy, obs_bad, BAConfig(iterations=10, damping=5.0, fix_first_camera_gauge=True)
    )
    out_huber, _ = run_bundle_adjustment(
        noisy, obs_bad,
        BAConfig(iterations=10, damping=5.0, huber_delta=0.01, fix_first_camera_gauge=True),
    )

    # compare camera centers against ground truth (valid views 1..3)
    gt = np.asarray(clean.C)[1:4]
    err_plain = np.linalg.norm(np.asarray(out_plain.C)[1:4] - gt)
    err_huber = np.linalg.norm(np.asarray(out_huber.C)[1:4] - gt)
    assert err_huber < err_plain, (err_huber, err_plain)


def test_ba_zero_observations_is_identity():
    clean, obs, K = make_scene()
    obs_none = obs._replace(valid=jnp.zeros_like(obs.valid))
    out, costs = run_bundle_adjustment(
        clean, obs_none, BAConfig(iterations=2, damping=5.0)
    )
    np.testing.assert_allclose(np.asarray(out.C), np.asarray(clean.C), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(clean.X), atol=1e-12)
    assert float(np.asarray(costs).sum()) == 0.0


def test_ba_pcg_fallback_matches_dense():
    """The matrix-free block-Jacobi PCG path (forced via a tiny
    pcg_fallback_cameras) must reach the same optimum as the dense Schur
    solve."""
    clean, obs, K = make_scene()
    noisy = perturb(clean)
    dense_cfg = BAConfig(
        iterations=10, damping=5.0, fix_first_camera_gauge=True
    )
    pcg_cfg = BAConfig(
        iterations=10,
        damping=5.0,
        fix_first_camera_gauge=True,
        pcg_fallback_cameras=1,
        pcg_iterations=128,
    )
    out_d, costs_d = run_bundle_adjustment(noisy, obs, dense_cfg)
    out_p, costs_p = run_bundle_adjustment(noisy, obs, pcg_cfg)
    cost_d = float(total_reprojection_cost(out_d, obs))
    cost_p = float(total_reprojection_cost(out_p, obs))
    cost0 = float(total_reprojection_cost(noisy, obs))
    assert cost_p < 1e-3 * cost0, (cost0, cost_p)
    # both solvers converge to (numerically) the same optimum
    assert abs(cost_p - cost_d) <= 1e-3 * max(cost_d, 1e-12) + 1e-9
    np.testing.assert_allclose(
        np.asarray(out_p.C)[:4], np.asarray(out_d.C)[:4], atol=5e-3
    )


def test_pallas_assemble_matches_xla():
    """The fused Pallas residual/Jacobian/block kernel (interpret mode on
    CPU) must reproduce the XLA assembly blocks."""
    import dataclasses

    import jax.numpy as jnp

    from structure_from_motion_tpu.ops.ba import _assemble

    clean, obs, K = make_scene(n_views=4, n_points=60, cap_v=8, cap_m=128, cap_o=1024)
    noisy = perturb(clean)
    xla_cfg = BAConfig(huber_delta=0.01, assemble_impl="xla")
    pl_cfg = BAConfig(huber_delta=0.01, assemble_impl="pallas")
    out_x = _assemble(noisy, obs, xla_cfg)
    out_p = _assemble(noisy, obs, pl_cfg)
    names = ["U", "D", "W", "b_c", "b_p", "cost"]
    for name, a, b in zip(names, out_x, out_p):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, float(np.abs(a).max()))
        assert np.abs(a - b).max() < 1e-3 * scale, (name, np.abs(a - b).max())

    # and the full solver run agrees end to end
    out1, costs1 = run_bundle_adjustment(noisy, obs, xla_cfg)
    out2, costs2 = run_bundle_adjustment(noisy, obs, pl_cfg)
    np.testing.assert_allclose(
        np.asarray(out1.C), np.asarray(out2.C), atol=1e-3
    )


def test_hybrid_ell_and_cam_ell_match_csr():
    """Hybrid ELL (ell_rows below the max track length + CSR spill tail)
    and the camera-ELL reduction must reproduce the CSR-layout result
    exactly — same observations, different layout, identical math up to
    reduction order."""
    clean, obs, K = make_scene(n_views=6, n_points=60, cap_v=8, cap_m=128, cap_o=1024)
    noisy = perturb(clean)
    base = dict(iterations=8, damping=5.0, fix_first_camera_gauge=True)
    cfg_csr = BAConfig(obs_layout="csr", **base)
    # every point has 6 observations: rows=2 spills 4 per point into the tail
    cfg_hyb = BAConfig(
        obs_layout="ell", ell_rows=2, ell_tail=60 * 4 + 32, cam_rows=64, **base
    )
    out_c, costs_c = run_bundle_adjustment(noisy, obs, cfg_csr)
    out_h, costs_h = run_bundle_adjustment(noisy, obs, cfg_hyb)
    np.testing.assert_allclose(
        np.asarray(costs_h), np.asarray(costs_c), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_h.C), np.asarray(out_c.C), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_h.X), np.asarray(out_c.X), atol=1e-5
    )
    # and under the PCG reduced solve (the whole-trajectory regime)
    pcg = dict(base, pcg_fallback_cameras=1, pcg_iterations=96)
    out_cp, _ = run_bundle_adjustment(noisy, obs, BAConfig(obs_layout="csr", **pcg))
    out_hp, _ = run_bundle_adjustment(
        noisy, obs,
        BAConfig(obs_layout="ell", ell_rows=2, ell_tail=60 * 4 + 32,
                 cam_rows=64, **pcg),
    )
    np.testing.assert_allclose(
        np.asarray(out_hp.C), np.asarray(out_cp.C), atol=1e-4
    )


def test_choose_ell_rows_histogram():
    """The host-side layout chooser: cost-optimal rows from the track
    histogram, exact spill count."""
    from structure_from_motion_tpu.models.global_ba import _choose_ell_rows

    # 1000 points with 6 obs, 3 points with 500 obs: rows must stay near 6
    counts = np.concatenate([np.full(1000, 6), np.full(3, 500)])
    rows, spilled = _choose_ell_rows(counts, m_pad=1024)
    assert rows <= 12, rows
    assert spilled == int(np.maximum(counts - rows, 0).sum())
    # uniform tracks: no reason to spill anything
    rows_u, spilled_u = _choose_ell_rows(np.full(100, 4), m_pad=128)
    assert rows_u == 4 and spilled_u == 0
    # empty problem
    assert _choose_ell_rows(np.zeros(0, int), 128) == (1, 0)
