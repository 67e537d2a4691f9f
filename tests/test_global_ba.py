"""Final global bundle adjustment over a sliding-window run.

The reference bundle-adjusts all views every frame (ba_processor.py:274-439);
our sliding window freezes poses at eviction and ``finalize_global`` restores
whole-trajectory consistency once at the end from the eviction archive +
persistent global point ids. These tests cover the identity plumbing
(pt_gid through allocation/compaction/eviction), the archived observation
records, the reassembled problem, and the end-to-end quality effect."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from structure_from_motion_tpu.config import CapacityConfig
from structure_from_motion_tpu.models import IncrementalSfM, tracks
from structure_from_motion_tpu.models.global_ba import build_global_problem
from tests.test_incremental import (
    pipeline_config,  # noqa: F401  (fixture)
    synthetic_sequence,
    umeyama_ate,
)


def _small_state(cap_v=3, cap_k=8, cap_m=16, cap_o=32):
    cap = CapacityConfig(
        max_views=cap_v, max_keypoints=cap_k, max_points=cap_m, max_observations=cap_o
    )
    K = jnp.asarray([[100.0, 0, 50.0], [0, 100.0, 40.0], [0, 0, 1.0]])
    return tracks.init_state(cap, K)


def test_gid_assignment_and_compaction_stability():
    """Global ids are assigned at allocation, survive compaction unchanged,
    and die with their point."""
    st = _small_state()
    X = jnp.arange(12.0).reshape(4, 3)
    st, ids, stored = tracks.allocate_points(st, X, jnp.ones(4, bool))
    assert bool(stored.all())
    gids0 = np.asarray(st.pt_gid)[np.asarray(ids)]
    assert sorted(gids0.tolist()) == [0, 1, 2, 3]
    assert int(st.next_gid) == 4

    # kill point id 1, compact: survivors keep their gid, slots move
    st = st._replace(pt_valid=st.pt_valid.at[ids[1]].set(False))
    st = tracks.compact_state(st)
    live = np.asarray(st.pt_gid)[np.asarray(st.pt_valid)]
    assert sorted(live.tolist()) == [0, 2, 3]
    # a fresh allocation continues the id sequence (no reuse)
    st, ids2, _ = tracks.allocate_points(st, X[:1], jnp.ones(1, bool))
    assert int(np.asarray(st.pt_gid)[int(ids2[0])]) == 4


def test_eviction_record_observations():
    """evict_oldest_view must archive the evicted view's observations
    (gid, pixel uv, point position) before dropping them."""
    st = _small_state()
    st = tracks.set_camera(st, 0, jnp.asarray([1.0, 2, 3]), jnp.asarray([1.0, 0, 0, 0]))
    X = jnp.asarray([[0.0, 0, 10], [1.0, 0, 10], [2.0, 0, 10]])
    st, ids, _ = tracks.allocate_points(st, X, jnp.ones(3, bool))
    # view 0 observes points 0, 2; view 1 observes all three (points with a
    # single remaining observation die at eviction — gid 0/2 survive via v1)
    st = tracks.append_observations(
        st,
        cam=jnp.asarray([0, 0, 1, 1, 1]),
        point=jnp.asarray([ids[0], ids[2], ids[0], ids[1], ids[2]]),
        uv=jnp.asarray([[5.0, 6], [7.0, 8], [1.0, 1], [2.0, 2], [3.0, 3]]),
        mask=jnp.ones(5, bool),
    )
    st2, rec = tracks.evict_oldest_view(st)
    v = np.asarray(rec.valid)
    assert int(v.sum()) == 2
    assert np.allclose(np.asarray(rec.C), [1.0, 2, 3])
    got = {
        int(g): (uv.tolist(), x.tolist())
        for g, uv, x in zip(
            np.asarray(rec.gid)[v], np.asarray(rec.uv)[v], np.asarray(rec.X)[v]
        )
    }
    assert got == {
        0: ([5.0, 6.0], [0.0, 0.0, 10.0]),
        2: ([7.0, 8.0], [2.0, 0.0, 10.0]),
    }
    # intrinsics of the evicted view archived alongside
    assert np.allclose(np.asarray(rec.K), np.asarray(st.K[0]))
    # the live store no longer holds view-0 observations, and gids survive
    assert int(jnp.sum(st2.obs_valid)) == 3
    live_gids = np.asarray(st2.pt_gid)[np.asarray(st2.pt_valid)]
    assert sorted(live_gids.tolist()) == [0, 1, 2]


def _run_slide(pipeline_config, n_frames=12, window=6, noise=0.4, seed=2):
    K, frames, C_gt, R_gt, X_gt = synthetic_sequence(
        n_views=n_frames, n_points=300, seed=seed, noise=noise
    )
    cfg = dataclasses.replace(
        pipeline_config, window_size=window, window_mode="slide"
    )
    engine = IncrementalSfM(cfg, K, frontend="precomputed")
    for f in frames:
        engine.process_features(*f)
    return engine, C_gt


def test_build_global_problem_shapes(pipeline_config):
    engine, _ = _run_slide(pipeline_config)
    n_live = min(engine._frame, engine._window)
    prob = build_global_problem(engine.state, engine._archive, n_live)
    assert prob.n_cams == 12
    assert prob.state.C.shape[0] == 12
    assert prob.n_points > 0 and prob.n_obs > 0
    assert prob.max_track_len >= 2
    # every kept observation references a real point row and a real camera
    v = np.asarray(prob.obs.valid)
    assert np.asarray(prob.obs.point)[v].max() < prob.n_points
    assert np.asarray(prob.obs.cam)[v].max() < prob.n_cams
    # gid table: unique real ids, -1 padding
    g = prob.gids
    assert (g[: prob.n_points] >= 0).all()
    assert (g[prob.n_points :] == -1).all()
    assert np.unique(g[: prob.n_points]).size == prob.n_points
    # archived cameras contribute observations (not just the live window)
    assert (np.asarray(prob.obs.cam)[v] < len(engine._archive)).any()


def test_finalize_global_improves_trajectory(pipeline_config):
    """With pixel noise, the drifted archived poses must improve (or at
    minimum not regress) when the whole trajectory is re-optimized, and the
    refined poses flow back into poses()."""
    engine, C_gt = _run_slide(pipeline_config, noise=0.4)
    locs_before, _ = engine.poses()
    ate_before = umeyama_ate(locs_before, C_gt)

    info = engine.finalize_global(iterations=15)
    assert info["n_cams"] == 12
    costs = info["costs"]
    assert costs[-1] <= costs[0] * 0.95  # the solve actually moved

    locs_after, rots_after = engine.poses()
    assert locs_after.shape == locs_before.shape
    assert not np.allclose(locs_after, locs_before)  # archive was updated
    ate_after = umeyama_ate(locs_after, C_gt)
    assert ate_after <= ate_before * 1.05 + 1e-6, (ate_before, ate_after)
    # rotations stay orthonormal after the quaternion updates
    eye = np.einsum("fij,fkj->fik", rots_after, rots_after)
    assert np.allclose(eye, np.eye(3)[None], atol=1e-5)


def test_finalize_global_sharded_parity(pipeline_config):
    """num_shards=4 must reproduce the single-device global solve (same
    reassembled problem, psum'd reduced system)."""
    engine1, _ = _run_slide(pipeline_config, noise=0.3, seed=5)
    engine2, _ = _run_slide(pipeline_config, noise=0.3, seed=5)
    info1 = engine1.finalize_global(iterations=8, num_shards=1)
    info2 = engine2.finalize_global(iterations=8, num_shards=4)
    assert info1["n_obs"] == info2["n_obs"]
    np.testing.assert_allclose(
        info1["costs"], info2["costs"], rtol=5e-4, atol=1e-7
    )
    l1, _ = engine1.poses()
    l2, _ = engine2.poses()
    np.testing.assert_allclose(l1, l2, rtol=1e-3, atol=5e-4)


def test_tiered_layout_matches_csr():
    """The tiered-ELL solve (obs_layout='tiered', the whole-trajectory
    default) must reproduce the CSR solve on a power-law track histogram —
    the distribution revisit-heavy loops produce (p50~2, a few points seen
    by most cameras) where single-level ELL needed max-track padding plus
    a segment-summed tail."""
    from structure_from_motion_tpu.config import BAConfig
    from structure_from_motion_tpu.models.global_ba import (
        choose_tiers,
        pack_tiered,
    )
    from structure_from_motion_tpu.ops.ba import (
        BAObservations,
        BAState,
        run_bundle_adjustment,
    )

    rng = np.random.default_rng(3)
    V, M = 20, 256
    # power-law track lengths in [2, V]
    counts = np.minimum(
        2 + (rng.pareto(1.0, M) * 3).astype(int), V
    )
    C = rng.normal(size=(V, 3)) * 0.5
    q = rng.normal(size=(V, 4))
    q[:, 0] += 3.0
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    X = rng.normal(size=(M, 3)) + np.array([0, 0, 6.0])

    cams, pts = [], []
    for p in range(M):
        cams.append(rng.choice(V, size=counts[p], replace=False))
        pts.append(np.full(counts[p], p))
    cam = np.concatenate(cams).astype(np.int32)
    pt = np.concatenate(pts).astype(np.int32)
    O = cam.shape[0]
    from structure_from_motion_tpu.ops.reproj import batched_residual_jacobians

    uv, _, _ = batched_residual_jacobians(
        jnp.asarray(C)[cam],
        jnp.asarray(q)[cam],
        jnp.asarray(X)[pt],
        jnp.zeros((O, 2)),
    )
    uv = np.asarray(uv) * -1.0  # residual = proj - uv with uv=0 => proj
    uv += rng.normal(size=uv.shape) * 2e-3

    state = BAState(
        C=jnp.asarray(C),
        q=jnp.asarray(q),
        X=jnp.asarray(X + rng.normal(size=X.shape) * 0.05),
        cam_valid=jnp.ones(V, bool),
        pt_valid=jnp.ones(M, bool),
    )
    obs = BAObservations(
        cam=jnp.asarray(cam),
        point=jnp.asarray(pt),
        uv_norm=jnp.asarray(uv),
        valid=jnp.ones(O, bool),
    )

    # adaptive=False: the accept test flips on ~1e-10 cost noise near
    # the threshold, so layout parity must compare the deterministic
    # always-accept iteration
    base = BAConfig(iterations=6, damping=1.0, adaptive=False)
    out_csr, costs_csr = run_bundle_adjustment(
        state, obs, dataclasses.replace(base, obs_layout="csr")
    )

    order = np.argsort(-counts, kind="stable")
    tiers = choose_tiers(counts[order], round_to=32)
    assert sum(n for n, _ in tiers) == M
    obs_t = pack_tiered(obs, tiers, order)
    # packed stream holds every observation exactly once
    assert int(np.asarray(obs_t.valid).sum()) == O
    st_t = state._replace(
        X=state.X[jnp.asarray(order)], pt_valid=state.pt_valid[jnp.asarray(order)]
    )
    out_t, costs_t = run_bundle_adjustment(
        st_t,
        obs_t,
        dataclasses.replace(base, obs_layout="tiered", tiers=tiers),
    )
    # different (exact-in-f64) reduction orders in the G build pass through
    # the dense solve's conditioning: parity lands ~1e-5 relative
    np.testing.assert_allclose(
        np.asarray(costs_t), np.asarray(costs_csr), rtol=1e-4, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out_t.C), np.asarray(out_csr.C), rtol=2e-3, atol=1e-5
    )
    X_back = np.empty_like(np.asarray(out_t.X))
    X_back[order] = np.asarray(out_t.X)
    np.testing.assert_allclose(
        X_back, np.asarray(out_csr.X), rtol=2e-3, atol=1e-5
    )


def test_tiered_layout_matches_csr_large_v_pcg():
    """Same cross-layout parity through the PCG reduced solve (V above
    pcg_fallback_cameras) with the camera-ELL reduction enabled — the
    configuration the 500-camera whole-trajectory solve runs."""
    from structure_from_motion_tpu.config import BAConfig
    from structure_from_motion_tpu.models.global_ba import (
        choose_tiers,
        pack_tiered,
    )
    from structure_from_motion_tpu.ops.ba import (
        BAObservations,
        BAState,
        run_bundle_adjustment,
    )
    from structure_from_motion_tpu.ops.reproj import batched_residual_jacobians

    rng = np.random.default_rng(7)
    V, M = 40, 128
    counts = np.minimum(2 + (rng.pareto(1.2, M) * 4).astype(int), V)
    C = rng.normal(size=(V, 3)) * 0.5
    q = rng.normal(size=(V, 4))
    q[:, 0] += 3.0
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    X = rng.normal(size=(M, 3)) + np.array([0, 0, 6.0])
    cams, pts = [], []
    for p in range(M):
        cams.append(rng.choice(V, size=counts[p], replace=False))
        pts.append(np.full(counts[p], p))
    cam = np.concatenate(cams).astype(np.int32)
    pt = np.concatenate(pts).astype(np.int32)
    O = cam.shape[0]
    uv, _, _ = batched_residual_jacobians(
        jnp.asarray(C)[cam], jnp.asarray(q)[cam], jnp.asarray(X)[pt],
        jnp.zeros((O, 2)),
    )
    uv = np.asarray(uv) * -1.0 + rng.normal(size=(O, 2)) * 2e-4
    # small perturbation + damping 10: keeps the damped system well
    # conditioned so PCG converges inside its budget — otherwise the
    # unconverged-PCG noise floor is amplified through the always-accept
    # iteration and cross-layout parity is unmeasurable
    state = BAState(
        C=jnp.asarray(C), q=jnp.asarray(q),
        X=jnp.asarray(X + rng.normal(size=X.shape) * 0.005),
        cam_valid=jnp.ones(V, bool), pt_valid=jnp.ones(M, bool),
    )
    obs = BAObservations(
        cam=jnp.asarray(cam), point=jnp.asarray(pt),
        uv_norm=jnp.asarray(uv), valid=jnp.ones(O, bool),
    )
    cam_max = int(np.bincount(cam, minlength=V).max())
    base = BAConfig(
        iterations=3, damping=10.0, adaptive=False,
        pcg_fallback_cameras=16, pcg_iterations=96,
    )
    _, costs_csr = run_bundle_adjustment(
        state, obs, dataclasses.replace(base, obs_layout="csr")
    )
    order = np.argsort(-counts, kind="stable")
    tiers = choose_tiers(counts[order], round_to=16)
    obs_t = pack_tiered(obs, tiers, order)
    st_t = state._replace(
        X=state.X[jnp.asarray(order)], pt_valid=state.pt_valid[jnp.asarray(order)]
    )
    _, costs_t = run_bundle_adjustment(
        st_t,
        obs_t,
        dataclasses.replace(
            base, obs_layout="tiered", tiers=tiers,
            cam_rows=((cam_max + 7) // 8) * 8,
        ),
    )
    np.testing.assert_allclose(
        np.asarray(costs_t), np.asarray(costs_csr), rtol=1e-3, atol=1e-9
    )


def test_pallas_matvec_kernels_match_xla():
    """ops/ba_matvec_pallas: the one-hot MXU expand/reduce kernels must
    reproduce the XLA gather formulations (interpret mode; f32)."""
    from structure_from_motion_tpu.ops.ba_matvec_pallas import (
        pallas_expand_cam,
        pallas_reduce_cam,
    )

    rng = np.random.default_rng(0)
    O, V = 1024, 37
    cam = rng.integers(0, V, O).astype(np.int32)
    W = rng.normal(size=(O, 7, 3)).astype(np.float32)
    x = rng.normal(size=(V, 7)).astype(np.float32)
    y3 = rng.normal(size=(3, O)).astype(np.float32)
    w21 = jnp.asarray(W.reshape(O, 21).T)
    t = pallas_expand_cam(jnp.asarray(cam), w21, jnp.asarray(x), interpret=True)
    t_ref = np.einsum("oic,oi->oc", W, x[cam])
    np.testing.assert_allclose(np.asarray(t).T, t_ref, atol=1e-5)
    coup = pallas_reduce_cam(
        jnp.asarray(cam), w21, jnp.asarray(y3), V, interpret=True
    )
    z = np.einsum("oic,oc->oi", W, y3.T)
    coup_ref = np.zeros((V, 7), np.float32)
    np.add.at(coup_ref, cam, z)
    np.testing.assert_allclose(np.asarray(coup), coup_ref, atol=1e-4)


def test_tiered_pcg_pallas_matvec_matches_xla():
    """Full tiered PCG solve with matvec_impl='pallas' (interpreted) vs
    'xla' — the production TPU configuration of the whole-trajectory
    global BA, checked end-to-end. Geometry is a WELL-POSED camera ring
    (all points in front, bounded Jacobians): random-pose problems put
    points at z ~ 0 where f32 normal equations are near-singular and any
    reduction reordering moves the step by O(1)."""
    from structure_from_motion_tpu.config import BAConfig
    from structure_from_motion_tpu.models.global_ba import (
        choose_tiers,
        pack_tiered,
    )
    from structure_from_motion_tpu.ops.ba import (
        BAObservations,
        BAState,
        run_bundle_adjustment,
    )
    from structure_from_motion_tpu.ops.reproj import batched_residual_jacobians
    from structure_from_motion_tpu.utils.rotations import rotation_to_quat

    rng = np.random.default_rng(11)
    V, M = 24, 96
    counts = np.minimum(2 + (rng.pareto(1.2, M) * 4).astype(int), V)
    th = np.linspace(0, 2 * np.pi, V, endpoint=False)
    C = np.stack([5 * np.cos(th), 5 * np.sin(th), 0.2 * np.sin(3 * th)], 1)
    Rs = []
    for c in C:
        z = -c / np.linalg.norm(c)  # look at the origin
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rs.append(np.stack([x, y, z], axis=1))
    q = np.asarray(rotation_to_quat(jnp.asarray(np.stack(Rs))))
    X = rng.normal(size=(M, 3)) * 1.2
    cams, pts = [], []
    for p in range(M):
        cams.append(rng.choice(V, size=counts[p], replace=False))
        pts.append(np.full(counts[p], p))
    cam = np.concatenate(cams).astype(np.int32)
    pt = np.concatenate(pts).astype(np.int32)
    O = cam.shape[0]
    uv, _, _ = batched_residual_jacobians(
        jnp.asarray(C)[cam], jnp.asarray(q)[cam], jnp.asarray(X)[pt],
        jnp.zeros((O, 2)),
    )
    uv = np.asarray(uv) * -1.0 + rng.normal(size=(O, 2)) * 2e-4
    f32 = jnp.float32
    state = BAState(
        C=jnp.asarray(C, f32), q=jnp.asarray(q, f32),
        X=jnp.asarray(X + rng.normal(size=X.shape) * 0.005, f32),
        cam_valid=jnp.ones(V, bool), pt_valid=jnp.ones(M, bool),
    )
    obs = BAObservations(
        cam=jnp.asarray(cam), point=jnp.asarray(pt),
        uv_norm=jnp.asarray(uv, f32), valid=jnp.ones(O, bool),
    )
    order = np.argsort(-counts, kind="stable")
    tiers = choose_tiers(counts[order], round_to=16)
    obs_t = pack_tiered(obs, tiers, order)
    st_t = state._replace(
        X=state.X[jnp.asarray(order)], pt_valid=state.pt_valid[jnp.asarray(order)]
    )
    base = BAConfig(
        iterations=3, damping=1.0, adaptive=False,
        pcg_fallback_cameras=8, pcg_iterations=64,
        obs_layout="tiered", tiers=tiers,
    )
    _, costs_x = run_bundle_adjustment(
        st_t, obs_t, dataclasses.replace(base, matvec_impl="xla")
    )
    _, costs_p = run_bundle_adjustment(
        st_t, obs_t, dataclasses.replace(base, matvec_impl="pallas")
    )
    np.testing.assert_allclose(
        np.asarray(costs_p), np.asarray(costs_x), rtol=1e-4
    )
