"""End-to-end incremental SfM on a synthetic sequence with perfect
correspondences: the recovered trajectory must match ground truth up to the
global similarity gauge (scale fixed by the unit bootstrap baseline)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from structure_from_motion_tpu.config import (
    BAConfig,
    CapacityConfig,
    FrontendConfig,
    LMConfig,
    MatcherConfig,
    PipelineConfig,
    RansacConfig,
)
from structure_from_motion_tpu.models import IncrementalSfM


def umeyama_ate(est, gt):
    mu_s, mu_d = est.mean(0), gt.mean(0)
    sc, dc = est - mu_s, gt - mu_d
    cov = dc.T @ sc / len(est)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    var = (sc**2).sum() / len(est)
    s = np.trace(np.diag(S) @ D) / var
    aligned = (s * (R @ est.T)).T + (mu_d - s * R @ mu_s)
    return float(np.sqrt(((aligned - gt) ** 2).sum(1).mean()))


def synthetic_sequence(n_views=5, n_points=300, kp_cap=512, seed=0, noise=0.0):
    """Views on an arc looking at a point cloud; every point visible in
    every view; descriptors are unique random codes shared across views."""
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    X = rng.uniform([-4, -3, 10], [4, 3, 20], size=(n_points, 3))
    desc_codes = rng.normal(size=(n_points, 128)).astype(np.float32) * 10

    frames = []
    C_gt, R_gt = [], []
    for v in range(n_views):
        C = np.array([v * 1.0, 0.05 * v**2, 0.3 * v])
        R = ScipyRotation.from_rotvec([0.0, -0.06 * v, 0.0]).as_matrix()
        C_gt.append(C)
        R_gt.append(R)
        Xc = (R.T @ (X - C).T).T
        uvn = Xc[:, :2] / Xc[:, 2:3]
        uv = uvn * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        uv = uv + rng.normal(size=uv.shape) * noise
        # fill fixed-capacity buffers (shuffled order per view)
        perm = rng.permutation(n_points)
        xy = np.zeros((kp_cap, 2), np.float32)
        d = np.zeros((kp_cap, 128), np.float32)
        valid = np.zeros(kp_cap, bool)
        xy[:n_points] = uv[perm]
        d[:n_points] = desc_codes[perm]
        valid[:n_points] = True
        frames.append((xy, d, valid))
    return K, frames, np.stack(C_gt), np.stack(R_gt), X


@pytest.fixture(scope="module")
def pipeline_config():
    return PipelineConfig(
        frontend=FrontendConfig(max_keypoints=512, upsample_first_octave=False),
        matcher=MatcherConfig(ratio=0.9),
        fundamental_ransac=RansacConfig(inlier_threshold=2.0, iteration=256),
        pnp_ransac=RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=512),
        pnp_lm=LMConfig(damping=5.0, iterations=100),
        triangulation_lm=LMConfig(damping=5.0, iterations=50),
        ba=BAConfig(iterations=5, damping=5.0),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=512, max_points=4096, max_observations=16384
        ),
    )


def test_incremental_recovers_trajectory(pipeline_config):
    K, frames, C_gt, R_gt, X_gt = synthetic_sequence()
    engine = IncrementalSfM(pipeline_config, K, frontend="precomputed")
    for xy, d, valid in frames:
        info = engine.process_features(xy, d, valid)
    locs, rots = engine.poses()
    assert len(locs) == 5
    ate = umeyama_ate(locs, C_gt)
    # noise-free: trajectory essentially exact (f32 end-to-end; the
    # ~4-unit trajectory recovers to a few mm)
    assert ate < 0.03, (ate, locs, C_gt)
    # rotations: after gauge alignment each R should match ground truth
    for v in range(5):
        dR = ScipyRotation.from_matrix(rots[v] @ R_gt[v].T).magnitude()
        dR0 = ScipyRotation.from_matrix(rots[0] @ R_gt[0].T).magnitude()
        assert np.degrees(dR - dR0) < 1.0
    # map points: most of the cloud reconstructed, scaled by the gauge
    assert len(engine.map_points()) > 250
    assert info["reprojection_px"] < 0.5


def test_incremental_with_pixel_noise(pipeline_config):
    K, frames, C_gt, R_gt, X_gt = synthetic_sequence(seed=1, noise=0.5)
    engine = IncrementalSfM(pipeline_config, K, frontend="precomputed")
    for xy, d, valid in frames:
        info = engine.process_features(xy, d, valid)
    locs, _ = engine.poses()
    ate = umeyama_ate(locs, C_gt)
    assert ate < 0.05, ate  # 0.5 px noise, ~1-unit baselines
    assert info["reprojection_px"] < 2.0


def test_fundamental_gate_shrinks_matches(pipeline_config):
    """Mirror of the reference property test: the F-gated tracker keeps no
    more matches than the ungated one (key_tracker.py:411-423), with some
    planted outlier correspondences actually removed."""
    import dataclasses

    import numpy as np

    K, frames, *_ = synthetic_sequence(n_views=2, n_points=200, seed=3, noise=0.2)
    # corrupt 30 of view 1's keypoint positions so they violate epipolar
    # geometry while keeping identical descriptors (forced wrong matches)
    xy1, d1, v1 = frames[1]
    rng = np.random.default_rng(0)
    bad = rng.choice(200, size=30, replace=False)
    xy1 = xy1.copy()
    xy1[bad] += rng.uniform(40, 120, size=(30, 2)).astype(np.float32)
    frames[1] = (xy1, d1, v1)

    def run(gated: bool):
        cfg = dataclasses.replace(
            pipeline_config,
            matcher=dataclasses.replace(
                pipeline_config.matcher, use_fundamental_gate=gated
            ),
        )
        engine = IncrementalSfM(cfg, K, frontend="precomputed")
        for f in frames:
            info = engine.process_features(*f)
        return int(info["matches"]), engine

    n_plain, _ = run(False)
    n_gated, engine = run(True)
    assert n_gated <= n_plain
    assert n_gated <= n_plain - 20  # most planted outliers removed
    assert n_gated > 100  # but the true matches survive


def test_window_cap_stops_processing(pipeline_config):
    import dataclasses

    K, frames, *_ = synthetic_sequence(n_views=5)
    engine = IncrementalSfM(
        dataclasses.replace(pipeline_config, window_size=3), K, frontend="precomputed"
    )
    infos = [engine.process_features(*f) for f in frames]
    assert infos[3].get("skipped") and infos[4].get("skipped")
    locs, _ = engine.poses()
    assert len(locs) == 3


def test_state_invariants_after_run(pipeline_config):
    """validate_state (the sanitizer analogue of the reference's hard-exit
    invariant checks, ba_processor.py:170-174,233-237) reports a healthy
    reconstruction after a full synthetic run."""
    from structure_from_motion_tpu.utils.debug import validate_state

    K, frames, *_ = synthetic_sequence(n_views=4)
    engine = IncrementalSfM(pipeline_config, K, frontend="precomputed")
    for f in frames:
        engine.process_features(*f)
    assert validate_state(engine.state) == []


def test_collect_metrics_off_returns_device_arrays(pipeline_config):
    import jax

    K, frames, *_ = synthetic_sequence(n_views=3)
    engine = IncrementalSfM(
        pipeline_config, K, frontend="precomputed", collect_metrics=False
    )
    for f in frames:
        info = engine.process_features(*f)
    # no sync happened; stage stats remain (unsynced) jax arrays
    assert isinstance(info["matches"], jax.Array)
    assert isinstance(info["reprojection_px"], jax.Array)
    assert engine.reprojection_error() < 1.0


def test_sliding_window_long_sequence(pipeline_config):
    """Long-sequence mode (BASELINE.json config 4): a 12-frame sequence
    through a 6-view sliding window. Evicted poses are archived; the full
    trajectory must stay accurate and the device state healthy (bounded
    capacities, invariants intact) after repeated evictions."""
    import dataclasses

    from structure_from_motion_tpu.utils.debug import validate_state

    n_frames = 12
    K, frames, C_gt, R_gt, X_gt = synthetic_sequence(
        n_views=n_frames, n_points=300, seed=2
    )
    cfg = dataclasses.replace(
        pipeline_config, window_size=6, window_mode="slide"
    )
    engine = IncrementalSfM(cfg, K, frontend="precomputed")
    for f in frames:
        info = engine.process_features(*f)
    assert not info.get("skipped")
    locs, rots = engine.poses()
    assert len(locs) == n_frames
    ate = umeyama_ate(locs, C_gt)
    assert ate < 0.1, (ate, locs, C_gt)
    assert validate_state(engine.state) == []
    # the map stayed within capacity (evictions compact it)
    assert int(engine.state.num_points) <= cfg.capacity.max_points
    assert int(engine.state.num_obs) <= cfg.capacity.max_observations


def test_ba_bucketing_matches_full_capacity(pipeline_config):
    """Capacity-adaptive BA bucketing (config.ba_bucketing): running the
    per-frame BA on the fitted power-of-2 prefix bucket must reproduce the
    full-capacity trajectory up to float reduction order (BA is draw-free,
    so the comparison is tight). The live counts here (~hundreds of obs in
    a 16384-slot store) force the smallest bucket, so the switch path is
    genuinely exercised. localize_bucketing is held OFF in both runs
    because it changes the RANSAC draw stream (different array sizes) —
    its quality gate is the separate test below."""
    import dataclasses

    K, frames, *_ = synthetic_sequence(n_views=5, n_points=300)

    def run(ba_bucketing):
        cfg = dataclasses.replace(
            pipeline_config,
            ba_bucketing=ba_bucketing,
            localize_bucketing=False,
        )
        e = IncrementalSfM(cfg, K, frontend="precomputed", seed=0)
        for f in frames:
            e.process_features(*f)
        locs, rots = e.poses()
        return np.asarray(locs), np.asarray(rots), np.asarray(e.map_points())

    locs_b, rots_b, pts_b = run(True)
    locs_f, rots_f, pts_f = run(False)
    np.testing.assert_allclose(locs_b, locs_f, atol=1e-5)
    np.testing.assert_allclose(rots_b, rots_f, atol=1e-5)
    assert pts_b.shape == pts_f.shape
    np.testing.assert_allclose(pts_b, pts_f, atol=1e-4)


def test_localize_bucketing_trajectory_quality(pipeline_config):
    """Localize-stage bucketing (config.localize_bucketing) packs the PnP
    and triangulation candidate sets into fitted buckets. The RANSAC draw
    stream changes with the array size (equivalent to a different seed),
    so the gate is trajectory QUALITY, not bitwise parity: the bucketed
    run must recover ground truth as tightly as the full-capacity run."""
    import dataclasses

    K, frames, C_gt, *_ = synthetic_sequence(n_views=5, n_points=300)

    def run(localize_bucketing):
        cfg = dataclasses.replace(
            pipeline_config, localize_bucketing=localize_bucketing
        )
        e = IncrementalSfM(cfg, K, frontend="precomputed", seed=0)
        infos = [e.process_features(*f) for f in frames]
        locs, _ = e.poses()
        return umeyama_ate(np.asarray(locs), C_gt), infos

    ate_b, infos_b = run(True)
    ate_f, _ = run(False)
    # noise-free sequence: both must be essentially exact
    assert ate_b < 0.03, ate_b
    assert ate_f < 0.03, ate_f
    # the packed PnP still finds the full consensus set
    for info in infos_b[2:]:
        assert info["pnp_inliers"] > 200, infos_b
