"""Lens distortion (ops/distortion.py): cv2 oracle parity + end-to-end.

The reference has no distortion handling (its datasets are pre-undistorted,
``ba_processor.py:457-459``); this is a greenfield completeness component.
Oracles: cv2.undistortPoints / cv2.projectPoints' distortion model.
"""

import numpy as np
import pytest

from structure_from_motion_tpu.ops.distortion import (
    distort_normalized,
    distort_pixels,
    pad_coeffs,
    undistort_normalized,
    undistort_pixels,
)

K = np.array(
    [[568.996, 0.0, 643.211], [0.0, 568.988, 477.983], [0.0, 0.0, 1.0]]
)
# photographic-magnitude coefficients (mild barrel + slight tangential)
COEFFS = (-0.28, 0.07, 1.9e-3, -1.1e-3, 0.0)


def _grid_pixels(n=25):
    u = np.linspace(60.0, 1220.0, n)
    v = np.linspace(60.0, 900.0, n)
    uu, vv = np.meshgrid(u, v)
    return np.stack([uu.ravel(), vv.ravel()], axis=-1)


def test_pad_coeffs():
    assert pad_coeffs((0.1,)) == (0.1, 0.0, 0.0, 0.0, 0.0)
    assert pad_coeffs([]) == (0.0,) * 5
    with pytest.raises(ValueError):
        pad_coeffs((1, 2, 3, 4, 5, 6))


def test_forward_model_matches_cv2_projectPoints():
    cv2 = pytest.importorskip("cv2")
    xy = _grid_pixels()
    xyn = np.stack(
        [(xy[:, 0] - K[0, 2]) / K[0, 0], (xy[:, 1] - K[1, 2]) / K[1, 1]], axis=-1
    )
    # cv2.projectPoints applies the same Brown-Conrady model to the
    # normalized coordinates of unit-depth 3D points
    obj = np.concatenate([xyn, np.ones((len(xyn), 1))], axis=-1)
    proj, _ = cv2.projectPoints(
        obj, np.zeros(3), np.zeros(3), K, np.asarray(COEFFS)
    )
    ours = distort_pixels(xy, K, COEFFS)
    np.testing.assert_allclose(np.asarray(ours), proj[:, 0, :], atol=1e-3)


def test_undistort_matches_cv2_undistortPoints():
    """Oracle = cv2.undistortPointsIter with tight termination criteria.

    cv2.undistortPoints' DEFAULT (5 fixed-point iterations) is itself
    unconverged at these magnitudes — forward-distorting its corner answers
    misses the input by ~15 px — so the converged-criteria variant is the
    honest oracle. Our Newton inversion must match it everywhere."""
    cv2 = pytest.importorskip("cv2")
    xy_dist = _grid_pixels()
    oracle = cv2.undistortPoints(
        xy_dist.reshape(-1, 1, 2),
        K,
        np.asarray(COEFFS),
        P=K,
        criteria=(cv2.TERM_CRITERIA_COUNT + cv2.TERM_CRITERIA_EPS, 200, 1e-12),
    )[:, 0, :]
    ours = undistort_pixels(xy_dist, K, COEFFS)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=5e-3)


def test_undistort_forward_consistency_strong_coeffs():
    """Ground-truth check independent of any oracle: distort(undistort(x))
    must reproduce x across the whole frame, including corners where the
    classic fixed-point scheme diverges."""
    xy_dist = _grid_pixels()
    back = distort_pixels(undistort_pixels(xy_dist, K, COEFFS), K, COEFFS)
    np.testing.assert_allclose(np.asarray(back), xy_dist, atol=2e-3)


def test_roundtrip_distort_undistort():
    rng = np.random.default_rng(0)
    xyn = rng.uniform(-0.8, 0.8, size=(512, 2))
    xyd = distort_normalized(xyn, COEFFS)
    back = undistort_normalized(xyd, COEFFS)
    np.testing.assert_allclose(np.asarray(back), xyn, atol=1e-6)


def test_zero_coeffs_is_identity():
    xy = _grid_pixels(7)
    np.testing.assert_allclose(
        np.asarray(undistort_pixels(xy, K, (0.0, 0.0))), xy, atol=1e-9
    )


def test_config_roundtrip_preserves_tuple():
    from structure_from_motion_tpu.config import PipelineConfig

    cfg = PipelineConfig(distortion=(-0.2, 0.05))
    cfg2 = PipelineConfig.from_json(cfg.to_json())
    assert cfg2.distortion == (-0.2, 0.05)
    assert isinstance(cfg2.distortion, tuple)
    hash(cfg2)  # must stay usable as a static jit argument


def test_pipeline_recovers_trajectory_from_distorted_features(
    reference_dataset_path, tmp_path
):
    """End-to-end: distort the cv2-SIFT upenn keypoints with known
    coefficients, run the pipeline with config.distortion set, and require
    the same trajectory as the undistorted baseline run. This proves the
    ingest-boundary undistortion composes with the full geometry stack."""
    import os
    import pickle

    cv2 = pytest.importorskip("cv2")
    from structure_from_motion_tpu.config import (
        CapacityConfig,
        FrontendConfig,
        MatcherConfig,
        PipelineConfig,
        RansacConfig,
    )
    from structure_from_motion_tpu.io import load_image_grayscale, upenn_intrinsics
    from structure_from_motion_tpu.models import IncrementalSfM
    from structure_from_motion_tpu.utils.metrics import absolute_trajectory_error

    max_kp = 1024
    d = os.path.join(reference_dataset_path, "upenn")
    sift = cv2.SIFT_create(nfeatures=max_kp)
    frames = []
    for i in range(1, 7):
        img = load_image_grayscale(os.path.join(d, f"image{i:07d}.bmp"))
        kps, desc = sift.detectAndCompute(img.astype(np.uint8), None)
        n = min(len(kps), max_kp)
        xy = np.zeros((max_kp, 2), np.float32)
        dd = np.zeros((max_kp, 128), np.float32)
        valid = np.zeros(max_kp, bool)
        xy[:n] = [k.pt for k in kps[:n]]
        dd[:n] = desc[:n]
        valid[:n] = True
        frames.append((xy, dd, valid))

    Kp = upenn_intrinsics()
    base = PipelineConfig(
        frontend=FrontendConfig(max_keypoints=max_kp, upsample_first_octave=False),
        matcher=MatcherConfig(
            ratio=0.75,
            use_fundamental_gate=True,
            gate_ransac=RansacConfig(inlier_threshold=3.0, iteration=128),
        ),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=max_kp, max_points=8192,
            max_observations=32768,
        ),
    )

    def run(cfg, feature_frames):
        e = IncrementalSfM(cfg, Kp, frontend="precomputed", seed=0)
        for xy, dd, valid in feature_frames:
            e.process_features(xy, dd, valid)
        locs, _ = e.poses()
        return np.asarray(locs), float(e.reprojection_error())

    locs_ref, reproj_ref = run(base, frames)

    coeffs = (-0.25, 0.06, 1.5e-3, -8e-4)
    distorted = [
        (np.asarray(distort_pixels(xy, Kp, coeffs), np.float32), dd, valid)
        for xy, dd, valid in frames
    ]
    import dataclasses

    cfg_d = dataclasses.replace(base, distortion=coeffs)
    locs_fix, reproj_fix = run(cfg_d, distorted)

    span = float(np.linalg.norm(locs_ref.max(0) - locs_ref.min(0)))
    ate = absolute_trajectory_error(locs_fix, locs_ref)
    # identical features after an (exactly inverted) warp + the same seed:
    # trajectories must agree tightly
    assert ate < 0.01 * span, (ate, span)
    assert reproj_fix < reproj_ref + 0.1, (reproj_fix, reproj_ref)

    # and WITHOUT the correction the same distorted input must be visibly
    # worse — otherwise this test would pass vacuously
    locs_raw, reproj_raw = run(base, distorted)
    ate_raw = absolute_trajectory_error(locs_raw, locs_ref)
    assert ate_raw > 2.0 * ate or reproj_raw > reproj_fix + 0.3, (
        ate_raw, ate, reproj_raw, reproj_fix,
    )
