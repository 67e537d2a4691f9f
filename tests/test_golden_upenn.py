"""End-to-end golden regression: reconstruct the 6-image upenn sequence and
compare the trajectory against the reference's golden ``view_pose.pkl``
(the reference's whole-pipeline test, ``ba_processor.py:443-546``; golden
outputs under ``test_dataset/upenn/results/``).

The frontend is the cv2-SIFT oracle (the geometry stack under test is ours;
the reference uses cv2 SIFT too, so correspondences are comparable). The
golden trajectory is itself the output of the reference's imperfect solver,
so the gate is a similarity-aligned ATE bound relative to the trajectory
span — shape agreement, not bitwise equality (SURVEY.md section 6).
"""

import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from structure_from_motion_tpu.config import (
    BAConfig,
    CapacityConfig,
    FrontendConfig,
    LMConfig,
    MatcherConfig,
    PipelineConfig,
    RansacConfig,
)
from structure_from_motion_tpu.io import load_image_grayscale, upenn_intrinsics
from structure_from_motion_tpu.models import IncrementalSfM
from structure_from_motion_tpu.utils.metrics import absolute_trajectory_error

MAX_KP = 1024


@pytest.fixture(scope="module")
def sift_frames(reference_dataset_path):
    cv2 = pytest.importorskip("cv2")
    d = os.path.join(reference_dataset_path, "upenn")
    sift = cv2.SIFT_create(nfeatures=MAX_KP)
    frames = []
    for i in range(1, 7):
        img = load_image_grayscale(os.path.join(d, f"image{i:07d}.bmp"))
        kps, desc = sift.detectAndCompute(img.astype(np.uint8), None)
        n = min(len(kps), MAX_KP)
        xy = np.zeros((MAX_KP, 2), np.float32)
        dd = np.zeros((MAX_KP, 128), np.float32)
        valid = np.zeros(MAX_KP, bool)
        xy[:n] = [k.pt for k in kps[:n]]
        dd[:n] = desc[:n]
        valid[:n] = True
        frames.append((xy, dd, valid))
    return frames


@pytest.fixture(scope="module")
def cv2_oracle_traj(reference_dataset_path):
    """Second accuracy anchor: a full-trajectory pure-OpenCV incremental
    pipeline (examples/oracle_crosscheck.cv2_trajectory). The golden pickle
    is the REFERENCE'S OWN solver output — including its essential-
    decomposition center bug — so an unbiased anchor is needed to tell
    'our error' apart from 'the golden's bias'. Measured: the cv2 oracle
    itself sits ~11% of span away from the golden."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    from oracle_crosscheck import cv2_trajectory

    from structure_from_motion_tpu.io import load_image_grayscale, upenn_intrinsics

    d = os.path.join(reference_dataset_path, "upenn")
    imgs = [
        load_image_grayscale(os.path.join(d, f"image{i:07d}.bmp"))
        for i in range(1, 7)
    ]
    return cv2_trajectory(imgs, upenn_intrinsics())


def _pipeline_cfg():
    return PipelineConfig(
        frontend=FrontendConfig(max_keypoints=MAX_KP, upsample_first_octave=False),
        matcher=MatcherConfig(
            ratio=0.75,
            use_fundamental_gate=True,
            gate_ransac=RansacConfig(inlier_threshold=3.0, iteration=128),
        ),
        fundamental_ransac=RansacConfig(inlier_threshold=2.0, iteration=256),
        pnp_ransac=RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=512),
        pnp_lm=LMConfig(damping=5.0, iterations=100),
        triangulation_lm=LMConfig(damping=5.0, iterations=50),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=MAX_KP, max_points=8192,
            max_observations=32768,
        ),
    )


def test_upenn_two_anchor_multiseed(reference_dataset_path, sift_frames, cv2_oracle_traj):
    """Seeds 0-3 (the README robustness claim, now enforced): every seed's
    trajectory must (a) stay inside the golden gate, and (b) sit CLOSER to
    the unbiased cv2-oracle anchor than to the golden — i.e. the residual
    ~11% gap to the golden tracks the golden's own solver bias, not ours."""
    with open(
        os.path.join(reference_dataset_path, "upenn", "results", "view_pose.pkl"),
        "rb",
    ) as fh:
        g_locs, _ = pickle.load(fh)
    span = float(np.linalg.norm(g_locs.max(0) - g_locs.min(0)))
    o_locs, _ = cv2_oracle_traj

    cfg = _pipeline_cfg()
    for seed in range(4):
        engine = IncrementalSfM(
            cfg, upenn_intrinsics(), frontend="precomputed", seed=seed
        )
        for xy, dd, valid in sift_frames:
            engine.process_features(xy, dd, valid)
        locs, _ = engine.poses()
        ate_golden = absolute_trajectory_error(locs, g_locs)
        ate_oracle = absolute_trajectory_error(locs, o_locs)
        print(
            f"seed {seed}: ATE vs golden {100*ate_golden/span:.2f}%, "
            f"vs cv2 oracle {100*ate_oracle/span:.2f}% of span"
        )
        assert ate_golden < 0.15 * span, (seed, ate_golden, span)
        assert ate_oracle < ate_golden, (seed, ate_oracle, ate_golden)
        # measured 0.59-0.92% across seeds; gate at 2%
        assert ate_oracle < 0.02 * span, (seed, ate_oracle, span)


def test_upenn_trajectory_matches_golden(reference_dataset_path, sift_frames):
    cfg = PipelineConfig(
        frontend=FrontendConfig(max_keypoints=MAX_KP, upsample_first_octave=False),
        matcher=MatcherConfig(
            ratio=0.75,
            use_fundamental_gate=True,
            gate_ransac=RansacConfig(inlier_threshold=3.0, iteration=128),
        ),
        fundamental_ransac=RansacConfig(inlier_threshold=2.0, iteration=256),
        pnp_ransac=RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=512),
        pnp_lm=LMConfig(damping=5.0, iterations=100),
        triangulation_lm=LMConfig(damping=5.0, iterations=50),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=MAX_KP, max_points=8192,
            max_observations=32768,
        ),
    )
    engine = IncrementalSfM(cfg, upenn_intrinsics(), frontend="precomputed")
    for xy, dd, valid in sift_frames:
        info = engine.process_features(xy, dd, valid)

    locs, rots = engine.poses()
    assert len(locs) == 6

    with open(
        os.path.join(reference_dataset_path, "upenn", "results", "view_pose.pkl"),
        "rb",
    ) as fh:
        g_locs, g_rots = pickle.load(fh)
    ate = absolute_trajectory_error(locs, g_locs)
    span = float(np.linalg.norm(g_locs.max(0) - g_locs.min(0)))
    # golden trajectory span ~7.4; measured ATE ~0.74 (10%) — gate at 15%
    assert ate < 0.15 * span, (ate, span, locs, g_locs)

    # quality gates on our own metrics
    assert info["reprojection_px"] < 3.0, info
    assert len(engine.map_points()) > 300
    # the trajectory must actually progress (not collapse to a cluster)
    assert np.linalg.norm(locs[-1] - locs[0]) > 0.3 * span
    # a healthy golden run never saturates its capacities: zero silent
    # drops (VERDICT r2 item 10 — saturation must be loudly visible)
    assert int(info["dropped_points"]) == 0, info
    assert int(info["dropped_obs"]) == 0, info
    assert int(info["ba_dropped_obs"]) == 0, info


def test_upenn_binary_frontend_e2e(reference_dataset_path):
    """End-to-end trajectory with the BINARY frontend (Harris + steered
    BRIEF, Hamming matching) — the reference's ORB mode. Half-resolution to
    keep CPU detection fast; gates on trajectory shape and consensus
    health (the round-1 weakness was ~15 PnP inliers)."""
    from structure_from_motion_tpu.io import load_image_grayscale

    d = os.path.join(reference_dataset_path, "upenn")
    imgs = [
        load_image_grayscale(os.path.join(d, f"image{i:07d}.bmp"))[::2, ::2]
        for i in range(1, 7)
    ]
    K = upenn_intrinsics().copy()
    K[:2] /= 2.0  # half resolution
    kp = 768
    cfg = PipelineConfig(
        frontend=FrontendConfig(
            detector="harris", max_keypoints=kp, descriptor_dim=256,
            num_octaves=3,
        ),
        matcher=MatcherConfig(
            ratio=0.9, metric="hamming", cross_check=True,
            use_fundamental_gate=True,
            gate_ransac=RansacConfig(inlier_threshold=3.0, iteration=128),
        ),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=kp, max_points=8192,
            max_observations=32768,
        ),
    )
    engine = IncrementalSfM(cfg, K, frontend="native", seed=0)
    infos = [engine.process_image(im) for im in imgs]
    locs, _ = engine.poses()

    with open(os.path.join(d, "results", "view_pose.pkl"), "rb") as fh:
        g_locs, _ = pickle.load(fh)
    span = float(np.linalg.norm(g_locs.max(0) - g_locs.min(0)))
    ate = absolute_trajectory_error(locs, g_locs)
    assert ate < 0.20 * span, (ate, span)
    assert infos[-1]["reprojection_px"] < 3.0, infos[-1]
    # consensus health: the localization stages must find a real inlier set
    assert min(i["pnp_inliers"] for i in infos[2:]) > 30, [
        i["pnp_inliers"] for i in infos
    ]
    assert np.linalg.norm(locs[-1] - locs[0]) > 0.3 * span


def test_upenn_dog_frontend_e2e(reference_dataset_path, cv2_oracle_traj):
    """End-to-end trajectory with the NATIVE DoG frontend at full
    resolution (the throughput config bench.py times): the on-device
    detector + descriptor must carry the whole pipeline to oracle-grade
    accuracy, not just produce two-view inlier counts. CPU-measured
    2026-08-17: ATE 1.06-1.08% of span, reprojection ~1.5 px, min PnP
    inliers 220+ (seeds 0-1)."""
    from structure_from_motion_tpu.io import load_image_grayscale, upenn_intrinsics

    d = os.path.join(reference_dataset_path, "upenn")
    imgs = [
        load_image_grayscale(os.path.join(d, f"image{i:07d}.bmp")).astype(np.uint8)
        for i in range(1, 7)
    ]
    kp = 1024
    cfg = PipelineConfig(
        frontend=FrontendConfig(max_keypoints=kp, upsample_first_octave=False),
        matcher=MatcherConfig(ratio=0.8),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=kp, max_points=8192,
            max_observations=32768,
        ),
    )
    engine = IncrementalSfM(cfg, upenn_intrinsics(), frontend="native", seed=0)
    infos = [engine.process_image(im) for im in imgs]
    locs, _ = engine.poses()

    o_locs, _ = cv2_oracle_traj
    span = float(np.linalg.norm(o_locs.max(0) - o_locs.min(0)))
    ate = absolute_trajectory_error(locs, o_locs)
    assert ate < 0.025 * span, (ate, span)
    assert infos[-1]["reprojection_px"] < 2.2, infos[-1]
    assert min(i["pnp_inliers"] for i in infos[2:]) > 100, [
        i["pnp_inliers"] for i in infos
    ]


def test_upenn_default_config_accuracy(reference_dataset_path, cv2_oracle_traj):
    """The DEFAULT configuration (what a no-flags `reconstruct` run ships:
    2x first octave, 5 octaves, ratio 0.75 + fundamental gate, final BA
    polish) must deliver accuracy-grade quality — the round-4 'accuracy is
    the default price' gate (VERDICT r3 item 4): median reprojection
    <= 1.5 px (bench medians ~1.1) and ATE vs the cv2 oracle <= 2.5% of
    span."""
    d = os.path.join(reference_dataset_path, "upenn")
    imgs = [
        load_image_grayscale(os.path.join(d, f"image{i:07d}.bmp"))
        for i in range(1, 7)
    ]
    kp = 1024
    cfg = PipelineConfig(
        frontend=FrontendConfig(
            max_keypoints=kp, upsample_first_octave=True, num_octaves=5
        ),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=kp, max_points=8192,
            max_observations=32768,
        ),
    )
    assert cfg.frontend.upsample_first_octave  # the dataclass default too
    assert FrontendConfig().upsample_first_octave
    engine = IncrementalSfM(cfg, upenn_intrinsics(), frontend="native", seed=0)
    for im in imgs:
        engine.process_image(im)
    engine.finalize(iterations=10)

    err = float(engine.reprojection_error())
    locs, _ = engine.poses()
    o_locs, _ = cv2_oracle_traj
    span = float(np.linalg.norm(o_locs.max(0) - o_locs.min(0)))
    ate = absolute_trajectory_error(locs, o_locs)
    assert err < 1.5, err
    assert ate < 0.025 * span, (ate, span)
