"""Keyframe selection (config.keyframe_min_flow_px): near-stationary frames
are rejected by a device-computed median-flow gate before they consume
window slots. Greenfield component (the reference feeds every frame,
``ba_processor.py:43-46``)."""

import numpy as np
import pytest

from test_incremental import synthetic_sequence

from structure_from_motion_tpu.config import (
    CapacityConfig,
    FrontendConfig,
    MatcherConfig,
    PipelineConfig,
)
from structure_from_motion_tpu.models import IncrementalSfM
from structure_from_motion_tpu.utils.metrics import absolute_trajectory_error


def _cfg(**kw):
    return PipelineConfig(
        frontend=FrontendConfig(max_keypoints=512, upsample_first_octave=False),
        matcher=MatcherConfig(ratio=0.9),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=512, max_points=4096,
            max_observations=16384,
        ),
        **kw,
    )


def _video_with_duplicates(frames, jitter_px=0.2, repeats=2, seed=0):
    """Each real frame followed by `repeats` near-identical frames (sub-
    pixel jitter: a tripod wobble), the degenerate input keyframing must
    reject."""
    rng = np.random.default_rng(seed)
    video, is_dup = [], []
    for xy, d, valid in frames:
        video.append((xy, d, valid))
        is_dup.append(False)
        for _ in range(repeats):
            jx = xy + rng.normal(size=xy.shape).astype(np.float32) * jitter_px
            video.append((jx.astype(np.float32), d, valid))
            is_dup.append(True)
    return video, is_dup


def test_duplicates_are_skipped_and_trajectory_matches():
    K, frames, C_gt, _, _ = synthetic_sequence(n_views=5, n_points=300)
    video, is_dup = _video_with_duplicates(frames)

    engine = IncrementalSfM(
        _cfg(keyframe_min_flow_px=3.0), K, frontend="precomputed", seed=0
    )
    infos = [engine.process_features(*f) for f in video]

    skipped = [bool(i.get("keyframe_skipped")) for i in infos]
    assert skipped == is_dup, list(zip(skipped, is_dup))
    # flow statistic is reported for every gated frame
    for i, inf in enumerate(infos[1:], start=1):
        assert "flow_px" in inf, inf
        if is_dup[i]:
            assert inf["flow_px"] < 3.0
    assert engine.keyframe_indices == [0, 3, 6, 9, 12]

    # same trajectory as feeding only the real frames with gating off
    base = IncrementalSfM(_cfg(), K, frontend="precomputed", seed=0)
    for f in frames:
        base.process_features(*f)
    locs_base, _ = base.poses()
    locs_kf, _ = engine.poses()
    assert len(locs_kf) == len(frames)
    span = float(np.linalg.norm(np.asarray(locs_base).max(0) - np.asarray(locs_base).min(0)))
    ate = absolute_trajectory_error(locs_kf, locs_base)
    assert ate < 1e-3 * span, (ate, span)


def test_zero_threshold_admits_everything():
    K, frames, *_ = synthetic_sequence(n_views=4, n_points=200)
    video, _ = _video_with_duplicates(frames, repeats=1)
    engine = IncrementalSfM(_cfg(), K, frontend="precomputed", seed=0)
    infos = [engine.process_features(*f) for f in video]
    assert not any(i.get("keyframe_skipped") for i in infos)
    assert engine.keyframe_indices == list(range(len(video)))


def test_scene_cut_is_admitted():
    """A frame sharing no descriptors with the previous view (scene cut)
    must be ADMITTED despite having no measurable flow."""
    K, frames, *_ = synthetic_sequence(n_views=3, n_points=300, seed=0)
    # frame from a different generator seed: disjoint descriptor codes
    _, alien, *_ = synthetic_sequence(n_views=1, n_points=300, seed=99)
    engine = IncrementalSfM(
        _cfg(keyframe_min_flow_px=3.0), K, frontend="precomputed", seed=0
    )
    engine.process_features(*frames[0])
    info = engine.process_features(*alien[0])
    assert not info.get("keyframe_skipped"), info
    assert info["flow_px"] == np.inf or info["flow_px"] >= 3.0


def test_duplicates_skipped_under_distortion():
    """With config.distortion set, stored keypoints are undistorted at
    ingest while candidates arrive raw — the flow gate must compare like
    with like, or a duplicate frame would measure distortion magnitude
    (many px) instead of motion and always be admitted."""
    import dataclasses

    from structure_from_motion_tpu.ops.distortion import distort_pixels

    coeffs = (-0.25, 0.06)
    K_syn, fr, *_ = synthetic_sequence(n_views=3, n_points=300)
    # distort the synthetic pixel measurements with the known model
    distorted = [
        (
            np.asarray(distort_pixels(xy, K_syn, coeffs), np.float32),
            d,
            valid,
        )
        for xy, d, valid in fr
    ]
    video, is_dup = _video_with_duplicates(distorted, repeats=1)
    cfg = dataclasses.replace(
        _cfg(keyframe_min_flow_px=3.0), distortion=coeffs
    )
    engine = IncrementalSfM(cfg, K_syn, frontend="precomputed", seed=0)
    infos = [engine.process_features(*f) for f in video]
    skipped = [bool(i.get("keyframe_skipped")) for i in infos]
    assert skipped == is_dup, list(zip(skipped, is_dup))


def test_keyframe_bookkeeping_survives_checkpoint(tmp_path):
    """save_checkpoint/load_checkpoint must round-trip the accepted-input
    indices so a resumed run keeps input-file <-> view alignment."""
    K, frames, *_ = synthetic_sequence(n_views=4, n_points=300)
    video, is_dup = _video_with_duplicates(frames, repeats=1)

    engine = IncrementalSfM(
        _cfg(keyframe_min_flow_px=3.0), K, frontend="precomputed", seed=0
    )
    for f in video[:5]:
        engine.process_features(*f)
    path = str(tmp_path / "ckpt.npz")
    engine.save_checkpoint(path)

    resumed = IncrementalSfM(
        _cfg(keyframe_min_flow_px=3.0), K, frontend="precomputed", seed=0
    )
    assert resumed.load_checkpoint(path) == engine._frame
    assert resumed.keyframe_indices == engine.keyframe_indices
    assert resumed._input_index == engine._input_index
    for f in video[5:]:
        resumed.process_features(*f)
    expected = [i for i, dup in enumerate(is_dup) if not dup]
    assert resumed.keyframe_indices == expected


def test_batched_engine_rejects_keyframing():
    from structure_from_motion_tpu.models import BatchedIncrementalSfM

    K = np.eye(3)
    with pytest.raises(NotImplementedError):
        BatchedIncrementalSfM(
            _cfg(keyframe_min_flow_px=2.0), K, batch=2, frontend="native"
        )
