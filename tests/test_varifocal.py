"""Per-view intrinsics (state.K is (V, 3, 3); per-frame K via
``process_features(..., K=...)`` / ``process_image(img, K=...)``).

The reference's View struct stores its own k per image and
``BaProcessor.process(img, k)`` takes k per frame (``view_processor.py:
14-98``, ``ba_processor.py:43``), though its own pipeline always passes one
constant K. Here heterogeneous intrinsics (zoom/varifocal video, mixed
rigs) are first-class: every projection, normalisation, and BA residual
uses the owning view's K.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from test_incremental import synthetic_sequence, umeyama_ate

from structure_from_motion_tpu.config import (
    CapacityConfig,
    FrontendConfig,
    MatcherConfig,
    PipelineConfig,
)
from structure_from_motion_tpu.models import IncrementalSfM


def _cfg():
    return PipelineConfig(
        frontend=FrontendConfig(max_keypoints=512, upsample_first_octave=False),
        matcher=MatcherConfig(ratio=0.9),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=512, max_points=4096,
            max_observations=16384,
        ),
    )


def varifocal_sequence(n_views=5, n_points=300, kp_cap=512, seed=0, zoom=0.08):
    """Same geometry as ``synthetic_sequence`` but each view's focal length
    ramps by ``zoom`` per frame (a zoom-in during the pan)."""
    rng = np.random.default_rng(seed)
    X = rng.uniform([-4, -3, 10], [4, 3, 20], size=(n_points, 3))
    desc_codes = rng.normal(size=(n_points, 128)).astype(np.float32) * 10

    frames, Ks, C_gt, R_gt = [], [], [], []
    for v in range(n_views):
        f = 500.0 * (1.0 + zoom * v)
        K = np.array([[f, 0, 320.0], [0, f, 240.0], [0, 0, 1.0]])
        C = np.array([v * 1.0, 0.05 * v**2, 0.3 * v])
        R = ScipyRotation.from_rotvec([0.0, -0.06 * v, 0.0]).as_matrix()
        Ks.append(K)
        C_gt.append(C)
        R_gt.append(R)
        Xc = (R.T @ (X - C).T).T
        uvn = Xc[:, :2] / Xc[:, 2:3]
        uv = uvn * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        perm = rng.permutation(n_points)
        xy = np.zeros((kp_cap, 2), np.float32)
        d = np.zeros((kp_cap, 128), np.float32)
        valid = np.zeros(kp_cap, bool)
        xy[:n_points] = uv[perm]
        d[:n_points] = desc_codes[perm]
        valid[:n_points] = True
        frames.append((xy, d, valid))
    return np.stack(Ks), frames, np.stack(C_gt), np.stack(R_gt)


def test_per_view_K_recovers_varifocal_trajectory():
    Ks, frames, C_gt, _ = varifocal_sequence()
    engine = IncrementalSfM(_cfg(), Ks[0], frontend="precomputed", seed=0)
    for (xy, d, valid), K in zip(frames, Ks):
        engine.process_features(xy, d, valid, K=K)
    locs, _ = engine.poses()
    assert len(locs) == len(frames)
    ate = umeyama_ate(np.asarray(locs), C_gt)
    assert ate < 0.05, (ate, locs, C_gt)
    # the stored per-view intrinsics are the ones supplied
    np.testing.assert_allclose(
        np.asarray(engine.state.K)[: len(frames)], Ks, atol=1e-4
    )

    # control: the SAME zoomed input under the constant-K assumption must
    # be visibly worse — otherwise this test passes vacuously
    wrong = IncrementalSfM(_cfg(), Ks[0], frontend="precomputed", seed=0)
    for xy, d, valid in frames:
        wrong.process_features(xy, d, valid)
    locs_w, _ = wrong.poses()
    ate_w = umeyama_ate(np.asarray(locs_w), C_gt)
    assert ate_w > 3.0 * ate, (ate_w, ate)


def test_per_view_K_array_matches_scalar_K_run():
    """Passing a (V,3,3) broadcast of one K at construction must reproduce
    the single-K run bitwise (pure schema change, no numerics)."""
    K, frames, *_ = synthetic_sequence(n_views=4)
    a = IncrementalSfM(_cfg(), K, frontend="precomputed", seed=0)
    V = _cfg().capacity.max_views
    b = IncrementalSfM(
        _cfg(), np.broadcast_to(K, (V, 3, 3)), frontend="precomputed", seed=0
    )
    for f in frames:
        a.process_features(*f)
        b.process_features(*f)
    np.testing.assert_array_equal(
        np.asarray(a.state.cam_C), np.asarray(b.state.cam_C)
    )
    np.testing.assert_array_equal(
        np.asarray(a.state.points), np.asarray(b.state.points)
    )


def test_varifocal_slide_mode_keeps_K_rows_aligned():
    """Sliding-window eviction must shift K rows with their views."""
    import dataclasses

    Ks, frames, C_gt, _ = varifocal_sequence(n_views=6)
    cfg = dataclasses.replace(_cfg(), window_size=4, window_mode="slide")
    engine = IncrementalSfM(cfg, Ks[0], frontend="precomputed", seed=0)
    for (xy, d, valid), K in zip(frames, Ks):
        engine.process_features(xy, d, valid, K=K)
    # live window holds the LAST window_size frames' intrinsics
    np.testing.assert_allclose(
        np.asarray(engine.state.K)[:4], Ks[2:6], atol=1e-4
    )
    locs, _ = engine.poses()
    assert len(locs) == 6
    ate = umeyama_ate(np.asarray(locs), C_gt)
    assert ate < 0.08, ate


def test_colmap_export_heterogeneous_cameras(tmp_path):
    """Per-view K export: one PINHOLE camera per image when intrinsics
    differ; reader resolves per-image Ks through CAMERA_ID."""
    from structure_from_motion_tpu.io.colmap import (
        export_colmap_text,
        read_colmap_text,
    )

    Ks, frames, C_gt, _ = varifocal_sequence(n_views=4)
    engine = IncrementalSfM(_cfg(), Ks[0], frontend="precomputed", seed=0)
    for (xy, d, valid), K in zip(frames, Ks):
        engine.process_features(xy, d, valid, K=K)
    locs, rots = engine.poses()
    out = str(tmp_path / "colmap")
    export_colmap_text(
        out, locs, rots, np.asarray(engine.state.K), (640, 480),
        state=engine.state,
    )
    model = read_colmap_text(out)
    assert model["Ks"].shape == (4, 3, 3)
    np.testing.assert_allclose(model["Ks"], Ks, atol=1e-3)
    # heterogeneous -> one camera per image
    with open(f"{out}/cameras.txt") as fh:
        cams = [l for l in fh if l.strip() and not l.startswith("#")]
    assert len(cams) == 4


def test_colmap_export_heterogeneous_slide_mode(tmp_path):
    """Slide-mode export with per-view K: live slots are the LAST live
    images, and n_live must come from cam_valid, not the capacity-sized K
    array (capacity rows past the window hold stale constructor K)."""
    import dataclasses

    from structure_from_motion_tpu.io.colmap import (
        export_colmap_text,
        read_colmap_text,
    )

    Ks, frames, C_gt, _ = varifocal_sequence(n_views=6)
    cfg = dataclasses.replace(_cfg(), window_size=4, window_mode="slide")
    engine = IncrementalSfM(cfg, Ks[0], frontend="precomputed", seed=0)
    for (xy, d, valid), K in zip(frames, Ks):
        engine.process_features(xy, d, valid, K=K)
    locs, rots = engine.poses()
    assert len(locs) == 6
    out = str(tmp_path / "colmap")
    export_colmap_text(
        out, locs, rots, np.asarray(engine.state.K), (640, 480),
        state=engine.state,
    )
    model = read_colmap_text(out)
    # live images 2..5 carry their own K; archived 0..1 inherit the oldest
    # live slot's K (frame 2's)
    np.testing.assert_allclose(model["Ks"][2:], Ks[2:6], atol=1e-3)
    np.testing.assert_allclose(model["Ks"][:2], [Ks[2], Ks[2]], atol=1e-3)
    # observation tracks must reference only live images (ids 3..6 1-based)
    ref_imgs = {img_id for tr in model["tracks"].values() for img_id, _ in tr}
    assert ref_imgs and ref_imgs <= {3, 4, 5, 6}, ref_imgs


def test_checkpoint_backcompat_shared_K(tmp_path):
    """Checkpoints written before per-view intrinsics carried one (3,3) K;
    the loader must broadcast it to the (V,3,3) schema."""
    import jax.numpy as jnp

    from structure_from_motion_tpu.models.tracks import init_state
    from structure_from_motion_tpu.utils.checkpoint import load_state, save_state

    cap = _cfg().capacity
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    st = init_state(cap, K)
    path = str(tmp_path / "state.npz")
    save_state(path, st._replace(K=jnp.asarray(K, jnp.float32)), frame=1)
    st2, frame, _, _ = load_state(path)
    assert st2.K.shape == (cap.max_views, 3, 3)
    np.testing.assert_allclose(np.asarray(st2.K[3]), K, atol=1e-4)
