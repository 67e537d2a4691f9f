"""IO tests: txt point loader, BMP decoding (python + native C++ paths),
prefetching loader, checkpoint round trip."""

import os

import numpy as np
import pytest

from structure_from_motion_tpu.io import load_image_grayscale, load_points_txt
from structure_from_motion_tpu.io.native_loader import (
    PrefetchingLoader,
    decode_grayscale,
    native_available,
)


def test_load_points_txt_two_column_swap(tmp_path):
    # 2-column rows are (y, x) and must swap on load (utils.py:199-216)
    p = tmp_path / "pts.txt"
    p.write_text("2\n10.0 20.0\n30.5 40.5\n")
    pts = load_points_txt(str(p))
    np.testing.assert_allclose(pts, [[20.0, 10.0, 1.0], [40.5, 30.5, 1.0]])


def test_load_points_txt_three_column(tmp_path):
    p = tmp_path / "pts3.txt"
    p.write_text("1\n1.0 2.0 3.0\n")
    pts = load_points_txt(str(p))
    np.testing.assert_allclose(pts, [[1.0, 2.0, 3.0]])


def test_bmp_decoder_matches_cv2(reference_dataset_path):
    import cv2

    path = os.path.join(reference_dataset_path, "upenn", "image0000001.bmp")
    ours = load_image_grayscale(path)
    theirs = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2GRAY).astype(np.float32)
    assert ours.shape == theirs.shape
    # cv2 rounds to uint8; our float path must agree within rounding
    assert np.abs(ours - theirs).max() <= 0.51


def test_native_loader_matches_python(reference_dataset_path):
    if not native_available():
        pytest.skip("native loader did not build")
    path = os.path.join(reference_dataset_path, "upenn", "image0000002.bmp")
    a = decode_grayscale(path)
    b = load_image_grayscale(path)
    assert a is not None
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_prefetching_loader_order_and_fallback(reference_dataset_path, tmp_path):
    paths = [
        os.path.join(reference_dataset_path, "upenn", f"image{i:07d}.bmp")
        for i in (1, 2)
    ]
    ld = PrefetchingLoader(paths, n_threads=2)
    imgs = list(ld)
    ld.close()
    assert len(imgs) == 2 and imgs[0].shape == (960, 1280)
    # out-of-order access works
    ld2 = PrefetchingLoader(paths)
    second = ld2.get(1)
    first = ld2.get(0)
    ld2.close()
    np.testing.assert_array_equal(first, imgs[0])
    np.testing.assert_array_equal(second, imgs[1])
    # unsupported format falls back to the Python decoder path
    png = tmp_path / "x.jpg"
    import cv2

    cv2.imwrite(str(png), np.full((8, 8), 128, np.uint8))
    img = PrefetchingLoader([str(png)]).get(0)
    assert img.shape == (8, 8)


def test_tum_trajectory_roundtrip(tmp_path):
    """export -> load recovers centers, rotations, and timestamps; the file
    is the evo-consumable `ts tx ty tz qx qy qz qw` layout (xyzw order)."""
    from scipy.spatial.transform import Rotation

    from structure_from_motion_tpu.io import (
        export_tum_trajectory,
        load_tum_trajectory,
    )

    rng = np.random.default_rng(3)
    F = 5
    locs = rng.normal(size=(F, 3))
    rots = Rotation.random(F, random_state=7).as_matrix()
    ts_in = np.array([0.0, 1.0, 2.0, 4.0, 9.0])
    path = str(tmp_path / "traj.tum")
    assert export_tum_trajectory(path, locs, rots, timestamps=ts_in) == F

    ts, C, R = load_tum_trajectory(path)
    np.testing.assert_allclose(ts, ts_in)
    np.testing.assert_allclose(C, locs, atol=1e-8)
    np.testing.assert_allclose(R, rots, atol=1e-6)

    # field order on disk is the TUM contract: qx qy qz qw (xyzw), not wxyz
    with open(path) as f:
        f.readline()  # header comment
        vals = [float(v) for v in f.readline().split()]
    q_scipy = Rotation.from_matrix(rots[0]).as_quat()  # scipy is xyzw
    q_file = np.asarray(vals[4:8])
    sign = np.sign(q_file[3]) * np.sign(q_scipy[3]) or 1.0
    np.testing.assert_allclose(q_file, sign * q_scipy, atol=1e-6)


def test_tum_export_from_engine_poses(tmp_path):
    """The engine's poses() round-trip through the TUM file unchanged, so
    external ATE tools score exactly the trajectory the engine reports."""
    from structure_from_motion_tpu.io import (
        export_tum_trajectory,
        load_tum_trajectory,
    )
    from structure_from_motion_tpu.models import IncrementalSfM
    from tests.test_incremental import pipeline_config, synthetic_sequence

    K, frames, _, _, _ = synthetic_sequence(n_views=3)
    engine = IncrementalSfM(pipeline_config.__wrapped__(), K, frontend="precomputed")
    for f in frames:
        engine.process_features(*f)
    locs, rots = engine.poses()
    path = str(tmp_path / "engine.tum")
    export_tum_trajectory(path, locs, rots)
    _, C, R = load_tum_trajectory(path)
    np.testing.assert_allclose(C, locs, atol=1e-7)
    np.testing.assert_allclose(R, rots, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from structure_from_motion_tpu.config import CapacityConfig
    from structure_from_motion_tpu.models.tracks import init_state
    from structure_from_motion_tpu.utils.checkpoint import load_state, save_state

    cap = CapacityConfig(max_views=4, max_keypoints=64, max_points=128, max_observations=256)
    st = init_state(cap, np.eye(3))
    st = st._replace(points=st.points.at[3].set(jnp.asarray([1.0, 2.0, 3.0], st.points.dtype)),
                     num_points=jnp.asarray(4, jnp.int32))
    path = str(tmp_path / "state.npz")
    save_state(path, st, frame=2)
    st2, frame, archive, keyframes = load_state(path)
    assert frame == 2
    assert archive == []
    # identity bookkeeping default for checkpoints without keyframe data
    assert keyframes == ([0, 1], 2)
    for f in st._fields:
        np.testing.assert_array_equal(np.asarray(getattr(st, f)), np.asarray(getattr(st2, f)))


def test_checkpoint_resume_equivalence():
    """Interrupt-and-resume must reproduce the uninterrupted reconstruction
    exactly: process 2 frames, checkpoint, restore into a FRESH engine,
    continue — poses and map match the straight-through run bitwise (same
    per-frame PRNG keys are derived from the frame index)."""
    import tempfile

    import jax.numpy as jnp

    from structure_from_motion_tpu.models import IncrementalSfM
    from structure_from_motion_tpu.utils.checkpoint import load_state, save_state
    from test_incremental import pipeline_config as _cfg_fixture  # noqa: F401
    from test_incremental import synthetic_sequence
    from structure_from_motion_tpu.config import (
        BAConfig, CapacityConfig, FrontendConfig, LMConfig, MatcherConfig,
        PipelineConfig, RansacConfig,
    )

    cfg = PipelineConfig(
        frontend=FrontendConfig(max_keypoints=512, upsample_first_octave=False),
        matcher=MatcherConfig(ratio=0.9),
        fundamental_ransac=RansacConfig(inlier_threshold=2.0, iteration=128),
        pnp_ransac=RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=256),
        pnp_lm=LMConfig(damping=5.0, iterations=50),
        triangulation_lm=LMConfig(damping=5.0, iterations=25),
        ba=BAConfig(iterations=3, damping=5.0),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=512, max_points=2048, max_observations=8192
        ),
    )
    K, frames, *_ = synthetic_sequence(n_views=4)

    full = IncrementalSfM(cfg, K, frontend="precomputed", seed=0)
    for f in frames:
        full.process_features(*f)

    first = IncrementalSfM(cfg, K, frontend="precomputed", seed=0)
    for f in frames[:2]:
        first.process_features(*f)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/state.npz"
        save_state(path, first.state, frame=2)
        resumed = IncrementalSfM(cfg, K, frontend="precomputed", seed=0)
        resumed.state, resumed._frame, resumed._archive, _ = load_state(path)
        for f in frames[2:]:
            resumed.process_features(*f)

    np.testing.assert_array_equal(
        np.asarray(full.state.cam_C), np.asarray(resumed.state.cam_C)
    )
    np.testing.assert_array_equal(
        np.asarray(full.state.points), np.asarray(resumed.state.points)
    )
    assert int(full.state.num_points) == int(resumed.state.num_points)


def test_checkpoint_resume_sliding_window_archive():
    """Resume in slide mode must preserve the eviction archive: 7 frames
    through a 4-view window (3 evictions), checkpointing mid-way AFTER the
    first eviction — the resumed engine's full trajectory (archived +
    live poses) must equal the straight-through run bitwise."""
    import tempfile

    import dataclasses

    from structure_from_motion_tpu.models import IncrementalSfM
    from test_incremental import synthetic_sequence
    from structure_from_motion_tpu.config import (
        BAConfig, CapacityConfig, FrontendConfig, LMConfig, MatcherConfig,
        PipelineConfig, RansacConfig,
    )

    cfg = PipelineConfig(
        frontend=FrontendConfig(max_keypoints=512, upsample_first_octave=False),
        matcher=MatcherConfig(ratio=0.9),
        fundamental_ransac=RansacConfig(inlier_threshold=2.0, iteration=128),
        pnp_ransac=RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=256),
        pnp_lm=LMConfig(damping=5.0, iterations=50),
        triangulation_lm=LMConfig(damping=5.0, iterations=25),
        ba=BAConfig(iterations=3, damping=5.0),
        capacity=CapacityConfig(
            max_views=4, max_keypoints=512, max_points=2048, max_observations=8192
        ),
        window_size=4,
        window_mode="slide",
    )
    K, frames, *_ = synthetic_sequence(n_views=7)

    full = IncrementalSfM(cfg, K, frontend="precomputed", seed=0)
    for f in frames:
        full.process_features(*f)
    locs_full, rots_full = full.poses()
    assert locs_full.shape[0] == 7  # archive (3) + live window (4)

    first = IncrementalSfM(cfg, K, frontend="precomputed", seed=0)
    for f in frames[:5]:  # crosses one eviction (frame 4)
        first.process_features(*f)
    assert len(first._archive) == 1
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/state.npz"
        first.save_checkpoint(path)
        resumed = IncrementalSfM(cfg, K, frontend="precomputed", seed=0)
        assert resumed.load_checkpoint(path) == 5
        assert len(resumed._archive) == 1
        for f in frames[5:]:  # two more evictions
            resumed.process_features(*f)
    locs_res, rots_res = resumed.poses()
    np.testing.assert_array_equal(locs_full, locs_res)
    np.testing.assert_array_equal(rots_full, rots_res)


def test_prune_compacts_stores():
    """prune_observations must reclaim dropped point/observation slots and
    keep num_points == pt_valid.sum() (the validate_state invariant)."""
    import jax.numpy as jnp

    from structure_from_motion_tpu.config import CapacityConfig
    from structure_from_motion_tpu.models import tracks
    from structure_from_motion_tpu.utils.debug import validate_state

    cap = CapacityConfig(max_views=4, max_keypoints=64, max_points=64, max_observations=256)
    st = tracks.init_state(cap, np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]))
    st = tracks.set_camera(st, 0, jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]))
    st = tracks.set_camera(st, 1, jnp.asarray([1.0, 0, 0]), jnp.asarray([1.0, 0, 0, 0]))
    # 3 points in front of both cameras; give each 2 observations at the
    # true projections, then poison point 1's observations
    X = np.array([[0.0, 0, 5], [1.0, 1, 6], [-1.0, 0.5, 7]])
    st, ids, _ = tracks.allocate_points(st, jnp.asarray(X), jnp.ones(3, bool))
    for cam, C in ((0, np.zeros(3)), (1, np.array([1.0, 0, 0]))):
        uvs = []
        for x in X:
            xc = x - C
            uvs.append([100 * xc[0] / xc[2] + 32, 100 * xc[1] / xc[2] + 32])
        uvs = np.asarray(uvs)
        if cam == 1:
            uvs[1] += 500.0  # poison point 1 in view 1 -> huge reproj error
        st = tracks.append_observations(
            st, jnp.full(3, cam), ids, jnp.asarray(uvs), jnp.ones(3, bool)
        )
    assert int(st.num_obs) == 6 and int(st.num_points) == 3
    st2, n_obs_dropped, n_pts_dropped = tracks.prune_observations(st, 4.0)
    # point 1 loses one obs -> only 1 support left -> the point dies,
    # taking its remaining observation with it
    assert int(n_obs_dropped) == 1
    assert int(n_pts_dropped) == 1
    assert int(st2.num_points) == 2 == int(np.asarray(st2.pt_valid).sum())
    assert int(st2.num_obs) == 4 == int(np.asarray(st2.obs_valid).sum())
    # compaction means the next allocation reuses the freed slot
    assert validate_state(st2._replace(cam_valid=st2.cam_valid)) == []
    st3, _, _ = tracks.allocate_points(st2, jnp.ones((1, 3)), jnp.ones(1, bool))
    assert int(st3.num_points) == 3


def test_capacity_overflow_is_counted():
    """Deliberately overflow the point and observation stores: the drops
    must be counted, surfaced in state, and flagged by validate_state."""
    import jax.numpy as jnp

    from structure_from_motion_tpu.config import CapacityConfig
    from structure_from_motion_tpu.models import tracks
    from structure_from_motion_tpu.utils.debug import validate_state

    cap = CapacityConfig(max_views=2, max_keypoints=8, max_points=4, max_observations=4)
    st = tracks.init_state(cap, np.eye(3))
    st = tracks.set_camera(st, 0, jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]))
    st, ids, stored = tracks.allocate_points(
        st, jnp.arange(18.0).reshape(6, 3), jnp.ones(6, bool)
    )
    assert int(st.num_points) == 4
    assert int(st.dropped_points) == 2
    # overflow candidates must be excluded from `stored` (their ids are
    # >= capacity; recording them would corrupt downstream gathers) and
    # every stored id must be in range
    stored_np = np.asarray(stored)
    assert stored_np.sum() == 4
    assert (np.asarray(ids)[stored_np] < 4).all()
    st = tracks.append_observations(
        st, jnp.zeros(6, jnp.int32), jnp.clip(ids, 0, 3), jnp.ones((6, 2)),
        jnp.ones(6, bool),
    )
    assert int(st.num_obs) == 4
    assert int(st.dropped_obs) == 2
    problems = validate_state(st)
    assert any("overflow" in p and "points" in p for p in problems), problems
    assert any("overflow" in p and "observations" in p for p in problems), problems


def test_colmap_export_roundtrip(tmp_path):
    """COLMAP text-model export: run the synthetic pipeline, export, parse
    back, and verify (a) poses/K/points round-trip, (b) the w2c quaternion
    convention reprojects tracked 2D observations, (c) track cross-refs
    between images.txt and points3D.txt are consistent."""
    from test_incremental import synthetic_sequence

    from structure_from_motion_tpu.config import (
        CapacityConfig, FrontendConfig, MatcherConfig, PipelineConfig,
    )
    from structure_from_motion_tpu.io.colmap import (
        export_colmap_text, read_colmap_text,
    )
    from structure_from_motion_tpu.models import IncrementalSfM

    K, frames, *_ = synthetic_sequence(n_views=4, n_points=200)
    cfg = PipelineConfig(
        frontend=FrontendConfig(max_keypoints=512, upsample_first_octave=False),
        matcher=MatcherConfig(ratio=0.9),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=512, max_points=4096,
            max_observations=16384,
        ),
    )
    engine = IncrementalSfM(cfg, K, frontend="precomputed")
    for f in frames:
        engine.process_features(*f)
    locs, rots = engine.poses()

    out = str(tmp_path / "colmap")
    counts = export_colmap_text(
        out, locs, rots, K, (640, 480),
        image_names=[f"im{i}.png" for i in range(len(locs))],
        state=engine.state,
    )
    assert counts["images"] == len(locs)
    assert counts["points"] > 100
    assert counts["observations"] >= counts["points"]

    model = read_colmap_text(out)
    np.testing.assert_allclose(model["locs"], locs, atol=1e-6)
    np.testing.assert_allclose(model["rots"], rots, atol=1e-6)
    np.testing.assert_allclose(model["K"], K, atol=1e-6)
    assert model["names"][0] == "im0.png"
    assert model["points"].shape[0] == counts["points"]

    # parse images.txt 2D observations for the convention check
    rows = [
        l.rstrip("\n")
        for l in open(os.path.join(out, "images.txt"))
        if not l.startswith("#")
    ]
    obs2d = {}  # image_id -> list of (x, y, pid)
    for i in range(0, len(rows) - 1, 2):
        img_id = int(rows[i].split()[0])
        f = rows[i + 1].split()
        obs2d[img_id] = [
            (float(f[k]), float(f[k + 1]), int(f[k + 2]))
            for k in range(0, len(f), 3)
        ]

    pts_by_id = dict(zip(model["point_ids"], model["points"]))
    n_checked = 0
    for pid, track in model["tracks"].items():
        X = pts_by_id[pid]
        for img_id, p2d_idx in track:
            x, y, pid_ref = obs2d[img_id][p2d_idx]
            assert pid_ref == pid  # cross-reference consistency
            # COLMAP convention: x_cam = R_w2c X + t, pixel = K proj
            R_c2w = model["rots"][img_id - 1]
            C = model["locs"][img_id - 1]
            Xc = R_c2w.T @ (X - C)
            assert Xc[2] > 0
            proj = model["K"] @ (Xc / Xc[2])
            err = np.hypot(proj[0] - x, proj[1] - y)
            assert err < 1.0, (pid, img_id, err)
            n_checked += 1
    assert n_checked == counts["observations"]


def test_ply_export_roundtrip(tmp_path):
    """PLY export (both encodings): vertices round-trip bit-exactly at f32
    and cameras are colour-separable from map points."""
    from structure_from_motion_tpu.io.ply import export_ply, read_ply

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(257, 3)).astype(np.float32)
    cams = rng.normal(size=(6, 3)).astype(np.float32)
    for binary in (True, False):
        path = str(tmp_path / f"model_{binary}.ply")
        n = export_ply(path, pts, cameras=cams, binary=binary)
        assert n == len(pts) + len(cams)
        xyz, rgb = read_ply(path)
        assert xyz.shape == (n, 3)
        np.testing.assert_allclose(xyz[: len(pts)], pts, atol=1e-6)
        np.testing.assert_allclose(xyz[len(pts):], cams, atol=1e-6)
        # camera vertices are the red ones
        is_cam = rgb[:, 0] > rgb[:, 1]
        assert is_cam.sum() == len(cams) and is_cam[len(pts):].all()


def test_device_prefetcher_matches_sequential(reference_dataset_path):
    """DevicePrefetcher yields (path, device frame) in order, equal to the
    sequential loads; an unreadable path raises at its position."""
    import os

    import pytest

    from structure_from_motion_tpu.io import load_image_grayscale
    from structure_from_motion_tpu.io.prefetch import DevicePrefetcher

    d = os.path.join(reference_dataset_path, "upenn")
    paths = [os.path.join(d, f"image{i:07d}.bmp") for i in range(1, 4)]
    out = list(DevicePrefetcher(paths, load_image_grayscale, depth=2))
    assert [p for p, _ in out] == paths
    for p, buf in out:
        np.testing.assert_array_equal(np.asarray(buf), load_image_grayscale(p))

    bad = paths[:1] + [os.path.join(d, "missing.bmp")] + paths[2:]
    it = iter(DevicePrefetcher(bad, load_image_grayscale, depth=2))
    assert next(it)[0] == paths[0]
    with pytest.raises(Exception):
        next(it)
