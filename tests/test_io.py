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


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from structure_from_motion_tpu.config import CapacityConfig
    from structure_from_motion_tpu.models.tracks import init_state
    from structure_from_motion_tpu.utils.checkpoint import load_state, save_state

    cap = CapacityConfig(max_views=4, max_keypoints=64, max_points=128, max_observations=256)
    st = init_state(cap, np.eye(3))
    st = st._replace(points=st.points.at[3].set(jnp.asarray([1.0, 2.0, 3.0])),
                     num_points=jnp.asarray(4, jnp.int32))
    path = str(tmp_path / "state.npz")
    save_state(path, st, frame=2)
    st2, frame = load_state(path)
    assert frame == 2
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
        frontend=FrontendConfig(max_keypoints=512),
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
        resumed.state, resumed._frame = load_state(path)
        for f in frames[2:]:
            resumed.process_features(*f)

    np.testing.assert_array_equal(
        np.asarray(full.state.cam_C), np.asarray(resumed.state.cam_C)
    )
    np.testing.assert_array_equal(
        np.asarray(full.state.points), np.asarray(resumed.state.points)
    )
    assert int(full.state.num_points) == int(resumed.state.num_points)
