"""Auxiliary-subsystem tests: profiling timer, reprojection statistics,
plotting helpers, feature cache — every public utility must have a caller
and a test (SURVEY.md section 5)."""

import logging
import os

import numpy as np
import jax.numpy as jnp

from structure_from_motion_tpu.config import CapacityConfig
from structure_from_motion_tpu.models import tracks


def _tiny_state():
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    cap = CapacityConfig(max_views=4, max_keypoints=64, max_points=64, max_observations=256)
    st = tracks.init_state(cap, K)
    st = tracks.set_camera(st, 0, jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]))
    st = tracks.set_camera(st, 1, jnp.asarray([1.0, 0, 0]), jnp.asarray([1.0, 0, 0, 0]))
    X = np.array([[0.0, 0, 5], [1.0, 1, 6], [-1.0, 0.5, 7]])
    st, ids, _ = tracks.allocate_points(st, jnp.asarray(X), jnp.ones(3, bool))
    for cam, C in ((0, np.zeros(3)), (1, np.array([1.0, 0, 0]))):
        xc = X - C
        uv = np.stack([100 * xc[:, 0] / xc[:, 2] + 32, 100 * xc[:, 1] / xc[:, 2] + 32], 1)
        uv = uv + 0.5  # half-pixel error everywhere
        st = tracks.append_observations(
            st, jnp.full(3, cam), ids, jnp.asarray(uv), jnp.ones(3, bool)
        )
    return st


def test_reprojection_stats():
    from structure_from_motion_tpu.utils.metrics import reprojection_stats

    stats = reprojection_stats(_tiny_state())
    assert stats["count"] == 6
    expected = np.sqrt(0.5)  # (0.5, 0.5) px offset on every observation
    assert abs(stats["mean_px"] - expected) < 1e-3
    assert abs(stats["median_px"] - expected) < 1e-3
    assert stats["p95_px"] <= stats["max_px"] + 1e-9


def test_device_timer_fetch_bounded():
    from structure_from_motion_tpu.utils.profiling import device_timer

    results = {}
    with device_timer("matmul", results):
        a = jnp.ones((256, 256))
        (a @ a).sum()
    assert "matmul" in results and results["matmul"] > 0.0


def test_plot_epipolar_lines_and_reconstruction(tmp_path):
    from structure_from_motion_tpu.utils.visualization import (
        plot_epipolar_lines,
        plot_reconstruction_xz,
    )

    rng = np.random.default_rng(0)
    img = rng.random((48, 64)).astype(np.float32)
    F = np.array([[0.0, -1e-3, 0.02], [1e-3, 0.0, -0.03], [-0.02, 0.03, 1.0]])
    pts1 = rng.uniform([5, 5], [59, 43], size=(8, 2))
    pts2 = pts1 + rng.normal(size=(8, 2))
    p1 = tmp_path / "epi.png"
    fig = plot_epipolar_lines(F, img, img, pts1, pts2, out_path=str(p1))
    assert p1.exists() and p1.stat().st_size > 1000
    import matplotlib.pyplot as plt

    plt.close(fig)

    p2 = tmp_path / "recon.png"
    locs = rng.normal(size=(4, 3))
    rots = np.tile(np.eye(3), (4, 1, 1))
    fig = plot_reconstruction_xz(locs, rots, rng.normal(size=(50, 3)), out_path=str(p2))
    assert p2.exists() and p2.stat().st_size > 1000
    plt.close(fig)

    # match visualisation (the reference's track plot analogue,
    # key_tracker.py:455-551): masked + stride-limited drawing
    from structure_from_motion_tpu.utils.visualization import plot_matches

    p3 = tmp_path / "matches.png"
    n = 500
    pts1 = rng.uniform([0, 0], [63, 47], size=(n, 2))
    pts2 = pts1 + rng.normal(size=(n, 2))
    mask = rng.random(n) > 0.3
    fig = plot_matches(
        img, img, pts1, pts2, mask=mask, out_path=str(p3), max_draw=100
    )
    assert p3.exists() and p3.stat().st_size > 1000
    plt.close(fig)


def test_features_cache_roundtrip(tmp_path):
    from structure_from_motion_tpu.utils.checkpoint import (
        load_features_cache,
        save_features_cache,
    )

    rng = np.random.default_rng(0)
    xy = rng.random((32, 2)).astype(np.float32)
    desc = rng.random((32, 128)).astype(np.float32)
    valid = rng.random(32) > 0.5
    path = str(tmp_path / "f.npz")
    save_features_cache(path, xy, desc, valid)
    xy2, desc2, valid2 = load_features_cache(path)
    np.testing.assert_array_equal(xy, xy2)
    np.testing.assert_array_equal(desc, desc2)
    np.testing.assert_array_equal(valid, valid2)


def test_nan_guard_logs(caplog):
    from structure_from_motion_tpu.utils.profiling import nan_guard

    tree = {"ok": jnp.ones(3), "bad": jnp.asarray([1.0, np.nan])}
    with caplog.at_level(logging.ERROR, logger="structure_from_motion_tpu"):
        assert nan_guard(tree, "state.") is True
    assert any("bad" in r.message for r in caplog.records)
    assert nan_guard({"ok": jnp.ones(3)}) is False


def test_profiler_trace_writes_events(tmp_path):
    """utils/profiling.trace must produce a real jax.profiler trace dir
    (viewable in TensorBoard's profile plugin)."""
    from structure_from_motion_tpu.utils.profiling import trace

    d = str(tmp_path / "trace")
    with trace(d):
        a = jnp.ones((128, 128))
        (a @ a).block_until_ready()
    files = [
        os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs
    ]
    assert files, "no trace output written"
    assert any(f.endswith((".pb", ".json.gz", ".xplane.pb")) for f in files), files
