"""AOT export / serving (structure_from_motion_tpu.serve).

The pipeline is fixed-shape by design, which makes every device program
exportable with ``jax.export``: an artifact pins config + StableHLO and a
served engine never re-traces the geometry stack. The reference has no
deployment story (its runtime is re-running the Python script).
"""

import numpy as np
import pytest

from test_incremental import synthetic_sequence, umeyama_ate

from structure_from_motion_tpu.config import (
    CapacityConfig,
    FrontendConfig,
    MatcherConfig,
    PipelineConfig,
)
from structure_from_motion_tpu.models import IncrementalSfM
from structure_from_motion_tpu.serve import (
    enable_compilation_cache,
    export_engine,
    load_engine,
)


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


def test_export_load_reproduces_live_engine(tmp_path):
    K, frames, C_gt, *_ = synthetic_sequence(n_views=4, n_points=300)

    live = IncrementalSfM(_cfg(), K, frontend="precomputed", seed=0)
    path = str(tmp_path / "pipeline.sfm.npz")
    sizes = export_engine(live, path)
    assert set(sizes) == {"frame_step", "evict", "reproj", "finalize"}
    assert all(s > 1000 for s in sizes.values()), sizes

    served = load_engine(path, seed=0)
    for f in frames:
        live.process_features(*f)
        served.process_features(*f)

    # same platform, same program, same seed: trajectories match bitwise
    np.testing.assert_array_equal(
        np.asarray(live.state.cam_C), np.asarray(served.state.cam_C)
    )
    np.testing.assert_array_equal(
        np.asarray(live.state.points), np.asarray(served.state.points)
    )
    assert float(served.reprojection_error()) == pytest.approx(
        float(live.reprojection_error())
    )
    ate = umeyama_ate(np.asarray(served.poses()[0]), C_gt)
    assert ate < 0.03, ate

    # the exported finalize (10-iteration BA polish) runs and helps/holds
    costs = served.finalize()
    assert costs.shape == (10,)
    assert float(served.reprojection_error()) <= float(live.reprojection_error()) + 1e-5


def test_served_slide_mode_evicts(tmp_path):
    import dataclasses

    K, frames, C_gt, *_ = synthetic_sequence(n_views=6, n_points=250)
    cfg = dataclasses.replace(_cfg(), window_size=4, window_mode="slide")
    live = IncrementalSfM(cfg, K, frontend="precomputed", seed=0)
    path = str(tmp_path / "pipeline.sfm.npz")
    export_engine(live, path)
    served = load_engine(path, seed=0)
    for f in frames:
        served.process_features(*f)
    locs, _ = served.poses()
    assert len(locs) == 6  # archive + live window
    assert umeyama_ate(np.asarray(locs), C_gt) < 0.08


def test_artifact_is_self_describing(tmp_path):
    import json

    K, *_ = synthetic_sequence(n_views=3)
    live = IncrementalSfM(_cfg(), K, frontend="precomputed", seed=0)
    path = str(tmp_path / "pipeline.sfm.npz")
    export_engine(live, path)
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta"]).decode())
    assert meta["format_version"] == 1
    assert meta["frontend"] == "precomputed"
    assert meta["config"]["capacity"]["max_keypoints"] == 512
    assert "cpu" in meta["platforms"] or "tpu" in meta["platforms"]


def test_compilation_cache_round_trip(tmp_path):
    import jax
    import jax.numpy as jnp

    cache = str(tmp_path / "xla_cache")
    enable_compilation_cache(cache)
    try:

        @jax.jit
        def g(x):
            return (x @ x).sum() * 3.0

        float(g(jnp.eye(64)))
        # the persistent cache wrote at least one executable
        entries = []
        for root, _, files in __import__("os").walk(cache):
            entries += files
        assert entries, "compilation cache wrote nothing"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
