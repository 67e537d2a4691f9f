"""Batched (vmap) multi-sequence pipeline: B reconstructions in lockstep
must each match the single-sequence result."""

import numpy as np
import jax.numpy as jnp

from structure_from_motion_tpu.models import BatchedIncrementalSfM, IncrementalSfM

from test_incremental import synthetic_sequence, umeyama_ate, pipeline_config  # noqa: F401


def test_batched_matches_single(pipeline_config):
    B = 3
    seqs = [synthetic_sequence(n_views=4, seed=s) for s in range(B)]
    K = seqs[0][0]

    eng = BatchedIncrementalSfM(pipeline_config, K, batch=B, frontend="precomputed")
    for t in range(4):
        xy = np.stack([seqs[b][1][t][0] for b in range(B)])
        d = np.stack([seqs[b][1][t][1] for b in range(B)])
        v = np.stack([seqs[b][1][t][2] for b in range(B)])
        info = eng.process_features(xy, d, v)
    locs, rots = eng.poses()
    assert locs.shape == (B, 4, 3)

    for b in range(B):
        C_gt = seqs[b][2][:4]
        ate = umeyama_ate(locs[b], C_gt)
        assert ate < 0.05, (b, ate)
        assert len(eng.map_points(b)) > 200


def test_batched_slide_matches_single(pipeline_config):
    """Sliding-window mode in the batched engine: every lane must evict in
    lockstep and produce the same full trajectory (archive + live window)
    as a single-sequence engine run with the same seed."""
    import dataclasses

    B = 2
    n_frames, window = 6, 4
    cfg = dataclasses.replace(
        pipeline_config, window_mode="slide", window_size=window,
        capacity=dataclasses.replace(pipeline_config.capacity, max_views=window),
    )
    seqs = [synthetic_sequence(n_views=n_frames, seed=10 + s) for s in range(B)]
    K = seqs[0][0]

    eng = BatchedIncrementalSfM(
        cfg, K, batch=B, frontend="precomputed", seed=[7, 8]
    )
    for t in range(n_frames):
        xy = np.stack([seqs[b][1][t][0] for b in range(B)])
        d = np.stack([seqs[b][1][t][1] for b in range(B)])
        v = np.stack([seqs[b][1][t][2] for b in range(B)])
        eng.process_features(xy, d, v)
    locs, rots = eng.poses()
    assert locs.shape == (B, n_frames, 3)

    for b in range(B):
        single = IncrementalSfM(cfg, K, frontend="precomputed", seed=7 + b)
        for t in range(n_frames):
            single.process_features(*seqs[b][1][t])
        s_locs, s_rots = single.poses()
        # same seeds -> same RANSAC draws; vmap may reorder float reductions
        # so allow small numeric drift but no structural difference
        np.testing.assert_allclose(locs[b], s_locs, atol=5e-3)
        np.testing.assert_allclose(rots[b], s_rots, atol=5e-3)
        ate = umeyama_ate(locs[b], seqs[b][2])
        assert ate < 0.05, (b, ate)
