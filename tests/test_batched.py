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
