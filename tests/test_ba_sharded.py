"""Distributed BA tests on the virtual 8-device CPU mesh.

Determinism-across-shardings is this project's sanitizer substitute
(SURVEY.md section 5): 1-device and 8-device BA must agree to reduction-
order tolerance."""

import numpy as np
import jax
import jax.numpy as jnp

from structure_from_motion_tpu.config import BAConfig
from structure_from_motion_tpu.ops.ba import (
    BAObservations,
    run_bundle_adjustment,
    total_reprojection_cost,
)
from structure_from_motion_tpu.parallel import (
    make_mesh,
    partition_observations,
    sharded_bundle_adjustment,
)

from test_ba import make_scene, perturb


def test_partition_observations_routing():
    _, obs, _ = make_scene(cap_m=128, cap_o=1024)
    part = partition_observations(obs, num_points=128, num_shards=8, per_shard_capacity=128)
    assert part.cam.shape == (1024,)
    # same number of valid observations survive
    assert int(part.valid.sum()) == int(obs.valid.sum())
    # every valid obs sits in the bucket of its point's shard with local idx
    pts_per_shard = 128 // 8
    v = np.asarray(part.valid)
    pt = np.asarray(part.point)
    for s in range(8):
        seg = slice(s * 128, (s + 1) * 128)
        assert (pt[seg][v[seg]] < pts_per_shard).all()
    # reconstruct global points and compare multisets of (cam, global_pt)
    got = set()
    for s in range(8):
        seg = slice(s * 128, (s + 1) * 128)
        for c, p, ok in zip(np.asarray(part.cam)[seg], pt[seg], v[seg]):
            if ok:
                got.add((int(c), int(p) + s * pts_per_shard))
    want = {
        (int(c), int(p))
        for c, p, ok in zip(
            np.asarray(obs.cam), np.asarray(obs.point), np.asarray(obs.valid)
        )
        if ok
    }
    assert got == want


def test_sharded_matches_single_device():
    clean, obs, K = make_scene(cap_m=128, cap_o=1024)
    noisy = perturb(clean)
    cfg = BAConfig(iterations=8, damping=5.0, fix_first_camera_gauge=True)

    out_single, costs_single = run_bundle_adjustment(noisy, obs, cfg)

    mesh = make_mesh(8)
    part = partition_observations(obs, num_points=128, num_shards=8, per_shard_capacity=128)
    out_shard, costs_shard = sharded_bundle_adjustment(noisy, part, cfg, mesh)

    np.testing.assert_allclose(
        np.asarray(costs_shard), np.asarray(costs_single), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_shard.C), np.asarray(out_single.C), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_shard.q), np.asarray(out_single.q), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_shard.X), np.asarray(out_single.X), atol=1e-8
    )
    # and it actually converged
    assert float(total_reprojection_cost(out_shard, obs)) < 1e-3 * float(
        total_reprojection_cost(noisy, obs)
    )


def test_sharded_jit_compiles_once_and_runs():
    clean, obs, K = make_scene(cap_m=128, cap_o=1024)
    noisy = perturb(clean, seed=7)
    cfg = BAConfig(iterations=3, damping=5.0)
    mesh = make_mesh(4)
    part = partition_observations(obs, num_points=128, num_shards=4, per_shard_capacity=256)
    out, costs = jax.jit(
        lambda s, o: sharded_bundle_adjustment(s, o, cfg, mesh)
    )(noisy, part)
    assert np.isfinite(np.asarray(costs)).all()
    assert float(costs[-1]) < float(costs[0])
