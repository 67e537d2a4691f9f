"""Distributed BA tests on the virtual 8-device CPU mesh.

Determinism-across-shardings is this project's sanitizer substitute
(SURVEY.md section 5): 1-device and 8-device BA must agree to reduction-
order tolerance."""

import numpy as np
import jax
import pytest
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


def test_sharded_2d_mesh_hosts_by_chips():
    """Multi-host layout: a (2 hosts, 4 chips) 2-D mesh must reproduce the
    single-device optimum — the psum of the reduced camera system spans
    both mesh axes (ICI within a host row, DCN across rows)."""
    from structure_from_motion_tpu.parallel import make_mesh_2d

    clean, obs, K = make_scene(cap_m=128, cap_o=1024)
    noisy = perturb(clean, seed=3)
    cfg = BAConfig(iterations=8, damping=5.0, fix_first_camera_gauge=True)
    out_single, costs_single = run_bundle_adjustment(noisy, obs, cfg)

    mesh = make_mesh_2d(2, 4)
    assert mesh.devices.shape == (2, 4)
    part = partition_observations(
        obs, num_points=128, num_shards=8, per_shard_capacity=128
    )
    out_shard, costs_shard = sharded_bundle_adjustment(noisy, part, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(costs_shard), np.asarray(costs_single), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_shard.C), np.asarray(out_single.C), atol=1e-8
    )


def test_interleaved_partition_matches_single_device():
    """Round-robin point placement (the balanced layout the pipeline uses
    for sequentially allocated map ids) must reproduce the block-partition
    result: permute X/pt_valid with interleave_points, run sharded BA,
    un-permute."""
    from structure_from_motion_tpu.parallel import (
        deinterleave_points,
        interleave_points,
    )

    clean, obs, K = make_scene(cap_m=128, cap_o=1024)
    noisy = perturb(clean, seed=11)
    cfg = BAConfig(iterations=8, damping=5.0, fix_first_camera_gauge=True)
    out_single, costs_single = run_bundle_adjustment(noisy, obs, cfg)

    S = 8
    mesh = make_mesh(S)
    part = partition_observations(
        obs, num_points=128, num_shards=S, per_shard_capacity=128,
        interleave=True,
    )
    assert int(part.valid.sum()) == int(obs.valid.sum())
    noisy_p = noisy._replace(
        X=interleave_points(noisy.X, S),
        pt_valid=interleave_points(noisy.pt_valid, S),
    )
    out_shard, costs_shard = sharded_bundle_adjustment(noisy_p, part, cfg, mesh)
    X_back = deinterleave_points(out_shard.X, S)
    np.testing.assert_allclose(
        np.asarray(costs_shard), np.asarray(costs_single), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_shard.C), np.asarray(out_single.C), atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(X_back), np.asarray(out_single.X), atol=1e-8)


def test_interleave_points_roundtrip():
    from structure_from_motion_tpu.parallel import (
        deinterleave_points,
        interleave_points,
    )

    x = jnp.arange(24.0).reshape(12, 2)
    for s in (1, 2, 3, 4, 6):
        y = interleave_points(x, s)
        np.testing.assert_array_equal(np.asarray(deinterleave_points(y, s)), np.asarray(x))
    # shard 1 of 4 owns global ids 1, 5, 9 at local offsets 0, 1, 2
    y = np.asarray(interleave_points(x, 4))
    np.testing.assert_array_equal(y[3:6], np.asarray(x)[[1, 5, 9]])


def test_pipeline_with_sharded_ba_matches_single_device():
    """End-to-end: the flagship IncrementalSfM run with ba_num_shards=8
    (distributed Schur LM inside the fused frame program) must reproduce
    the single-device reconstruction to reduction-order tolerance."""
    import dataclasses

    from structure_from_motion_tpu.models import IncrementalSfM
    from test_incremental import synthetic_sequence
    from structure_from_motion_tpu.config import (
        BAConfig as _BAConfig,
        CapacityConfig,
        FrontendConfig,
        LMConfig,
        MatcherConfig,
        PipelineConfig,
        RansacConfig,
    )

    cfg = PipelineConfig(
        frontend=FrontendConfig(max_keypoints=256, upsample_first_octave=False),
        matcher=MatcherConfig(ratio=0.9),
        fundamental_ransac=RansacConfig(inlier_threshold=2.0, iteration=128),
        pnp_ransac=RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=256),
        pnp_lm=LMConfig(damping=5.0, iterations=50),
        triangulation_lm=LMConfig(damping=5.0, iterations=25),
        ba=_BAConfig(iterations=3, damping=5.0),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=256, max_points=1024, max_observations=4096
        ),
    )
    K, frames, C_gt, *_ = synthetic_sequence(n_views=4, n_points=200, kp_cap=256)

    single = IncrementalSfM(cfg, K, frontend="precomputed", seed=0)
    sharded = IncrementalSfM(
        dataclasses.replace(cfg, ba_num_shards=8), K, frontend="precomputed", seed=0
    )
    for f in frames:
        i1 = single.process_features(*f)
        i8 = sharded.process_features(*f)
        assert int(i8.get("ba_dropped_obs", 0)) == 0
    np.testing.assert_allclose(
        np.asarray(sharded.state.cam_C),
        np.asarray(single.state.cam_C),
        atol=1e-4,
    )
    assert int(sharded.state.num_points) == int(single.state.num_points)
    assert abs(sharded.reprojection_error() - single.reprojection_error()) < 1e-3
    # and both actually solve the scene
    from test_incremental import umeyama_ate

    locs, _ = sharded.poses()
    assert umeyama_ate(locs, C_gt[: len(locs)]) < 0.05


def test_sharded_pcg_matches_single_device():
    """Sharded matrix-free PCG (the large-V path) against the single-device
    dense solve."""
    clean, obs, K = make_scene(cap_m=128, cap_o=1024)
    noisy = perturb(clean, seed=5)
    dense_cfg = BAConfig(iterations=10, damping=5.0, fix_first_camera_gauge=True)
    pcg_cfg = BAConfig(
        iterations=10,
        damping=5.0,
        fix_first_camera_gauge=True,
        pcg_fallback_cameras=1,
        pcg_iterations=128,
    )
    out_single, _ = run_bundle_adjustment(noisy, obs, dense_cfg)

    mesh = make_mesh(8)
    part = partition_observations(obs, num_points=128, num_shards=8, per_shard_capacity=128)
    out_shard, _ = sharded_bundle_adjustment(noisy, part, pcg_cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(out_shard.C)[:4], np.asarray(out_single.C)[:4], atol=5e-3
    )
    assert float(total_reprojection_cost(out_shard, obs)) < 1e-3 * float(
        total_reprojection_cost(noisy, obs)
    )


@pytest.mark.slow
def test_scale_sharded_pcg_parity_8k_points():
    """Scale-grade shard parity (VERDICT r2 item 5): 256 cameras / 8192
    points / ~52k power-law observations — large enough that the PCG
    large-V path runs UNDER psum on all 8 devices, with hot points
    stressing the interleaved partition. Asserts (a) single-device vs
    8-device cost-trajectory and camera parity, (b) the ELL packed layout
    reproduces the CSR stream at this scale on a single device."""
    import __graft_entry__ as ge

    clean, obs = ge._synthetic_ba_problem(
        n_views=256, n_points=8192, cap_v=256, cap_m=8192, cap_o=65536,
        seed=11, powerlaw=True,
    )
    # start from the clean synthetic state: its 1e-3 observation noise
    # already makes the problem nontrivial, and at this scale a pose
    # perturbation would need its own convergence study
    base = dict(
        iterations=4, damping=5.0, fix_first_camera_gauge=True,
        pcg_fallback_cameras=64, pcg_iterations=96,
    )
    csr_cfg = BAConfig(obs_layout="csr", **base)
    counts = np.bincount(
        np.asarray(obs.point)[np.asarray(obs.valid)], minlength=8192
    )
    ell_cfg = BAConfig(ell_rows=int(counts.max()), **base)

    out_csr, costs_csr = run_bundle_adjustment(clean, obs, csr_cfg)
    out_ell, costs_ell = run_bundle_adjustment(clean, obs, ell_cfg)
    # (b) layout equivalence: same math, different packing
    # f32 state: differences are pure reduction order (~1e-7 relative)
    np.testing.assert_allclose(
        np.asarray(costs_ell), np.asarray(costs_csr), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_ell.C), np.asarray(out_csr.C), atol=5e-4
    )

    # (a) 8-device sharded PCG vs single device
    mesh = make_mesh(8)
    part = partition_observations(
        obs, num_points=8192, num_shards=8, per_shard_capacity=12288,
        interleave=True,
    )
    assert int(part.valid.sum()) == int(obs.valid.sum())  # no bucket overflow
    from structure_from_motion_tpu.parallel import (
        deinterleave_points,
        interleave_points,
    )

    st_p = clean._replace(
        X=interleave_points(clean.X, 8),
        pt_valid=interleave_points(clean.pt_valid, 8),
    )
    out_shard, costs_shard = sharded_bundle_adjustment(st_p, part, csr_cfg, mesh)
    out_shard = out_shard._replace(X=deinterleave_points(out_shard.X, 8))
    np.testing.assert_allclose(
        np.asarray(costs_shard), np.asarray(costs_csr), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_shard.C), np.asarray(out_csr.C), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_shard.X)[:8192], np.asarray(out_csr.X)[:8192], atol=5e-4
    )
    # the solve made progress (not a no-op parity)
    assert float(costs_csr[-1]) < float(costs_csr[0])
