"""Worker for the real 2-process ``jax.distributed`` test.

Launched by ``test_distributed.py`` as ``python multiproc_worker.py
<coordinator_port> <process_id> <num_processes>``. Each process owns 4
virtual CPU devices (``XLA_FLAGS=--xla_force_host_platform_device_count=4``
set by the parent), so the global runtime spans 8 devices across 2 OS
processes — the same topology as 2 TPU hosts x 4 chips, with gRPC standing
in for DCN. This is the multi-host layer the reference never had
(SURVEY.md section 5: no distributed backend anywhere).

The worker:
1. connects via ``parallel.distributed.initialize_distributed`` (the
   production init helper — this test is what keeps it honest),
2. builds the production 2-D (host, chip) mesh via ``make_mesh_2d``,
3. runs ``sharded_bundle_adjustment`` with points and observations sharded
   across BOTH processes (global arrays assembled shard-by-shard with
   ``jax.make_array_from_callback``),
4. compares the replicated camera solution and costs against a local
   single-device ``run_bundle_adjustment``, prints ``MULTIPROC-OK``.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main() -> None:
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "windowed"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    from structure_from_motion_tpu.parallel.distributed import (
        initialize_distributed,
        process_topology,
    )

    ok = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert ok, "initialize_distributed returned False in a 2-process run"
    assert jax.process_count() == nproc, jax.process_count()
    n_hosts, per_host = process_topology()
    assert n_hosts == nproc and per_host == 4, (n_hosts, per_host)
    assert jax.device_count() == nproc * 4, jax.device_count()

    if mode == "global":
        # VERDICT r4 item 7: the WHOLE-TRAJECTORY solve (models/global_ba.
        # solve_global) under the real 2-process runtime — its multi-host
        # branch assembles global arrays shard-by-shard and shard_maps the
        # Schur-LM across both processes, then all-gathers the refined map.
        # Parity anchor: the same problem solved by the single-device
        # tiered-ELL path inside this very process.
        from structure_from_motion_tpu.config import BAConfig
        from structure_from_motion_tpu.models.global_ba import (
            GlobalProblem,
            solve_global,
        )

        from test_ba import make_scene, perturb

        clean, obs, _K = make_scene(cap_m=128, cap_o=1024)
        noisy = perturb(clean)
        n_obs = int(np.asarray(obs.valid).sum())
        counts = np.bincount(
            np.asarray(obs.point)[np.asarray(obs.valid)], minlength=128
        )
        problem = GlobalProblem(
            state=noisy,
            obs=obs,
            gids=np.arange(128),
            n_cams=int(noisy.C.shape[0]),
            n_points=128,
            n_obs=n_obs,
            max_track_len=int(counts.max()),
        )
        cfg = BAConfig(damping=5.0, fix_first_camera_gauge=True)
        ref_out, ref_costs = solve_global(problem, cfg, iterations=6, num_shards=1)
        out, costs = solve_global(problem, cfg, iterations=6, num_shards=8)

        np.testing.assert_allclose(
            np.asarray(out.C), np.asarray(ref_out.C), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(out.q), np.asarray(ref_out.q), atol=1e-7
        )
        rel = np.max(
            np.abs(costs - ref_costs) / np.maximum(np.abs(ref_costs), 1e-12)
        )
        assert rel < 1e-6, rel
        assert costs[-1] <= costs[0], costs
        print(
            f"MULTIPROC-OK pid={pid} devices={jax.device_count()} "
            f"mode=global rel={rel:.2e}",
            flush=True,
        )
        return

    from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

    from structure_from_motion_tpu.config import BAConfig
    from structure_from_motion_tpu.ops.ba import (
        BAObservations,
        BAState,
        run_bundle_adjustment,
    )
    from structure_from_motion_tpu.parallel import (
        partition_observations,
        sharded_bundle_adjustment,
    )
    from structure_from_motion_tpu.parallel.mesh import make_mesh_2d

    from test_ba import make_scene, perturb

    mesh = make_mesh_2d(n_hosts, per_host)
    n_shards = mesh.devices.size

    # identical synthetic scene in every process (make_scene is seeded)
    clean, obs, _K = make_scene(cap_m=128, cap_o=1024)
    noisy = perturb(clean)
    cfg = BAConfig(iterations=6, damping=5.0, fix_first_camera_gauge=True)

    # single-device reference on this process's local devices
    ref_state, ref_costs = run_bundle_adjustment(noisy, obs, cfg)

    part = partition_observations(
        obs, num_points=128, num_shards=n_shards, per_shard_capacity=128
    )

    def to_global(host_val, spec):
        arr = np.asarray(host_val)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    shard = P(tuple(mesh.axis_names))
    rep = P()
    g_state = BAState(
        C=to_global(noisy.C, rep),
        q=to_global(noisy.q, rep),
        X=to_global(noisy.X, shard),
        cam_valid=to_global(noisy.cam_valid, rep),
        pt_valid=to_global(noisy.pt_valid, shard),
    )
    g_obs = BAObservations(
        cam=to_global(part.cam, shard),
        point=to_global(part.point, shard),
        uv_norm=to_global(part.uv_norm, shard),
        valid=to_global(part.valid, shard),
    )

    out, costs = sharded_bundle_adjustment(g_state, g_obs, cfg, mesh)

    # replicated outputs are locally addressable in every process
    C_out = np.asarray(out.C.addressable_data(0))
    q_out = np.asarray(out.q.addressable_data(0))
    costs_np = np.asarray(costs.addressable_data(0))

    np.testing.assert_allclose(C_out, np.asarray(ref_state.C), atol=1e-8)
    np.testing.assert_allclose(q_out, np.asarray(ref_state.q), atol=1e-8)
    np.testing.assert_allclose(costs_np, np.asarray(ref_costs), rtol=1e-6)
    assert costs_np[-1] <= costs_np[0], costs_np

    print(f"MULTIPROC-OK pid={pid} devices={jax.device_count()}", flush=True)


if __name__ == "__main__":
    main()
