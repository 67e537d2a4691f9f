"""BASELINE config 5, true multi-process edition: the 1000-camera sparse
distributed BA of ``run_distributed_ba_1000.py`` executed across TWO OS
processes connected by ``jax.distributed`` (2 processes x 4 virtual CPU
devices = the 2-hosts x 4-chips mesh with gRPC standing in for DCN).

Where ``run_distributed_ba_1000.py`` serializes the 8-device mesh inside
one process, this driver exercises every real multi-host mechanism: the
coordinator handshake (``parallel.distributed.initialize_distributed``),
global arrays assembled from per-process shards, and cross-process psum
of the reduced camera system inside the PCG loop. The final cost must
match the single-device solve computed independently in each worker.

Artifact: DISTBA1000_MP_r02.json.

Usage (launcher spawns its own workers):
    python examples/run_distributed_ba_1000_mp.py [--iterations 5]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC, DEV_PER_PROC = 2, 4


def worker(port: int, pid: int, iterations: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "examples"))

    from structure_from_motion_tpu.parallel.distributed import (
        initialize_distributed,
        process_topology,
    )

    assert initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROC,
        process_id=pid,
    ), "distributed init failed"
    n_hosts, per_host = process_topology()
    assert (n_hosts, per_host) == (N_PROC, DEV_PER_PROC)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from run_distributed_ba_1000 import trajectory_problem
    from structure_from_motion_tpu.config import BAConfig
    from structure_from_motion_tpu.ops.ba import (
        BAObservations,
        BAState,
        run_bundle_adjustment,
        total_reprojection_cost,
    )
    from structure_from_motion_tpu.parallel import (
        deinterleave_points,
        interleave_points,
        make_mesh_2d,
        partition_observations,
        sharded_bundle_adjustment,
    )

    V, M = 1000, 32768
    state, obs = trajectory_problem(V=V, M=M, track_len=8)
    O = int(obs.cam.shape[0])
    cfg = BAConfig(
        iterations=iterations, damping=5.0, huber_delta=0.01,
        fix_first_camera_gauge=True,
        pcg_fallback_cameras=256,
        pcg_iterations=64,
    )
    cost0 = float(total_reprojection_cost(state, obs))

    # independent single-device reference (local devices only)
    ref_out, _ = run_bundle_adjustment(state, obs, cfg)
    ref_final = float(total_reprojection_cost(ref_out, obs))

    mesh = make_mesh_2d(n_hosts, per_host)
    S = int(mesh.devices.size)
    part = partition_observations(
        obs, num_points=M, num_shards=S, per_shard_capacity=O // S,
        interleave=True,
    )
    assert int(part.valid.sum()) == int(obs.valid.sum()), "partition overflow"
    Xi = interleave_points(state.X, S)
    pvi = interleave_points(state.pt_valid, S)

    def to_global(host_val, spec):
        arr = np.asarray(host_val)
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
        )

    shard, rep = P(tuple(mesh.axis_names)), P()
    g_state = BAState(
        C=to_global(state.C, rep),
        q=to_global(state.q, rep),
        X=to_global(Xi, shard),
        cam_valid=to_global(state.cam_valid, rep),
        pt_valid=to_global(pvi, shard),
    )
    g_obs = BAObservations(
        cam=to_global(part.cam, shard),
        point=to_global(part.point, shard),
        uv_norm=to_global(part.uv_norm, shard),
        valid=to_global(part.valid, shard),
    )

    fn = jax.jit(lambda s, o: sharded_bundle_adjustment(s, o, cfg, mesh))
    out, costs = fn(g_state, g_obs)
    float(np.asarray(costs.addressable_data(0))[-1])  # compile + barrier
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out, costs = fn(g_state, g_obs)
        float(np.asarray(costs.addressable_data(0))[-1])
        best = min(best, time.perf_counter() - t0)

    # X comes back sharded across both processes; gather the local shards'
    # global view via the replicated-cost path: rebuild a host-global X
    # from process-local shards + an allgather through a replicated output
    from jax.experimental import multihost_utils

    X_full = multihost_utils.process_allgather(out.X, tiled=True)
    out_host = BAState(
        C=np.asarray(out.C.addressable_data(0)),
        q=np.asarray(out.q.addressable_data(0)),
        X=deinterleave_points(np.asarray(X_full), S),
        cam_valid=state.cam_valid,
        pt_valid=state.pt_valid,
    )
    final = float(total_reprojection_cost(out_host, obs))
    rel_gap = abs(final - ref_final) / max(ref_final, 1e-9)
    assert rel_gap < 1e-4, (final, ref_final)

    if pid == 0:
        report = {
            "config": "BASELINE configs[4]: 1000-frame distributed BA, "
            "TRUE 2-process jax.distributed runtime",
            "problem": {
                "views": V, "points": M, "observations": O,
                "track_len": 8, "lm_iterations": iterations,
                "solver": "matrix-free block-Jacobi PCG, psum across the "
                "process boundary every CG iteration",
            },
            "runtime": {
                "processes": N_PROC,
                "devices_per_process": DEV_PER_PROC,
                "mesh": "(host=2, chip=4)",
                "transport": "gRPC between OS processes (the DCN stand-in)",
                "physical_cores": len(os.sched_getaffinity(0)),
            },
            "wall_seconds_best_of_2": best,
            "ms_per_lm_iteration": best * 1e3 / iterations,
            "initial_cost": cost0,
            "final_cost_distributed": final,
            "final_cost_single_device": ref_final,
            "relative_gap": rel_gap,
            "note": "2 processes share ONE physical core here, so wall "
            "time measures correctness overhead, not speedup; see "
            "DISTBA1000_r02.json for the serialized-mesh efficiency model.",
        }
        print("ARTIFACT:" + json.dumps(report), flush=True)
    print(f"MP1000-OK pid={pid} final={final:.6f} ref={ref_final:.6f}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "DISTBA1000_MP_r02.json")
    )
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.port, args.worker, args.iterations)
        return 0

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(pid), "--port", str(port),
             "--iterations", str(args.iterations)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(N_PROC)
    ]
    outs = [p.communicate(timeout=3600)[0] for p in procs]
    ok = True
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or f"MP1000-OK pid={pid}" not in out:
            ok = False
            print(f"--- process {pid} FAILED ---\n{out}")
    for out in outs:
        for line in out.splitlines():
            if line.startswith("ARTIFACT:"):
                report = json.loads(line[len("ARTIFACT:"):])
                with open(args.out, "w") as f:
                    json.dump(report, f, indent=1)
                print(f"wrote {args.out}")
            elif "MP1000-OK" in line:
                print(line)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
