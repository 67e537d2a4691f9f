"""BASELINE config 5: distributed bundle adjustment over a 1000-frame
trajectory.

Builds a realistic sparse BA problem — 1000 cameras on a smooth loop,
32k points, each point observed by a consecutive run of ~8 cameras (the
visibility pattern a sliding-window tracker produces) — and solves it with
the distributed Schur-LM engine: points + observations sharded over the
mesh, cameras replicated, matrix-free block-Jacobi PCG for the reduced
camera system (V=1000 is far past the dense-solve regime), one psum per CG
iteration.

Runs on the virtual CPU mesh (1/2/4/8 shards, including the 2-hosts x
4-chips 2-D layout that models the multi-host DCN/ICI split) and reports
the serialized-mesh parallel efficiency (see examples/ba_scaling.py for
the measurement model: one physical core serializes the shards, so
efficiency = t_1 / t_S). Artifact: DISTBA1000_r02.json.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/run_distributed_ba_1000.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from structure_from_motion_tpu.config import BAConfig  # noqa: E402
from structure_from_motion_tpu.ops.ba import (  # noqa: E402
    BAObservations,
    BAState,
    total_reprojection_cost,
)
from structure_from_motion_tpu.parallel import (  # noqa: E402
    interleave_points,
    make_mesh,
    make_mesh_2d,
    partition_observations,
    sharded_bundle_adjustment,
)
from structure_from_motion_tpu.utils.rotations import (  # noqa: E402
    quat_to_rotation,
    rotation_to_quat,
)


def trajectory_problem(V=1000, M=32768, track_len=8, seed=0, noise=2e-3,
                       pose_noise=0.01):
    """Sparse sliding-window-style BA problem: camera v sees the points
    whose track windows cover v. O = M * track_len exactly."""
    rng = np.random.default_rng(seed)
    # smooth loop trajectory
    th = np.linspace(0, 2 * np.pi, V, endpoint=False)
    Cs = np.stack([10 * np.cos(th), 0.5 * np.sin(3 * th), 10 * np.sin(th)], 1)
    # cameras look outward along the tangent
    Rs = []
    for v in range(V):
        fwd = np.array([-np.sin(th[v]), 0.0, np.cos(th[v])])
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        Rs.append(np.stack([right, np.cross(fwd, right), fwd], 1))
    Rs = np.stack(Rs).astype(np.float32)
    qs = np.asarray(rotation_to_quat(jnp.asarray(Rs))).astype(np.float32)

    # each point anchors to a camera and sits in front of it
    anchor = rng.integers(0, V - track_len, M)
    depth = rng.uniform(4.0, 12.0, M)
    lateral = rng.uniform(-2.0, 2.0, (M, 2))
    X = (
        Cs[anchor]
        + depth[:, None] * Rs[anchor, :, 2]
        + lateral[:, 0:1] * Rs[anchor, :, 0]
        + lateral[:, 1:2] * Rs[anchor, :, 1]
    ).astype(np.float32)

    obs_pt = np.repeat(np.arange(M), track_len)
    obs_cam = (anchor[:, None] + np.arange(track_len)[None, :]).reshape(-1)
    O = len(obs_pt)

    d = X[obs_pt] - Cs[obs_cam]
    xc = np.einsum("oji,oj->oi", Rs[obs_cam], d)
    uvn = xc[:, :2] / np.maximum(xc[:, 2:3], 1e-3)
    uvn = (uvn + rng.normal(size=uvn.shape) * noise).astype(np.float32)

    # perturb the poses + points: BA has real work to do
    Cs_n = Cs + rng.normal(size=Cs.shape) * pose_noise
    qs_n = qs + rng.normal(size=qs.shape).astype(np.float32) * pose_noise * 0.3
    qs_n /= np.linalg.norm(qs_n, axis=1, keepdims=True)
    X_n = X + rng.normal(size=X.shape) * pose_noise * 3

    state = BAState(
        C=jnp.asarray(Cs_n, jnp.float32),
        q=jnp.asarray(qs_n, jnp.float32),
        X=jnp.asarray(X_n, jnp.float32),
        cam_valid=jnp.ones(V, bool),
        pt_valid=jnp.ones(M, bool),
    )
    obs = BAObservations(
        cam=jnp.asarray(obs_cam, jnp.int32),
        point=jnp.asarray(obs_pt, jnp.int32),
        uv_norm=jnp.asarray(uvn),
        valid=jnp.ones(O, bool),
    )
    return state, obs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=1000)
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--track-len", type=int, default=8)
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "DISTBA1000_r02.json",
        ),
    )
    args = ap.parse_args()

    V, M = args.views, args.points
    state, obs = trajectory_problem(V=V, M=M, track_len=args.track_len)
    O = obs.cam.shape[0]
    cfg = BAConfig(
        iterations=args.iterations, damping=5.0, huber_delta=0.01,
        fix_first_camera_gauge=True,
        pcg_fallback_cameras=256,  # V=1000 -> matrix-free PCG
        pcg_iterations=64,
    )
    cost0 = float(total_reprojection_cost(state, obs))

    n_dev = len(jax.devices())
    meshes = {s: make_mesh(s) for s in (1, 2, 4, 8) if s <= n_dev}
    if n_dev >= 8:
        meshes["2x4"] = make_mesh_2d(2, 4)  # hosts x chips layout

    times, finals = {}, {}
    for name, mesh in meshes.items():
        S = int(mesh.devices.size)
        part = partition_observations(
            obs, num_points=M, num_shards=S, per_shard_capacity=O // S,
            interleave=True,
        )
        assert int(part.valid.sum()) == int(obs.valid.sum()), "partition overflow"
        st = state._replace(
            X=interleave_points(state.X, S),
            pt_valid=interleave_points(state.pt_valid, S),
        )
        fn = jax.jit(lambda s, o, mesh=mesh: sharded_bundle_adjustment(s, o, cfg, mesh))
        out, costs = fn(st, part)
        float(costs[-1])  # compile + fetch barrier
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out, costs = fn(st, part)
            float(costs[-1])
            best = min(best, time.perf_counter() - t0)
        times[name] = best
        from structure_from_motion_tpu.parallel import deinterleave_points

        # un-permute X so the cost evaluates against original obs indexing
        out_g = out._replace(X=deinterleave_points(out.X, S))
        finals[name] = float(total_reprojection_cost(out_g, obs))
        print(
            f"shards={name}: {best:.2f}s ({best*1e3/args.iterations:.0f} ms/LM-iter), "
            f"cost {cost0:.4f} -> {finals[name]:.6f}"
        )

    t1 = times[1]
    report = {
        "config": "BASELINE configs[4]: 1000-frame distributed BA",
        "problem": {
            "views": V, "points": M, "observations": int(O),
            "track_len": args.track_len, "lm_iterations": args.iterations,
            "solver": "matrix-free block-Jacobi PCG (V > pcg_fallback_cameras)",
        },
        "host": {
            "physical_cores": len(os.sched_getaffinity(0)),
            "virtual_devices": n_dev,
        },
        "method": (
            "Serialized virtual mesh on one physical core: parallel "
            "efficiency = t_1 / t_S (see examples/ba_scaling.py)."
        ),
        "serialized_seconds": {str(k): v for k, v in times.items()},
        "parallel_efficiency": {str(k): t1 / v for k, v in times.items()},
        "initial_cost": cost0,
        "final_cost": {str(k): v for k, v in finals.items()},
        # the checks that matter: the optimiser makes real progress in the
        # iteration budget, and every sharding computes the SAME answer
        # (determinism-across-shardings, this project's sanitizer)
        "cost_reduction_x": cost0 / max(finals.values()),
        "max_cost_spread_across_shardings": max(finals.values()) - min(finals.values()),
        "consistent_across_shardings": (
            (max(finals.values()) - min(finals.values())) < 1e-3 * cost0
        ),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in ("parallel_efficiency", "consistent_across_shardings")}, indent=2))
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
