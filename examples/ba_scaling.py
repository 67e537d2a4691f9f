"""Distributed-BA scaling measurement (BASELINE.json config 5).

Runs the sharded Schur-complement LM bundle adjustment over 1/2/4/8-device
meshes on a production-scale synthetic problem and writes a scaling JSON.

Measurement model — READ THIS BEFORE TRUSTING THE NUMBERS:

This container exposes ONE physical CPU core, so the 8 virtual XLA host
devices time-slice a single core and wall-clock can never speed up. What a
serialized mesh CAN measure honestly is the *total work + communication*
the sharded program performs: ``t_S`` (wall time of the S-shard program on
one core) is the sum of all shards' compute plus all collective overhead.
On hardware where shards genuinely run in parallel (a real TPU slice), the
per-step wall time is ~``t_S / S``, so

    parallel_efficiency(S) = ideal_time / actual_time
                           = (t_1 / S) / (t_S / S) = t_1 / t_S.

i.e. efficiency is the inverse of the sharding work-overhead. That is the
number reported here, alongside the raw serialized times and the psum
payload per LM iteration (which is independent of the point/observation
count — the design's scaling argument). Single-chip absolute BA throughput
on the real TPU comes from ``bench.py``.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/ba_scaling.py [--out SCALING.json]
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

import numpy as np  # noqa: E402

from structure_from_motion_tpu.config import BAConfig  # noqa: E402
from structure_from_motion_tpu.parallel import (  # noqa: E402
    interleave_points,
    make_mesh,
    partition_observations,
    sharded_bundle_adjustment,
)
from __graft_entry__ import _synthetic_ba_problem  # noqa: E402


def time_config(state, obs, cfg, n_shards, cap_m, cap_o, repeats=3):
    mesh = make_mesh(n_shards)
    part = partition_observations(
        obs, num_points=cap_m, num_shards=n_shards,
        per_shard_capacity=cap_o // n_shards, interleave=True,
    )
    st = state._replace(
        X=interleave_points(state.X, n_shards),
        pt_valid=interleave_points(state.pt_valid, n_shards),
    )
    assert int(part.valid.sum()) == int(obs.valid.sum()), "partition overflow"

    fn = jax.jit(lambda s, o: sharded_bundle_adjustment(s, o, cfg, mesh))
    out, costs = fn(st, part)
    float(costs[-1])  # warm-up + fetch barrier (block_until_ready lies here)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, costs = fn(st, part)
        c = float(costs[-1])  # device->host fetch = honest barrier
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(c)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING_r02.json"))
    ap.add_argument("--views", type=int, default=32)
    # every point is observed by every view, so obs = views * points must
    # fit cap-obs exactly (the generator truncates past capacity)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--cap-points", type=int, default=8192)
    ap.add_argument("--obs", type=int, default=65536)
    ap.add_argument("--iterations", type=int, default=5)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    shard_counts = [s for s in (1, 2, 4, 8) if s <= n_dev]
    V, M, O = args.views, args.cap_points, args.obs
    assert args.views * args.points == args.obs, "size obs = views * points"
    state, obs = _synthetic_ba_problem(
        n_views=V, n_points=args.points, cap_v=V, cap_m=M, cap_o=O
    )

    report = {
        "problem": {"views": V, "points": args.points, "point_capacity": M,
                    "observations": O, "lm_iterations": args.iterations},
        "host": {"physical_cores": len(os.sched_getaffinity(0)),
                 "virtual_devices": n_dev, "platform": jax.default_backend()},
        "method": (
            "Serialized virtual mesh on one physical core: t_S sums all "
            "shards' work + collectives, so parallel_efficiency = t_1 / t_S "
            "(inverse sharding overhead) — the efficiency a real S-device "
            "mesh achieves, up to ICI latency not modelled by in-process "
            "collectives."
        ),
        "notes": (
            "Efficiency > 1 is a real superlinear effect: per-shard working "
            "sets (the (M/S,V,7,3) coupling scatter) fit cache where the "
            "unsharded ones spill. PCG efficiency is bounded by collective "
            "COUNT (one psum per CG iteration, 32/LM-iter), which in-process "
            "emulation prices much higher than ICI would; its psum VOLUME "
            "is tiny (see psum_bytes_per_lm_iteration)."
        ),
        "configs": {},
    }
    for name, cfg in {
        "dense_schur": BAConfig(
            iterations=args.iterations, damping=5.0, huber_delta=0.01,
            fix_first_camera_gauge=True,
        ),
        "pcg": BAConfig(
            iterations=args.iterations, damping=5.0, huber_delta=0.01,
            fix_first_camera_gauge=True, pcg_fallback_cameras=1,
            pcg_iterations=32,
        ),
    }.items():
        times = {}
        for s in shard_counts:
            times[s] = time_config(state, obs, cfg, s, M, O)
            print(f"{name} S={s}: {times[s]*1e3:.1f} ms "
                  f"({times[s]*1e3/args.iterations:.1f} ms/LM-iter)")
        t1 = times[shard_counts[0]]
        entry = {
            "serialized_seconds": {str(s): times[s] for s in shard_counts},
            "ms_per_lm_iteration": {
                str(s): times[s] * 1e3 / args.iterations for s in shard_counts
            },
            "parallel_efficiency": {
                str(s): t1 / times[s] for s in shard_counts
            },
        }
        # psum payload per LM iteration (independent of M and O):
        if name == "dense_schur":
            payload = (V * 49 + V * 49 * V + V * 7 + 2) * 4
        else:
            # U + S_diag + b_red + per-CG-iteration (V,7) coupling vector
            payload = (2 * V * 49 + V * 7 + 2 + cfg.pcg_iterations * V * 7) * 4
        entry["psum_bytes_per_lm_iteration"] = payload
        report["configs"][name] = entry

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"-> {args.out}")
    for name, entry in report["configs"].items():
        eff = entry["parallel_efficiency"]
        print(f"{name}: efficiency @8 shards = {eff.get('8', float('nan')):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
