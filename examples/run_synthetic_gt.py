"""Long-sequence run on the RENDERED ground-truth scene (io/synthetic.py):
the unbiased counterpart of examples/run_video_loop.py.

Every frame is a genuinely novel viewpoint (the upenn loop ping-pongs 6
photographs), and the ATE gate is against EXACT poses — no golden/oracle
solver bias. Reports steady-state frames/s, reprojection stats, ATE vs
exact truth for the sliding-window trajectory, and the same after the
final whole-trajectory global BA (IncrementalSfM.finalize_global).

Usage:
    python examples/run_synthetic_gt.py [--frames 300] [--window 8]
        [--size 480 640] [--device tpu] [--global-ba-shards 1]
        [--out SYNTHGT_r03.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--max-kp", type=int, default=1024)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--loops", type=float, default=3.0)
    ap.add_argument("--device", choices=["cpu", "tpu"], default="tpu")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-points", type=int, default=16384)
    ap.add_argument("--max-obs", type=int, default=65536)
    ap.add_argument("--global-ba-iters", type=int, default=20)
    ap.add_argument("--global-ba-shards", type=int, default=1)
    ap.add_argument(
        "--save-state", default="",
        help="checkpoint the engine (pre-global-BA) to this path so the "
        "same reassembled whole-trajectory problem can be re-solved on a "
        "device mesh (examples/run_global_ba_mesh.py)",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "SYNTHGT_r03.json"),
    )
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from structure_from_motion_tpu.config import (
        BAConfig,
        CapacityConfig,
        FrontendConfig,
        LMConfig,
        MatcherConfig,
        PipelineConfig,
        RansacConfig,
    )
    from structure_from_motion_tpu.io.synthetic import synthetic_scene_sequence
    from structure_from_motion_tpu.models import IncrementalSfM
    from structure_from_motion_tpu.utils.debug import validate_state
    from structure_from_motion_tpu.utils.metrics import (
        absolute_trajectory_error,
        reprojection_stats,
    )

    H, W = args.size
    print(f"rendering {args.frames} frames at {W}x{H} ...", flush=True)
    imgs, K, C_gt, R_gt = synthetic_scene_sequence(
        n_frames=args.frames, size=(H, W), seed=args.seed, loops=args.loops
    )

    cfg = PipelineConfig(
        frontend=FrontendConfig(max_keypoints=args.max_kp, upsample_first_octave=False),
        matcher=MatcherConfig(ratio=0.85),
        fundamental_ransac=RansacConfig(inlier_threshold=2.0, iteration=256),
        pnp_ransac=RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=512),
        pnp_lm=LMConfig(damping=5.0, iterations=100),
        triangulation_lm=LMConfig(damping=5.0, iterations=50),
        ba=BAConfig(iterations=3, damping=5.0, huber_delta=0.01),
        capacity=CapacityConfig(
            max_views=args.window,
            max_keypoints=args.max_kp,
            max_points=args.max_points,
            max_observations=args.max_obs,
        ),
        window_size=args.window,
        window_mode="slide",
        prune_max_error_px=8.0,
    )
    engine = IncrementalSfM(cfg, K, frontend="native", seed=0)

    frames_dev = [jax.device_put(f) for f in imgs]
    t_start = time.time()
    t_warm = None
    for t, im in enumerate(frames_dev):
        engine.process_image(im)
        if t == 2:
            engine.reprojection_error()
            t_warm = time.time()
        if (t + 1) % 100 == 0:
            err = engine.reprojection_error()
            print(
                f"frame {t + 1}/{args.frames}: reprojection {err:.3f}px, "
                f"{int(engine.state.num_points)} live points, "
                f"{(t + 1) / (time.time() - t_start):.2f} frames/s cumulative",
                flush=True,
            )
    err = engine.reprojection_error()
    total = time.time() - t_start
    steady = (args.frames - 3) / (time.time() - t_warm)

    locs, rots = engine.poses()
    assert locs.shape[0] == args.frames
    ate = absolute_trajectory_error(locs, C_gt)
    span = float(np.linalg.norm(C_gt.max(0) - C_gt.min(0)))
    stats = reprojection_stats(engine.state)
    problems = validate_state(engine.state)

    if args.save_state:
        engine.save_checkpoint(args.save_state)
        print(f"pre-global-BA checkpoint -> {args.save_state}")

    t_gba = time.time()
    gba = engine.finalize_global(
        iterations=args.global_ba_iters, num_shards=args.global_ba_shards
    )
    gba_wall = time.time() - t_gba
    locs_g, _ = engine.poses()
    ate_after = absolute_trajectory_error(locs_g, C_gt)

    report = {
        "config": "rendered ground-truth scene (io/synthetic.py): EXACT pose gate",
        "frames": args.frames,
        "image_size": [H, W],
        "detector": "dog (on-device)",
        "max_keypoints": args.max_kp,
        "window": args.window,
        "device": jax.default_backend(),
        "steady_frames_per_s": round(steady, 3),
        "total_wall_s": round(total, 1),
        "reprojection_px": {k: round(v, 4) for k, v in stats.items()},
        "ate_vs_exact_gt": round(ate, 4),
        "ate_pct_of_span": round(100 * ate / span, 2),
        "global_ba": {
            "iterations": args.global_ba_iters,
            "num_shards": args.global_ba_shards,
            "cameras": gba["n_cams"],
            "points": gba["n_points"],
            "observations": gba["n_obs"],
            "cost_first_to_last": [
                float(gba["costs"][0]), float(gba["costs"][-1])
            ],
            "wall_s": round(gba_wall, 1),
            "ate_after_global_ba": round(ate_after, 4),
            "ate_after_pct_of_span": round(100 * ate_after / span, 2),
        },
        "live_points": int(engine.state.num_points),
        "archived_poses": len(engine._archive),
        "dropped_points": int(engine.state.dropped_points),
        "dropped_obs": int(engine.state.dropped_obs),
        "invariant_violations": problems,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
