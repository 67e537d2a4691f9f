"""Long-sequence sliding-window reconstruction demo (BASELINE.json config 4).

Generates a synthetic N-frame trajectory (default 120) through a point
cloud, reconstructs it through a fixed W-view sliding window
(``window_mode="slide"``: the oldest view is evicted and archived, the map
and observation stores compact on device), and reports full-trajectory ATE
+ throughput.

Usage:
    python examples/run_long_sequence.py [--frames 120] [--window 8]
                                         [--device cpu|tpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_sequence(n_frames: int, n_points: int, kp_cap: int, seed: int = 0):
    """Camera sweeping past a long wall of points; only a moving subset is
    visible per frame (realistic track churn for window eviction)."""
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    # points spread along the direction of travel
    X = np.stack(
        [
            rng.uniform(-2, n_frames * 1.0 + 2, n_points),
            rng.uniform(-3, 3, n_points),
            rng.uniform(10, 20, n_points),
        ],
        axis=1,
    )
    codes = rng.normal(size=(n_points, 128)).astype(np.float32) * 10

    frames, C_gt = [], []
    for v in range(n_frames):
        C = np.array([v * 1.0, 0.05 * np.sin(v * 0.2), 0.0])
        C_gt.append(C)
        Xc = X - C
        uvn = Xc[:, :2] / Xc[:, 2:3]
        uv = uvn * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        vis = (
            (uv[:, 0] > 10) & (uv[:, 0] < 630) & (uv[:, 1] > 10) & (uv[:, 1] < 470)
        )
        idx = np.nonzero(vis)[0][:kp_cap]
        xy = np.zeros((kp_cap, 2), np.float32)
        d = np.zeros((kp_cap, 128), np.float32)
        valid = np.zeros(kp_cap, bool)
        xy[: len(idx)] = uv[idx] + rng.normal(size=(len(idx), 2)) * 0.3
        d[: len(idx)] = codes[idx]
        valid[: len(idx)] = True
        frames.append((xy, d, valid))
    return K, frames, np.stack(C_gt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--points", type=int, default=2000)
    ap.add_argument("--kp-cap", type=int, default=512)
    ap.add_argument("--device", choices=["cpu", "tpu", ""], default="")
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
    from structure_from_motion_tpu.models import IncrementalSfM
    from structure_from_motion_tpu.utils.metrics import absolute_trajectory_error

    K, frames, C_gt = make_sequence(args.frames, args.points, args.kp_cap)
    cfg = PipelineConfig(
        frontend=FrontendConfig(max_keypoints=args.kp_cap, upsample_first_octave=False),
        matcher=MatcherConfig(ratio=0.9),
        fundamental_ransac=RansacConfig(inlier_threshold=2.0, iteration=256),
        pnp_ransac=RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=512),
        pnp_lm=LMConfig(damping=5.0, iterations=100),
        triangulation_lm=LMConfig(damping=5.0, iterations=50),
        ba=BAConfig(iterations=3, damping=5.0, huber_delta=0.01),
        capacity=CapacityConfig(
            max_views=args.window, max_keypoints=args.kp_cap,
            max_points=8192, max_observations=32768,
        ),
        window_size=args.window,
        window_mode="slide",
    )
    engine = IncrementalSfM(cfg, K, frontend="precomputed", collect_metrics=False)

    t0 = time.time()
    for i, f in enumerate(frames):
        engine.process_features(*f)
        if (i + 1) % 20 == 0:
            print(
                f"frame {i+1}/{args.frames}: "
                f"{int(engine.state.num_points)} live points, "
                f"{int(engine.state.num_obs)} live observations"
            )
    reproj = engine.reprojection_error()  # sync
    dt = time.time() - t0

    locs, _ = engine.poses()
    ate = absolute_trajectory_error(locs, C_gt)
    span = float(np.linalg.norm(C_gt.max(0) - C_gt.min(0)))
    print(
        f"\n{args.frames} frames / window {args.window}: {dt:.1f}s "
        f"({args.frames/dt:.2f} frames/s)"
    )
    print(
        f"full-trajectory ATE {ate:.3f} ({100*ate/span:.2f}% of span), "
        f"window reprojection {reproj:.3f}px"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
