"""Per-stage timing of the fused frame program (TPU).

Runs 5 upenn frames to populate state, then times truncated variants of the
6th frame's program (detect / match / localize / BA / full). Stage costs are
DIFFERENCES between cumulative programs — the fixed ~30 ms dispatch+fetch
round trip of the tunnelled backend cancels in the differences.

Usage: python examples/profile_frame.py [--kp 1024]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from structure_from_motion_tpu.config import (
    CapacityConfig,
    FrontendConfig,
    MatcherConfig,
    PipelineConfig,
)
from structure_from_motion_tpu.io import load_image_grayscale, upenn_intrinsics
from structure_from_motion_tpu.models import IncrementalSfM
from structure_from_motion_tpu.models import incremental as I
from structure_from_motion_tpu.models import tracks
from structure_from_motion_tpu.ops.features import detect_and_describe

UP = "/root/reference/test_dataset/upenn"


def timeit(fn, *args, n=5):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kp", type=int, default=1024)
    ap.add_argument(
        "--source", choices=["upenn", "synthetic"], default="upenn",
        help="synthetic: the run_synthetic_gt.py configuration (rendered "
        "640x480 frames, huber BA, reprojection pruning, slide window) — "
        "for localising the SYNTHGT throughput anomaly (VERDICT r3)",
    )
    args = ap.parse_args()

    if args.source == "synthetic":
        from structure_from_motion_tpu.config import BAConfig, LMConfig, RansacConfig
        from structure_from_motion_tpu.io.synthetic import (
            default_synthetic_K,
            synthetic_scene_sequence,
        )

        cfg = PipelineConfig(
            frontend=FrontendConfig(
                max_keypoints=args.kp, upsample_first_octave=False
            ),
            matcher=MatcherConfig(ratio=0.85),
            fundamental_ransac=RansacConfig(inlier_threshold=2.0, iteration=256),
            pnp_ransac=RansacConfig(inlier_threshold=8.0, sample_num=6, iteration=512),
            pnp_lm=LMConfig(damping=5.0, iterations=100),
            triangulation_lm=LMConfig(damping=5.0, iterations=50),
            ba=BAConfig(iterations=3, damping=5.0, huber_delta=0.01),
            capacity=CapacityConfig(
                max_views=8, max_keypoints=args.kp, max_points=16384,
                max_observations=65536,
            ),
            window_size=8,
            window_mode="slide",
            prune_max_error_px=8.0,
        )
        frames, K, _, _ = synthetic_scene_sequence(n_frames=6, size=(480, 640))
        imgs = [f for f in frames]
    else:
        cfg = PipelineConfig(
            frontend=FrontendConfig(
                max_keypoints=args.kp, num_octaves=4, upsample_first_octave=False
            ),
            matcher=MatcherConfig(ratio=0.8),
            capacity=CapacityConfig(
                max_views=8, max_keypoints=args.kp, max_points=8192,
                max_observations=32768,
            ),
        )
        K = upenn_intrinsics()
        files = [os.path.join(UP, f"image{i:07d}.bmp") for i in range(1, 7)]
        imgs = [load_image_grayscale(f).astype(np.uint8) for f in files]

    eng = IncrementalSfM(cfg, K, frontend="native", collect_metrics=False)
    for im in imgs[:5]:
        eng.process_image(im)
    int(eng.state.num_points)
    state = eng.state
    v = jnp.asarray(5)
    key = jax.random.fold_in(jax.random.PRNGKey(0), 5)
    img = jnp.asarray(imgs[5])

    def upto(stage):
        @jax.jit
        def f(st, vv, kk, im):
            kps, desc = detect_and_describe(im, cfg.frontend)
            if stage == 0:
                return scalarize((kps.xy, desc, kps.mask))
            st = tracks.set_view_features(st, vv, kps.xy, desc, kps.mask)
            k_match, k_stage = jax.random.split(kk)
            st = I._match_stage(st, vv, k_match, config=cfg)
            if stage == 1:
                return scalarize(st)
            st, si = I._localize_stage(st, vv, k_stage, config=cfg)
            if stage == 2:
                return scalarize(st) + scalarize(si)
            st, costs, dropped, _, _ = I._ba_stage(st, config=cfg)
            if stage == 3:
                return scalarize(st) + costs.sum()
            return scalarize(st) + I.pipeline_reprojection_error(st)

        return f

    names = ["detect", "+store/match", "+localize", "+BA", "+reproj(full)"]
    prev = 0.0
    for s, name in enumerate(names):
        ms = timeit(upto(s), state, v, key, img)
        delta = ms - prev if s else ms
        print(f"{name}: {ms:.1f} ms (delta {delta:+.1f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
