"""Reconstruct the 6-image upenn sequence end-to-end.

The whole-pipeline integration drive (reference: ``python3 ba_processor.py``,
``ba_processor.py:443-546``). Compares the recovered trajectory against the
golden ``view_pose.pkl`` via similarity-aligned ATE.

Usage:
    python examples/run_upenn.py [--frontend native|sift] [--device cpu|tpu]
                                 [--max-kp 1024] [--frames 6]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray):
    """Similarity transform (s, R, t) minimising ||dst - (s R src + t)||."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    var = (sc**2).sum() / len(src)
    s = np.trace(np.diag(S) @ D) / var if var > 0 else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def aligned_ate(est: np.ndarray, gt: np.ndarray) -> float:
    s, R, t = umeyama_alignment(est, gt)
    aligned = (s * (R @ est.T)).T + t
    return float(np.sqrt(((aligned - gt) ** 2).sum(axis=1).mean()))


def sift_frontend(img: np.ndarray, max_kp: int):
    """cv2-SIFT oracle frontend producing fixed-capacity buffers."""
    import cv2

    sift = cv2.SIFT_create(nfeatures=max_kp)
    kps, desc = sift.detectAndCompute(img.astype(np.uint8), None)
    n = min(len(kps), max_kp)
    xy = np.zeros((max_kp, 2), np.float32)
    d = np.zeros((max_kp, 128), np.float32)
    valid = np.zeros(max_kp, bool)
    xy[:n] = [k.pt for k in kps[:n]]
    d[:n] = desc[:n]
    valid[:n] = True
    return xy, d, valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frontend", choices=["native", "sift"], default="sift")
    ap.add_argument("--device", choices=["cpu", "tpu"], default="cpu")
    ap.add_argument("--max-kp", type=int, default=2048)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--dataset", default="/root/reference/test_dataset/upenn")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--upsample", action="store_true",
                    help="2x-upsampled first octave (cv2-SIFT parity)")
    ap.add_argument("--lm-iters", default="",
                    help="'PNP,TRI' LM iteration budgets (default config)")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        

    from structure_from_motion_tpu.config import (
        CapacityConfig,
        FrontendConfig,
        LMConfig,
        MatcherConfig,
        PipelineConfig,
    )
    from structure_from_motion_tpu.io import load_image_grayscale, upenn_intrinsics
    from structure_from_motion_tpu.models import IncrementalSfM

    lm_kw = {}
    if args.lm_iters:
        pnp_it, tri_it = (int(x) for x in args.lm_iters.split(","))
        lm_kw = dict(
            pnp_lm=LMConfig(damping=5.0, iterations=pnp_it),
            triangulation_lm=LMConfig(damping=5.0, iterations=tri_it),
        )
    cfg = PipelineConfig(
        **lm_kw,
        frontend=FrontendConfig(
            max_keypoints=args.max_kp,
            upsample_first_octave=args.upsample,
            num_octaves=5 if args.upsample else 4,
        ),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=args.max_kp, max_points=8192,
            max_observations=32768,
        ),
    )
    K = upenn_intrinsics()
    engine = IncrementalSfM(
        cfg, K, frontend="native" if args.frontend == "native" else "precomputed",
        seed=args.seed,
    )

    files = [f"image{i:07d}.bmp" for i in range(1, args.frames + 1)]
    t_start = time.time()
    for f in files:
        img = load_image_grayscale(os.path.join(args.dataset, f))
        t0 = time.time()
        if args.frontend == "native":
            info = engine.process_image(img)
        else:
            xy, d, valid = sift_frontend(img, args.max_kp)
            info = engine.process_features(xy, d, valid)
        dt = time.time() - t0
        print(f"{f}: {dt:.2f}s  " + "  ".join(
            f"{k}={v}" for k, v in info.items()
            if k in ("frame", "matches", "f_inliers", "pnp_candidates", "pnp_inliers", "new_points", "reprojection_px")
        ))
    total = time.time() - t_start

    costs = engine.finalize(iterations=10)
    print(f"final BA: cost {costs[0]:.4e} -> {costs[-1]:.4e}, "
          f"reprojection {engine.reprojection_error():.3f}px")
    locs, rots = engine.poses()
    pts = engine.map_points()
    print(f"\ntotal {total:.2f}s  ({len(files) / total:.3f} frames/s)")
    print(f"map points: {len(pts)}")
    print("camera centers:\n", np.round(locs, 4))

    golden = os.path.join(args.dataset, "results", "view_pose.pkl")
    if os.path.exists(golden) and len(locs) >= 3:
        with open(golden, "rb") as fh:
            g_locs, g_rots = pickle.load(fh)
        g_locs = g_locs[: len(locs)]
        ate = aligned_ate(locs, g_locs)
        # scale-aware: golden trajectory spans ~7.4 units
        span = np.linalg.norm(g_locs.max(0) - g_locs.min(0))
        print(f"ATE vs golden (similarity-aligned): {ate:.4f}  ({100*ate/span:.2f}% of span)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
