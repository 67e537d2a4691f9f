"""Fetch-bounded timing of the DoG detect stage and its phases (TPU).

Methodology (see docs / memory notes): on the tunnelled axon backend
``block_until_ready`` returns before execution finishes and every
device->host fetch pays a fixed ~30 ms round trip, so each timed program
must return ONE scalar that depends on all outputs (exactly one fetch per
iteration), and phase costs are read as DIFFERENCES between cumulative
programs (the fixed round-trip cancels).

Usage:
    python examples/profile_detect.py [--kp 1024] [--upsample] [--sub]
"""
import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from structure_from_motion_tpu.config import FrontendConfig
from structure_from_motion_tpu.io.datasets import load_image_grayscale
from structure_from_motion_tpu.ops import features as F

IMAGE = "/root/reference/test_dataset/upenn/image0000001.bmp"


def timeit(fn, *args, n=5):
    np.asarray(fn(*args))  # warm-up/compile
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)


def _pyramid_setup(cfg):
    S = cfg.scales_per_octave
    n_levels = S + 3
    k = 2.0 ** (1.0 / S)
    sigmas = [cfg.sigma0 * (k**i) for i in range(n_levels)]
    rel = [
        math.sqrt(max(sigmas[i] ** 2 - sigmas[0] ** 2, 1e-6))
        for i in range(1, n_levels)
    ]
    return S, rel


def subprofile(img, cfg):
    """Cumulative phase-1 stages; read costs as successive differences."""
    S, rel = _pyramid_setup(cfg)

    def stage(depth):
        def f(im):
            im = im / jnp.maximum(jnp.max(im), 1e-6)
            base = F._blur(im, cfg.sigma0, cfg.blur_impl)
            acc = []
            for o in range(cfg.num_octaves):
                gauss = F._blur_levels(base, rel, cfg.blur_impl)
                if depth == 0:
                    acc.append(gauss.sum())
                else:
                    out = F._octave_candidates(gauss, cfg, cfg.max_keypoints)
                    if depth == 1:
                        acc.append(out[0].sum())  # dog only
                    else:
                        acc.append(scalarize(out[1:]))
                base = F._downsample2(gauss[S])
            return sum(jnp.asarray(a, jnp.float32).sum() for a in acc)

        return jax.jit(f)

    for d, name in [(0, "pyramid"), (1, "+dog"), (2, "+extrema/top_k")]:
        print(f"{name}: {timeit(stage(d), img):.1f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kp", type=int, default=1024)
    ap.add_argument("--upsample", action="store_true")
    ap.add_argument("--sub", action="store_true", help="phase-1 sub-stages")
    args = ap.parse_args()

    img = jnp.asarray(np.asarray(load_image_grayscale(IMAGE), np.float32))
    cfg = FrontendConfig(
        max_keypoints=args.kp,
        upsample_first_octave=args.upsample,
        num_octaves=5 if args.upsample else 4,
    )
    print("image shape:", img.shape, flush=True)

    detect = jax.jit(lambda im: scalarize(F.detect_and_describe(im, cfg)))
    full_ms = timeit(detect, img)
    print(f"full detect_and_describe: {full_ms:.1f} ms", flush=True)

    # phase split: a truncated program that stops after candidate selection
    S, rel = _pyramid_setup(cfg)

    def phase1(im):
        im = im / jnp.maximum(jnp.max(im), 1e-6)
        base = F._blur(im, cfg.sigma0, cfg.blur_impl)
        outs = []
        for o in range(cfg.num_octaves):
            gauss = F._blur_levels(base, rel, cfg.blur_impl)
            outs.append(F._octave_candidates(gauss, cfg, cfg.max_keypoints))
            base = F._downsample2(gauss[S])
        return outs

    p1_ms = timeit(jax.jit(lambda im: scalarize(phase1(im))), img)
    print(f"phase1 (pyramid+candidates): {p1_ms:.1f} ms", flush=True)
    print(
        f"phase2 (subpixel+orientation+descriptor, by difference): "
        f"{full_ms - p1_ms:.1f} ms",
        flush=True,
    )
    if args.sub:
        subprofile(img, cfg)


if __name__ == "__main__":
    main()
