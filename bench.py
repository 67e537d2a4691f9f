"""Benchmark: the BASELINE.json headline metrics on the current device.

Prints ONE JSON line:
    {"metric": "upenn_frames_per_s", "value": ..., "unit": "frames/s",
     "vs_baseline": ..., ...extras}

- frames/s (the headline `value`): full native pipeline (on-device DoG
  frontend -> matching -> PnP -> triangulation -> bundle adjustment) over
  the 6-image upenn sequence at the DEFAULT config — 1024 keypoints, 2x
  first octave, ratio 0.75 — the accuracy configuration every no-flags
  `reconstruct` run ships (VERDICT r3 item 4). Steady-state: compile
  excluded by a warm-up pass over the same shapes.
- throughput_config_frames_per_s: the same pipeline without the 2x first
  octave (--no-upsample), the speed-over-quality configuration.
- reprojection_px_1024kp: quality of that throughput config.
- reprojection_px_1024kp_upsampled: quality of the default (accuracy)
  config (beats the cv2-SIFT oracle frontend) — measured on the SAME runs
  that time the headline.
- *_sol_pct: percent of the analytic speed-of-light (roofline) time for
  the kernel (utils/roofline.py). These kernels are gather/scatter and
  top-k bound, which the roofline does not price — low numbers localise
  the gap to latency-bound data movement, not MXU underutilisation.
- vs_baseline: against the reference implementation measured end-to-end on
  this container's CPU (willSapgreen/structure-from-motion,
  `python3 ba_processor.py`, measured 2026-08-16: see REFERENCE_SECONDS).

Runs on whatever device jax picks (the real TPU under the axon tunnel;
CPU elsewhere). Budget: ~16 minutes cold on the tunnelled chip
(measured 916 s at round 5 HEAD with the Pallas detect kernels; two
pipeline configs x 4 seeds + the batched engines pay one compile each —
the compiles, not the measurements, are the bulk of the wall time, and
the persistent compile cache takes re-runs to ~12-13 minutes).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Reference `python3 ba_processor.py` wall time on this container's CPU
# (6 upenn frames, single process, measured once; see /tmp/ref_run.log
# provenance in round-1 logs). Conservative: excludes matplotlib teardown.
REFERENCE_SECONDS = 1311.9  # measured 2026-08-16, single-core container CPU
REFERENCE_FRAMES = 6

UPENN = "/root/reference/test_dataset/upenn"


def bench_ba_iters_per_s():
    """BA iterations/s at upenn scale (6 cams, 1024 pts, 6k obs)."""
    import jax

    import __graft_entry__ as ge
    from structure_from_motion_tpu.config import BAConfig
    from structure_from_motion_tpu.ops.ba import run_bundle_adjustment
    from structure_from_motion_tpu.utils import roofline

    iters = 20
    cfg = BAConfig(iterations=iters, damping=5.0, huber_delta=0.01, ell_rows=6)
    state, obs = ge._synthetic_ba_problem(
        n_views=6, n_points=1024, cap_v=8, cap_m=1024, cap_o=8192
    )
    f = jax.jit(lambda s, o: run_bundle_adjustment(s, o, cfg)[1])
    # NOTE: timings end with a real scalar fetch — on the tunnelled TPU
    # backend block_until_ready returns before execution finishes, so a
    # device->host read is the only honest barrier.
    float(f(state, obs)[-1])  # compile + execute
    dt = _best_of(lambda: f(state, obs), reps=5, outer=4) / iters
    flops, byts = roofline.ba_iteration_model(
        8, 1024, 8192, dense_schur=True, ell_rows=6
    )
    return 1.0 / dt, roofline.sol_pct(dt, flops, byts)


def _best_of(run, reps: int, outer: int) -> float:
    """Best mean-of-``reps`` wall over ``outer`` attempts, fetch-barriered.

    The tunnelled chip shows large run-to-round variance (r04 recorded a
    phantom 10% BA 'regression' whose value exactly matches the first
    post-warm-up rep of a HEAD re-measurement: 123 vs steady 137 iters/s).
    The MIN is the honest on-chip cost; the spread is tunnel contention."""
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run()
        float(np.asarray(out).ravel()[-1])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def bench_ba_large():
    """BA iterations/s at production scale, exact Schur: 32 cams, 16k
    points, 131k obs."""
    import jax

    import __graft_entry__ as ge
    from structure_from_motion_tpu.config import BAConfig
    from structure_from_motion_tpu.ops.ba import run_bundle_adjustment
    from structure_from_motion_tpu.utils import roofline

    iters = 5
    # ell_rows=8: the synthetic problem observes each point from exactly 8
    # cameras; the padded ELL table is then exactly the observation stream
    cfg = BAConfig(iterations=iters, damping=5.0, huber_delta=0.01, ell_rows=8)
    state, obs = ge._synthetic_ba_problem(
        n_views=32, n_points=16384, cap_v=32, cap_m=16384, cap_o=131072
    )
    f = jax.jit(lambda s, o: run_bundle_adjustment(s, o, cfg)[1])
    float(f(state, obs)[-1])
    dt = _best_of(lambda: f(state, obs), reps=3, outer=4) / iters
    flops, byts = roofline.ba_iteration_model(
        32, 16384, 131072, dense_schur=True, ell_rows=8
    )
    return 1.0 / dt, roofline.sol_pct(dt, flops, byts)


def bench_ba_pcg():
    """Matrix-free PCG path at V=64 / 65k points / 262k obs (ms/LM-iter)."""
    import jax

    import __graft_entry__ as ge
    from structure_from_motion_tpu.config import BAConfig
    from structure_from_motion_tpu.ops.ba import run_bundle_adjustment
    from structure_from_motion_tpu.utils import roofline

    iters = 5
    cfg = BAConfig(
        iterations=iters, damping=5.0, huber_delta=0.01,
        pcg_fallback_cameras=1, pcg_iterations=64, ell_rows=4,
    )
    state, obs = ge._synthetic_ba_problem(
        n_views=64, n_points=65536, cap_v=64, cap_m=65536, cap_o=262144
    )
    f = jax.jit(lambda s, o: run_bundle_adjustment(s, o, cfg)[1])
    float(f(state, obs)[-1])
    dt = _best_of(lambda: f(state, obs), reps=3, outer=3) / iters
    flops, byts = roofline.ba_iteration_model(
        64, 65536, 262144, dense_schur=False, pcg_iters=64, ell_rows=4
    )
    return dt * 1e3, roofline.sol_pct(dt, flops, byts)


def bench_matcher():
    """Descriptor matching at 2048 keys x 128 dims (the Pallas fused
    top-2 path on TPU). Returns (ms/match, sol_pct)."""
    import jax
    import jax.numpy as jnp

    from structure_from_motion_tpu.config import MatcherConfig
    from structure_from_motion_tpu.ops.matching import match_descriptors
    from structure_from_motion_tpu.utils import roofline

    K, D = 2048, 128
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32) * 8)
    b = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32) * 8)
    m = jnp.ones(K, bool)
    cfg = MatcherConfig(ratio=0.8)
    N = 50

    @jax.jit
    def run(a, b):
        def body(c, _):
            r = match_descriptors(a + c, b, m, m, cfg)
            return c + 1e-6, r.valid.sum()
        _, outs = jax.lax.scan(body, 0.0, None, length=N)
        return outs.sum()

    int(run(a, b))
    t0 = time.perf_counter()
    int(run(a, b))
    dt = (time.perf_counter() - t0) / N
    flops, byts = roofline.matcher_model(K, K, D)
    return dt * 1e3, roofline.sol_pct(dt, flops, byts)


def bench_pipeline():
    """Full native pipeline over upenn; returns (frames/s, extras)."""
    import jax

    from structure_from_motion_tpu.config import (
        CapacityConfig,
        FrontendConfig,
        MatcherConfig,
        PipelineConfig,
    )
    from structure_from_motion_tpu.io import load_image_grayscale, upenn_intrinsics
    from structure_from_motion_tpu.models import (
        BatchedIncrementalSfM,
        IncrementalSfM,
    )

    max_kp = 1024

    def make_cfg(upsample: bool) -> PipelineConfig:
        return PipelineConfig(
            frontend=FrontendConfig(
                max_keypoints=max_kp,
                upsample_first_octave=upsample,
                num_octaves=5 if upsample else 4,
            ),
            matcher=MatcherConfig(ratio=0.8),
            capacity=CapacityConfig(
                max_views=8, max_keypoints=max_kp, max_points=8192,
                max_observations=32768,
            ),
        )

    cfg = make_cfg(False)
    K = upenn_intrinsics()
    files = [os.path.join(UPENN, f"image{i:07d}.bmp") for i in range(1, 7)]
    # uint8 frames: 4x cheaper host->device transfer; the frontend
    # normalises on device
    imgs = [load_image_grayscale(f).astype(np.uint8) for f in files]
    # device-staged frames: production ingest overlaps the next frame's
    # host->device copy with the current frame's compute (the CLI's
    # DevicePrefetcher, io/prefetch.py), so steady-state throughput does
    # NOT pay the ~1.2 MB/frame tunnel upload per frame — staging up front
    # measures the same steady state without modelling the prefetch queue
    imgs = [jax.device_put(im) for im in imgs]

    # NOTE: every timed region ends with a real scalar fetch — on the
    # tunnelled TPU backend block_until_ready returns before execution
    # finishes, so a device->host read is the only honest barrier.

    # ---- single-sequence latency (throughput frontend config) ------------
    warm = IncrementalSfM(cfg, K, frontend="native", collect_metrics=False)
    for img in imgs[:3]:
        warm.process_image(img)
    int(warm.state.num_points)

    engine = IncrementalSfM(cfg, K, frontend="native", collect_metrics=False)
    t0 = time.perf_counter()
    for img in imgs:
        engine.process_image(img)
    int(engine.state.num_points)
    seq_latency = time.perf_counter() - t0

    # quality is seed-noisy (RANSAC draws move single-seed reprojection by
    # ~±0.3 px on 6 frames — measured); report the median over 4 seeds.
    # Seeds share the jit cache, so the extra runs are cheap.
    def seed_median_reproj(mk_engine, frames):
        errs = []
        for seed in range(4):
            e = mk_engine(seed)
            for fr in frames:
                e.process_image(fr)
            errs.append(float(e.reprojection_error()))
        return float(np.median(errs)), errs

    reproj_thr, errs_thr = seed_median_reproj(
        lambda s: IncrementalSfM(
            cfg, K, frontend="native", seed=s, collect_metrics=False
        ),
        imgs,
    )

    # ---- batched throughput ---------------------------------------------
    # B sequences advance in lockstep via vmap, with the capacity-adaptive
    # bucket switch hoisted out of the batch axis (models/batched.py) so
    # bucketing works under vmap. Since the round-3 detect/PnP fixes one
    # sequence no longer saturates the chip, so the B=8 aggregate lands
    # ABOVE single-sequence — reported as its own labeled number, never as
    # the headline (lockstep aggregate is not per-sequence latency).
    B = 8
    frame_batches = [jax.device_put(np.stack([np.asarray(im)] * B)) for im in imgs]
    warm_b = BatchedIncrementalSfM(cfg, K, batch=B, frontend="native")
    for fb in frame_batches[:3]:
        warm_b.process_images(fb)
    int(warm_b.states.num_points[0])

    bench_b = BatchedIncrementalSfM(cfg, K, batch=B, frontend="native")
    t0 = time.perf_counter()
    for fb in frame_batches:
        bench_b.process_images(fb)
    int(bench_b.states.num_points[0])
    dt_b = time.perf_counter() - t0

    # ---- batched SMALL sequences: the engine's actual value case ---------
    # (models/batched.py docstring): many small problems leave the chip
    # idle per dispatch, so lockstep lanes amortise the ~30 ms host round
    # trip. 320x240 frames, 256 kp, small capacities; B=8 lanes vs the
    # same config single-sequence.
    cfg_s = PipelineConfig(
        frontend=FrontendConfig(
            max_keypoints=256, num_octaves=3, upsample_first_octave=False,
        ),
        matcher=MatcherConfig(ratio=0.8),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=256, max_points=2048,
            max_observations=8192,
        ),
    )
    K_s = np.asarray(K) / 4.0
    K_s[2, 2] = 1.0
    imgs_s = [jax.device_put(np.asarray(im)[::4, ::4]) for im in imgs]
    warm_s = IncrementalSfM(cfg_s, K_s, frontend="native", collect_metrics=False)
    for im in imgs_s:
        warm_s.process_image(im)
    int(warm_s.state.num_points)
    one_s = IncrementalSfM(cfg_s, K_s, frontend="native", collect_metrics=False)
    t0 = time.perf_counter()
    for im in imgs_s:
        one_s.process_image(im)
    int(one_s.state.num_points)
    dt_small_1 = time.perf_counter() - t0

    small_batches = [jax.device_put(np.stack([np.asarray(im)] * B)) for im in imgs_s]
    warm_bs = BatchedIncrementalSfM(cfg_s, K_s, batch=B, frontend="native")
    for fb in small_batches:
        warm_bs.process_images(fb)
    int(warm_bs.states.num_points[0])
    bench_bs = BatchedIncrementalSfM(cfg_s, K_s, batch=B, frontend="native")
    t0 = time.perf_counter()
    for fb in small_batches:
        bench_bs.process_images(fb)
    int(bench_bs.states.num_points[0])
    dt_small_b = time.perf_counter() - t0

    # ---- quality config: 2x first octave + the production-default matcher
    # (ratio 0.75, fundamental gate) + a 10-iteration final BA polish — the
    # accuracy configuration, untimed
    import dataclasses

    cfg_q = dataclasses.replace(make_cfg(True), matcher=PipelineConfig().matcher)
    # full float frames: the uint8 quantisation that is fine for the
    # throughput config costs ~0.3 px through the 2x first octave
    float_frames = [load_image_grayscale(f) for f in files]
    # second accuracy anchor (BASELINE metric): full-trajectory ATE vs the
    # pure-cv2 oracle pipeline (host-side, untimed)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples"))
    from oracle_crosscheck import cv2_trajectory

    from structure_from_motion_tpu.utils.metrics import absolute_trajectory_error

    o_locs, _ = cv2_trajectory([np.asarray(f) for f in float_frames], np.asarray(K))
    span = float(np.linalg.norm(o_locs.max(0) - o_locs.min(0)))
    float_frames = [jax.device_put(f) for f in float_frames]
    errs_up, ates_up = [], []
    acc_fps_seeds = []
    for seed in range(4):
        engine_q = IncrementalSfM(
            cfg_q, K, frontend="native", seed=seed, collect_metrics=False
        )
        t0 = time.perf_counter()
        for fr in float_frames:
            engine_q.process_image(fr)
        int(engine_q.state.num_points)  # fetch barrier
        if seed > 0:  # seed 0 pays the compile; later seeds measure
            acc_fps_seeds.append(len(float_frames) / (time.perf_counter() - t0))
        engine_q.finalize(iterations=10)
        errs_up.append(float(engine_q.reprojection_error()))
        locs, _ = engine_q.poses()
        ates_up.append(100.0 * absolute_trajectory_error(locs, o_locs) / span)
    reproj_upsampled = float(np.median(errs_up))

    extras = {
        "sequence_latency_s": round(seq_latency, 3),
        "throughput_config_frames_per_s": round(len(imgs) / seq_latency, 4),
        "batch": B,
        "batch_aggregate_frames_per_s": round(B * len(imgs) / dt_b, 4),
        "small_seq_frames_per_s": round(len(imgs_s) / dt_small_1, 4),
        "small_seq_batch8_aggregate_frames_per_s": round(
            B * len(imgs_s) / dt_small_b, 4
        ),
        "batch_note": "B=8 lockstep lanes amortise per-dispatch overhead: "
        "aggregate > single even at production shapes since the round-3 "
        "detect/PnP optimisations (the chip is no longer saturated by one "
        "sequence), and ~1.7x on small sequences",
        "reprojection_px_1024kp": round(reproj_thr, 4),
        "reprojection_px_1024kp_seeds": [round(e, 3) for e in errs_thr],
        "accuracy_config_frames_per_s_seeds": [round(f, 3) for f in acc_fps_seeds],
        "reprojection_px_1024kp_upsampled": round(reproj_upsampled, 4),
        "reprojection_px_1024kp_upsampled_seeds": [round(e, 3) for e in errs_up],
        "ate_vs_cv2_oracle_pct_span": round(float(np.median(ates_up)), 3),
        "ate_vs_cv2_oracle_pct_span_seeds": [round(a, 3) for a in ates_up],
        "map_points": int(len(engine.map_points())),
        "quality_note": "reprojection medians over seeds 0-3 (single-seed "
        "spread is ~±0.3 px on this 6-frame sequence)",
    }
    # headline = the DEFAULT config (accuracy: 2x first octave, ratio 0.75)
    # — the configuration a no-flags `reconstruct` run ships; median over
    # the warm seeds
    return float(np.median(acc_fps_seeds)), extras


def main():
    t_start = time.time()
    ba_iters, ba_sol = bench_ba_iters_per_s()
    ba_iters_large, ba_large_sol = bench_ba_large()
    ba_pcg_ms, ba_pcg_sol = bench_ba_pcg()
    match_ms, match_sol = bench_matcher()
    frames_per_s, extras = (float("nan"), {})
    if os.path.isdir(UPENN):
        frames_per_s, extras = bench_pipeline()
    extras["ba_iters_per_s_32cam_131k_obs"] = round(ba_iters_large, 2)
    extras["ba_sol_pct_32cam_131k_obs"] = round(ba_large_sol, 2)
    extras["ba_ms_per_iter_64cam_262k_obs_pcg"] = round(ba_pcg_ms, 1)
    extras["ba_sol_pct_64cam_262k_obs_pcg"] = round(ba_pcg_sol, 2)
    extras["match_ms_2048kp"] = round(match_ms, 3)
    extras["match_sol_pct_2048kp"] = round(match_sol, 2)
    extras["sol_note"] = (
        "sol_pct = analytic roofline time / measured (utils/roofline.py); "
        "these kernels are top-k and gather/scatter latency-bound, which "
        "the roofline does not price"
    )

    ref_fps = REFERENCE_FRAMES / REFERENCE_SECONDS
    result = {
        "metric": "upenn_frames_per_s",
        "value": round(frames_per_s, 4),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / ref_fps, 2)
        if np.isfinite(frames_per_s)
        else None,
        "ba_iters_per_s_upenn_scale": round(ba_iters, 2),
        "ba_sol_pct_upenn_scale": round(ba_sol, 2),
        "bench_wall_s": round(time.time() - t_start, 1),
        **extras,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
