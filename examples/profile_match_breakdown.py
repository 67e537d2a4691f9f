"""Attribute the fused matcher kernel's wall time (VERDICT r3 item 6).

The roofline model prices the (Nr, D) x (D, Nq) distance matmul plus
streaming bytes, which predicts ~23 us at 2048^2 x 128 — while the fused
``pallas_match_top2`` measures ~0.6 ms, an unfalsifiable 3.8% sol. This
driver decomposes the measured time into (a) the queue/dispatch floor of
ANY trivial program on this tunnelled chip, (b) a bare MXU matmul of the
same shape, (c) the unfused matmul + lax.top_k path, and (d) the fused
Pallas kernel — each timed identically (K dispatches between two
fetch-bounded fences, amortising the host round trip), so

    top2_in_kernel_ms  = fused - matmul_only
    dispatch_floor_ms  = null program

are measured, not modelled. Writes MATCH_PROFILE_r04.json next to the
repo root for README/roofline citation.

Run on the real TPU:
    python examples/profile_match_breakdown.py --n 2048 --dim 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, args, reps: int) -> float:
    """Median-of-3 wall of `reps` enqueued dispatches between two
    fetch-bounded fences, per-dispatch milliseconds."""
    from structure_from_motion_tpu.utils.profiling import device_fence

    fn(*args)  # compile
    outs = []
    for _ in range(3):
        device_fence()
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        device_fence()
        outs.append((time.perf_counter() - t0) / reps * 1e3)
    return float(np.median(outs))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "MATCH_PROFILE_r04.json"
        ),
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from structure_from_motion_tpu.ops.matching import (
        pallas_match_top2,
        squared_distances,
    )
    from structure_from_motion_tpu.utils import roofline

    n, d = args.n, args.dim
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    mask = jnp.ones((n,), bool)

    null = jax.jit(lambda x: x + 1.0)
    matmul = jax.jit(
        lambda x, y: jnp.matmul(x, y.T, preferred_element_type=jnp.float32)
    )

    @jax.jit
    def unfused(x, y, m):
        d2 = squared_distances(x, y, m, m)
        neg, idx = jax.lax.top_k(-d2, 2)
        return neg, idx

    @jax.jit
    def fused(x, y, m):
        return pallas_match_top2(x, y, m)

    t_null = timed(null, (jnp.zeros(()),), args.reps)
    t_mm = timed(matmul, (a, b), args.reps)
    t_unf = timed(unfused, (a, b, mask), args.reps)
    t_fus = timed(fused, (a, b, mask), args.reps)

    # scan variants: N iterations INSIDE one program — no per-dispatch
    # queue cost, so wall/N is pure device time per iteration (the number
    # bench.py's matcher row reports)
    N = args.reps

    def scan_of(body):
        @jax.jit
        def run(x, y):
            def step(c, _):
                out = body(x + c, y)
                return c + 1e-6, jax.tree_util.tree_reduce(
                    lambda s, l: s + jnp.sum(l.astype(jnp.float32)), out, 0.0
                )
            _, outs = jax.lax.scan(step, 0.0, None, length=N)
            return outs.sum()
        return run

    mm_scan = scan_of(lambda x, y: (jnp.matmul(x, y.T, preferred_element_type=jnp.float32),))
    fus_scan = scan_of(lambda x, y: pallas_match_top2(x, y, mask))
    t_mm_scan = timed(mm_scan, (a, b), 1) / N
    t_fus_scan = timed(fus_scan, (a, b), 1) / N

    # -- measured chip peaks (falsifiability anchors) ----------------------
    # The roofline constants are v5e SPEC figures; if this tunnelled chip
    # cannot reach them on a trivial kernel, the matcher's sol% is priced
    # against a peak the hardware never offers. Measure (a) streaming HBM
    # bandwidth with a pure elementwise pass over an output-sized array and
    # (b) MXU f32 throughput with a compute-bound square matmul, both inside
    # scan (no dispatch cost), and report the matcher sol% against BOTH the
    # spec roofline and the measured-peak roofline.
    big = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    stream_scan = scan_of(lambda x, y: (x * 1.0001 + 0.5,))
    t_stream = timed(stream_scan, (big, big), 1) / N
    meas_bw = 2.0 * big.size * 4 / (t_stream * 1e-3)  # read + write
    mm_k = 2048
    sq = jnp.asarray(rng.normal(size=(mm_k, mm_k)).astype(np.float32))
    sq_scan = scan_of(
        lambda x, y: (jnp.matmul(x, y, preferred_element_type=jnp.float32),)
    )
    t_sq = timed(sq_scan, (sq, sq), 1) / N
    meas_flops = 2.0 * mm_k**3 / (t_sq * 1e-3)

    flops, bytes_ = roofline.matcher_model(n, n, d)
    sol_s = roofline.speed_of_light_seconds(flops, bytes_)
    sol_s_meas = roofline.speed_of_light_seconds(
        flops, bytes_, peak_flops=meas_flops, peak_bw=meas_bw
    )
    report = {
        "config": f"matcher kernel decomposition at {n}x{n}x{d}, f32",
        "device": jax.default_backend(),
        "reps": args.reps,
        "dispatch_floor_ms": round(t_null, 4),
        "matmul_only_ms": round(t_mm, 4),
        "unfused_matmul_topk_ms": round(t_unf, 4),
        "fused_pallas_ms": round(t_fus, 4),
        "top2_in_kernel_ms": round(t_fus - t_mm, 4),
        "matmul_in_scan_ms": round(t_mm_scan, 4),
        "fused_pallas_in_scan_ms": round(t_fus_scan, 4),
        "top2_in_kernel_scan_ms": round(t_fus_scan - t_mm_scan, 4),
        "roofline_model_ms": round(sol_s * 1e3, 4),
        "measured_stream_bw_gb_s": round(meas_bw / 1e9, 1),
        "measured_mxu_f32_tflops": round(meas_flops / 1e12, 2),
        "roofline_model_measured_peaks_ms": round(sol_s_meas * 1e3, 4),
        "fused_sol_pct_spec": round(100 * sol_s * 1e3 / t_fus_scan, 2),
        "fused_sol_pct_measured_peaks": round(
            100 * sol_s_meas * 1e3 / t_fus_scan, 2
        ),
        "note": (
            "top2_in_kernel = fused - matmul_only isolates the in-kernel "
            "running top-2 merge; dispatch_floor is the per-program queue "
            "cost any kernel pays on this tunnelled chip. The matmul-only "
            "row is the falsifiable MXU anchor: if it already exceeds the "
            "roofline model, the gap is launch/queue latency, not kernel "
            "inefficiency. measured_stream_bw / measured_mxu_f32 are the "
            "chip's OWN achieved peaks on trivial scan-resident kernels; "
            "fused_sol_pct_measured_peaks prices the matcher against those "
            "instead of the v5e spec sheet — if the spec sol%% is low but "
            "the measured-peak sol%% is high, the gap is the chip (tunnel "
            "share/clock), not the kernel."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
