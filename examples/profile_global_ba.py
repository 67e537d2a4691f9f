"""Split the whole-trajectory global-BA wall into assembly / compile /
execute (VERDICT r3 item 1a: LONGRUN's final solve reported ~110-207 s for
20 LM iterations at 500 cams / 159k obs, ~200x the per-iteration cost the
262k-obs PCG bench shows — this driver finds out which part is physics).

Loads a pre-global-BA checkpoint (``run_video_loop.py --save-state``),
rebuilds the global problem, then calls ``solve_global`` twice with
identical shapes: the first call pays tracing + XLA compile + execute, the
second (jit-cached scan) pays execute only, so

    compile_s = first_call - second_call          (approximately)
    execute_s = second_call

Writes GLOBALBA_PROFILE_r04.json.

Run on the real TPU:
    python examples/profile_global_ba.py --ckpt /tmp/longrun500.ckpt.npz
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
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--max-kp", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--pcg-iters", type=int, default=0,
        help="override BAConfig.pcg_iterations (0 = config default) — "
        "halved time at halved budget localises the cost to the CG matvec",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "GLOBALBA_PROFILE_r04.json"
        ),
    )
    args = ap.parse_args()

    import jax

    from structure_from_motion_tpu.config import (
        CapacityConfig,
        FrontendConfig,
        PipelineConfig,
    )
    from structure_from_motion_tpu.io import upenn_intrinsics
    from structure_from_motion_tpu.models import IncrementalSfM
    from structure_from_motion_tpu.models.global_ba import (
        build_global_problem,
        solve_global,
    )

    cfg = PipelineConfig(
        frontend=FrontendConfig(
            max_keypoints=args.max_kp, upsample_first_octave=False
        ),
        capacity=CapacityConfig(
            max_views=args.window,
            max_keypoints=args.max_kp,
            max_points=8192,
            max_observations=32768,
        ),
        window_size=args.window,
        window_mode="slide",
    )
    engine = IncrementalSfM(cfg, upenn_intrinsics(), frontend="native")
    frame = engine.load_checkpoint(args.ckpt)
    n_live = min(frame, engine._window)
    ba_cfg = cfg.ba
    if args.pcg_iters:
        import dataclasses

        ba_cfg = dataclasses.replace(ba_cfg, pcg_iterations=args.pcg_iters)

    t0 = time.time()
    prob = build_global_problem(engine.state, engine._archive, n_live)
    t_build = time.time() - t0
    print(
        f"problem: cams={prob.n_cams} points={prob.n_points} "
        f"obs={prob.n_obs} max_track={prob.max_track_len} "
        f"(assembly {t_build:.1f}s)",
        flush=True,
    )

    t0 = time.time()
    out1, costs1 = solve_global(prob, ba_cfg, iterations=args.iters)
    np.asarray(out1.C)  # fetch barrier
    t_first = time.time() - t0
    print(f"first call (trace+compile+execute): {t_first:.1f}s", flush=True)

    # min over repeats: the tunnelled chip shows large run-to-run variance
    # (measured same-code execute 4.5-6.5 s within minutes) — the MIN is
    # the honest on-chip cost, the spread is tunnel/host contention
    execs = []
    for _ in range(3):
        t0 = time.time()
        out2, costs2 = solve_global(prob, ba_cfg, iterations=args.iters)
        np.asarray(out2.C)
        execs.append(time.time() - t0)
    t_second = min(execs)
    print(f"execute-only calls: {[round(t, 2) for t in execs]}s", flush=True)

    report = {
        "config": "whole-trajectory global BA wall decomposition",
        "device": jax.default_backend(),
        "checkpoint": os.path.basename(args.ckpt),
        "cameras": prob.n_cams,
        "points": prob.n_points,
        "observations": prob.n_obs,
        "max_track_len": prob.max_track_len,
        "lm_iterations": args.iters,
        "assembly_s": round(t_build, 2),
        "first_call_s": round(t_first, 2),
        "execute_s": round(t_second, 2),
        "execute_s_reps": [round(t, 2) for t in execs],
        "compile_s_approx": round(t_first - t_second, 2),
        "execute_ms_per_lm_iter": round(1e3 * t_second / args.iters, 1),
        "cost_first_to_last": [float(costs2[0]), float(costs2[-1])],
        "note": "first call pays jax tracing + XLA compile on the "
        "single-CPU host; the second call reuses the jitted scan, so it "
        "is the honest on-chip cost of the solve",
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
