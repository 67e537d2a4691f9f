"""Per-stage wall breakdown of one BA LM iteration on the current device.

VERDICT round-2 item 1 asked for evidence of where the 30 ms/LM-iteration
at V=32 / 131k obs actually goes ("latency-bound" was asserted, not
proven). This script times each stage of the iteration as its own jitted
program (device-fetch bracketed, warm cache) so the gap decomposes into
named pieces:

    argsort          once-per-BA-call point sort (hoisted out of LM loop)
    pallas_assemble  fused residual/Jacobian/block kernel (U, b_c on-chip)
    point_segsum     D + b_p sorted segment-sums (the CSR scatter path)
    g_scatter        (M,V,7,3) coupling scatter build (dense-Schur path)
    s_coupling       G Dinv G^T einsum -> (V,7,7,V)
    dense_solve      (7V,7V) Cholesky solve
    backsub          point back-substitution segment-sum
    full_iter        the real fused LM iteration (1 iter, amortized over
                     a 20-iteration scan dispatch)

Writes JSON to stdout and (if --out) a file. Run on the real TPU:

    python examples/profile_ba_breakdown.py --views 32 --points 16384 \
        --obs 131072 --out BA_PROFILE_r03.json

Timing note: on the tunnelled TPU backend ``block_until_ready`` returns
before execution finishes; every timed region therefore ends with a real
device->host scalar fetch, and per-dispatch tunnel latency is measured
separately (``dispatch_overhead_ms``) via an empty-add program so stage
numbers can be read net of it.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=7, inner=1):
    """Median wall seconds of fn(*args) with a scalar-fetch barrier."""
    out = fn(*args)
    _fetch(out)  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts))


def _note(r, key, val):
    r[key] = val
    print(f"  {key}: {val:.3f}", flush=True)


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    np.asarray(jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--obs", type=int, default=131072)
    ap.add_argument("--ell-rows", type=int, default=8)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--trace-dir", type=str, default="")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from structure_from_motion_tpu.config import BAConfig
    from structure_from_motion_tpu.ops import ba as ba_mod
    from structure_from_motion_tpu.ops.ba import run_bundle_adjustment

    V, M, O = args.views, args.points, args.obs
    cfg = BAConfig(iterations=1, damping=5.0, huber_delta=0.01)
    state, obs = ge._synthetic_ba_problem(
        n_views=V, n_points=M, cap_v=V, cap_m=M, cap_o=O
    )
    dev = jax.devices()[0].platform
    r = {"device": dev, "views": V, "points": M, "obs": O}

    # dispatch + fetch overhead of a trivial program (the tunnel floor)
    x0 = jnp.zeros((8, 128), jnp.float32)
    triv = jax.jit(lambda x: x + 1.0)
    _note(r, "dispatch_overhead_ms", timeit(triv, x0) * 1e3)

    # once-per-call sort
    sort_f = jax.jit(ba_mod._sort_obs_by_point)
    _note(r, "argsort_ms", timeit(sort_f, obs) * 1e3)
    obs_s = jax.device_get(sort_f(obs))
    obs_s = type(obs)(*[jnp.asarray(a) for a in obs_s])

    # stage: full assemble (pallas on tpu) incl. point segment sums
    asm = jax.jit(lambda s, o: ba_mod._assemble(s, o, cfg, True))
    _note(r, "assemble_ms", timeit(asm, state, obs_s) * 1e3)
    U, D, W, b_c, b_p, cost = jax.block_until_ready(asm(state, obs_s))

    # stage: pallas kernel alone (no point segment-sums)
    if ba_mod._use_pallas(cfg, O) or dev != "tpu":
        from structure_from_motion_tpu.ops.ba_pallas import pallas_ba_blocks

        def pk(s, o):
            w = o.valid.astype(jnp.float32)
            return pallas_ba_blocks(
                o.cam, s.C[o.cam], s.q[o.cam], s.X[o.point], o.uv_norm, w,
                n_views=V, huber_delta=0.01, interpret=dev != "tpu",
            )
        _note(r, "pallas_kernel_ms", timeit(jax.jit(pk), state, obs_s) * 1e3)

    # stage: the two point-axis segment sums (sorted)
    def segsums(dtd, bp, pt):
        d = jax.ops.segment_sum(dtd, pt, num_segments=M, indices_are_sorted=True)
        b = jax.ops.segment_sum(bp, pt, num_segments=M, indices_are_sorted=True)
        return d, b
    dtd_in = jnp.ones((O, 3, 3), jnp.float32)
    bp_in = jnp.ones((O, 3), jnp.float32)
    _note(r, "point_segsum_ms", timeit(jax.jit(segsums), dtd_in, bp_in, obs_s.point) * 1e3)

    # stage: G scatter (the (M,V,7,3) coupling build)
    def g_scatter(w, pt, cam):
        return jnp.zeros((M, V, 7, 3), jnp.float32).at[pt, cam].add(w)
    _note(r, "g_scatter_ms", timeit(jax.jit(g_scatter), W, obs_s.point, obs_s.cam) * 1e3)
    G = jax.block_until_ready(jax.jit(g_scatter)(W, obs_s.point, obs_s.cam))

    # stage: S coupling einsum
    Dinv = jnp.linalg.inv(D + 5.0 * jnp.eye(3)[None])
    def s_coup(G, Dinv):
        return jnp.einsum("mvic,mcd,mwjd->vijw", G, Dinv, G)
    _note(r, "s_coupling_ms", timeit(jax.jit(s_coup), G, Dinv) * 1e3)

    # stage: dense reduced solve
    from structure_from_motion_tpu.ops.linalg import solve_psd
    S = np.random.default_rng(0).normal(size=(7 * V, 7 * V)).astype(np.float32)
    S = jnp.asarray(S @ S.T + 7 * V * np.eye(7 * V, dtype=np.float32))
    b = jnp.ones((7 * V,), jnp.float32)
    _note(r, "dense_solve_ms", timeit(jax.jit(solve_psd), S, b) * 1e3)

    # stage: back-substitution segment-sum
    def backsub(W, dc, pt, cam):
        t = jnp.einsum("oic,oi->oc", W, dc[cam])
        Gt = jax.ops.segment_sum(t, pt, num_segments=M, indices_are_sorted=True)
        return jnp.einsum("mcd,md->mc", Dinv, b_p - Gt)
    dc = jnp.zeros((V, 7), jnp.float32)
    _note(r, "backsub_ms", timeit(jax.jit(backsub), W, dc, obs_s.point, obs_s.cam) * 1e3)

    # ---- ELL layout stages (the round-3 default) --------------------------
    T = args.ell_rows
    ell_f = jax.jit(lambda o: ba_mod._to_ell(o, M, T))
    _note(r, "ell_convert_ms", timeit(ell_f, obs) * 1e3)
    obs_e = jax.block_until_ready(ell_f(obs))
    cfg_e = BAConfig(iterations=1, damping=5.0, huber_delta=0.01, ell_rows=T)
    lay_e = ba_mod.ObsLayout(ell_rows=T)
    asm_e = jax.jit(lambda s, o: ba_mod._assemble(s, o, cfg_e, True, lay_e))
    _note(r, "ell_assemble_ms", timeit(asm_e, state, obs_e) * 1e3)
    W_e = jax.block_until_ready(asm_e(state, obs_e))[2]

    def g_onehot(w, cam):
        ohc = jax.nn.one_hot(cam.reshape(M, T), V, dtype=jnp.float32)
        return jnp.einsum("mtv,mtic->mvic", ohc, w.reshape(M, T, 7, 3))
    _note(r, "ell_g_onehot_ms", timeit(jax.jit(g_onehot), W_e, obs_e.cam) * 1e3)

    # the real thing: ms per LM iteration inside one scanned dispatch
    iters = 20
    for name, cfg20 in [
        ("full_lm_iter_ell_ms", BAConfig(iterations=iters, damping=5.0,
                                         huber_delta=0.01, ell_rows=T)),
        ("full_lm_iter_csr_ms", BAConfig(iterations=iters, damping=5.0,
                                         huber_delta=0.01, obs_layout="csr")),
    ]:
        full = jax.jit(
            lambda s, o, c=cfg20: run_bundle_adjustment(s, o, c)[1]
        )
        _note(r, name, timeit(full, state, obs, reps=5, inner=iters) * 1e3)

    if args.trace_dir:
        cfg_tr = BAConfig(
            iterations=iters, damping=5.0, huber_delta=0.01, ell_rows=T
        )
        ftr = jax.jit(lambda s, o: run_bundle_adjustment(s, o, cfg_tr)[1])
        _fetch(ftr(state, obs))  # compile outside the trace
        with jax.profiler.trace(args.trace_dir):
            _fetch(ftr(state, obs))
        r["trace_dir"] = args.trace_dir

    print(json.dumps(r, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(r, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
