"""Final global bundle adjustment over an entire sliding-window run.

The reference bundle-adjusts ALL views on every frame
(``ba_processor.py:274-439``) — affordable at its 6-view scale, impossible
for long sequences. Our pipeline keeps per-frame cost constant with a
sliding window, which freezes each camera's pose at eviction
(``models/incremental.py``). This module restores the reference's global
consistency once, at the end of the run: the eviction archive
(:class:`~structure_from_motion_tpu.models.tracks.EvictionRecord`, one per
evicted view) and the live window reassemble into ONE bundle-adjustment
problem over every camera the run ever saw, keyed by the persistent global
point ids (``SfMState.pt_gid``), and solved by the same Schur-LM engine —
optionally sharded over a device mesh (``parallel/ba_sharded.py``) exactly
like the per-frame BA, since the reassembled problem is just a bigger
``BAState``/``BAObservations`` pair.

Assembly is host-side numpy: it runs once per reconstruction, its shapes
are data-dependent (unknown union of global ids), and keeping it off the
device lets the solve itself stay a single fixed-shape jitted program.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import numpy as np

from structure_from_motion_tpu.config import BAConfig
from structure_from_motion_tpu.models.tracks import EvictionRecord, SfMState
from structure_from_motion_tpu.ops.ba import BAObservations, BAState


class GlobalProblem(NamedTuple):
    """A reassembled whole-trajectory BA problem plus the bookkeeping
    needed to scatter the refined result back into the engine."""

    state: "BAState"  # cameras = [archived..., live window...]
    obs: "BAObservations"
    gids: np.ndarray  # (P,) global point id per (padded) point row, -1 pad
    n_cams: int  # real cameras (rows beyond are absent — none; V is exact)
    n_points: int  # real points (rows beyond are padding)
    n_obs: int  # real observations (rows beyond are padding)
    max_track_len: int  # max observations of any selected point


def _round_up(n: int, mult: int) -> int:
    return ((max(n, 1) + mult - 1) // mult) * mult


def _stack_archive(archive: Sequence[EvictionRecord]) -> EvictionRecord | None:
    """One ``EvictionRecord`` of stacked host-numpy arrays (leading axis =
    eviction order). Fetching device-resident records field-by-field per
    record costs thousands of tunnel round trips (measured: ~270 s of the
    500-camera global assembly), so records are kept host-readable
    instead: live-run evictions async-copy to host at eviction time and
    checkpoint loads produce numpy, making this a pure host stack."""
    if not archive:
        return None
    # np.asarray per leaf is cheap: live-run records were async-copied to
    # host at eviction time (incremental._begin_frame), checkpoint-loaded
    # records are numpy already. Device-side stacking is NOT an option on
    # the tunnelled chip — one many-operand concatenate dispatch measured
    # minutes of wall time.
    return EvictionRecord(
        *[
            np.stack([np.asarray(getattr(r, f)) for r in archive])
            for f in EvictionRecord._fields
        ]
    )


def build_global_problem(
    state: SfMState,
    archive: Sequence[EvictionRecord],
    n_live: int,
    min_obs: int = 2,
    pad_multiple: int = 256,
) -> GlobalProblem:
    """Union the eviction archive with the live window into one BA problem.

    Cameras: ``len(archive)`` archived poses followed by the ``n_live``
    live-window poses (global camera index = eviction order, then window
    slot — the same order :meth:`IncrementalSfM.poses` reports).

    Points: every global id observed ``>= min_obs`` times across the union
    (single-observation points are unconstrained along their ray). Seeds:
    the LIVE position when the point is still alive, else the position
    archived at its last eviction (later evictions saw a more refined map,
    so later records overwrite earlier ones).

    Observations are normalized per-camera with each view's own intrinsics
    (per-view K is first-class, matching the reference's per-image ``k``,
    ``view_processor.py:14-98``). Point/observation axes are padded to
    ``pad_multiple`` so repeated calls at similar scales reuse compiles and
    the arrays divide evenly across BA shards.
    """
    import jax

    A = len(archive)
    # ONE grouped device_get: async host copies are issued for every leaf
    # before the first blocking read, so the whole state costs ~one tunnel
    # round trip instead of one per array (each separate np.asarray of a
    # device array is a full round trip through the TPU tunnel)
    (
        st_cam_C, st_cam_q, st_K, st_obs_valid, st_obs_pt, st_obs_cam,
        st_obs_uv, st_pt_gid, st_pt_valid, st_points,
    ) = jax.device_get(
        (
            state.cam_C, state.cam_q, state.K, state.obs_valid,
            state.obs_pt, state.obs_cam, state.obs_uv, state.pt_gid,
            state.pt_valid, state.points,
        )
    )
    dt = st_cam_C.dtype

    cam_C = st_cam_C[:n_live]
    cam_q = st_cam_q[:n_live]
    cam_K = st_K[:n_live]
    arc = _stack_archive(archive)
    if A:
        cam_C = np.concatenate([arc.C, cam_C])
        cam_q = np.concatenate([arc.q, cam_q])
        cam_K = np.concatenate([arc.K, cam_K])
    F = A + n_live

    # -- observation union (cam, gid, uv) ---------------------------------
    cams, gids, uvs = [], [], []
    if A:
        v = arc.valid  # (A, Kk)
        cams.append(np.repeat(np.arange(A, dtype=np.int32), v.sum(axis=1)))
        gids.append(arc.gid[v])
        uvs.append(arc.uv[v])
    lv = st_obs_valid
    live_pt = st_obs_pt[lv]
    cams.append(st_obs_cam[lv].astype(np.int32) + A)
    gids.append(st_pt_gid[live_pt])
    uvs.append(st_obs_uv[lv])
    cam = np.concatenate(cams)
    gid = np.concatenate(gids)
    uv = np.concatenate(uvs)

    # -- select global ids with enough support ----------------------------
    uniq, counts = np.unique(gid[gid >= 0], return_counts=True)
    sel = uniq[counts >= min_obs]
    max_track = int(counts[counts >= min_obs].max()) if sel.size else 0
    P_real = int(sel.size)

    idx = np.searchsorted(sel, gid)  # candidate dense index per obs
    idx = np.clip(idx, 0, max(P_real - 1, 0))
    keep = np.logical_and(gid >= 0, sel[idx] == gid) if P_real else np.zeros(gid.shape, bool)
    cam, uv, pt_idx = cam[keep], uv[keep], idx[keep]
    O_real = int(cam.shape[0])

    # -- point seeds: archived (in eviction order), live overrides --------
    # flattened in ascending eviction order: numpy fancy assignment with
    # duplicate indices keeps the LAST write, so later (more refined)
    # evictions overwrite earlier ones — same semantics as the per-record
    # loop this replaces, without A round trips
    X_seed = np.zeros((max(P_real, 1), 3), dt)
    if A:
        v = arc.valid
        g = arc.gid[v]
        j = np.searchsorted(sel, g)
        j = np.clip(j, 0, max(P_real - 1, 0))
        ok = sel[j] == g if P_real else np.zeros(g.shape, bool)
        X_seed[j[ok]] = arc.X[v][ok]
    live_mask = st_pt_valid
    g = st_pt_gid[live_mask]
    j = np.searchsorted(sel, np.clip(g, 0, None))
    j = np.clip(j, 0, max(P_real - 1, 0))
    ok = np.logical_and(g >= 0, sel[j] == g) if P_real else np.zeros(g.shape, bool)
    X_seed[j[ok]] = st_points[live_mask][ok]

    # -- normalize pixel coords with each camera's own K ------------------
    Kinv = np.linalg.inv(cam_K)  # (F,3,3)
    ones = np.ones((O_real, 1), dt)
    uvh = np.concatenate([uv, ones], axis=1)
    uvn = np.einsum("oij,oj->oi", Kinv[cam], uvh)[:, :2].astype(dt)

    # -- pad to fixed capacities ------------------------------------------
    P_pad = _round_up(P_real, pad_multiple)
    O_pad = _round_up(O_real, pad_multiple)
    import jax.numpy as jnp

    ba_state = BAState(
        C=jnp.asarray(cam_C),
        q=jnp.asarray(cam_q),
        X=jnp.asarray(np.concatenate([X_seed[:P_real], np.zeros((P_pad - P_real, 3), dt)])),
        cam_valid=jnp.ones((F,), bool),
        pt_valid=jnp.asarray(np.arange(P_pad) < P_real),
    )
    obs = BAObservations(
        cam=jnp.asarray(np.concatenate([cam, np.zeros(O_pad - O_real, np.int32)])),
        point=jnp.asarray(
            np.concatenate([pt_idx.astype(np.int32), np.zeros(O_pad - O_real, np.int32)])
        ),
        uv_norm=jnp.asarray(np.concatenate([uvn, np.zeros((O_pad - O_real, 2), dt)])),
        valid=jnp.asarray(np.arange(O_pad) < O_real),
    )
    gids_out = np.full((P_pad,), -1, np.int64)
    gids_out[:P_real] = sel
    return GlobalProblem(ba_state, obs, gids_out, F, P_real, O_real, max_track)


def choose_tiers(
    counts_desc: np.ndarray, round_to: int = 256
) -> tuple[tuple[int, int], ...]:
    """Static tier partition ((n_points, rows), ...) for a descending
    track-length histogram: tier boundaries at power-of-2 count values,
    rows = the tier's maximum count, tier sizes rounded up (pulling
    shorter-track points up into the roomier tier — only padding slots,
    never dropped observations). Total slots land at ~1.2-1.5x the
    observation count on power-law histograms where a single uniform row
    count needs max-track x points slots.

    Slot budget: the power-of-2 boundaries alone bound the NATURAL slots at
    <2x the observation count (every in-tier count is > rows/2). The
    rounding pull-up is what could blow past that on degenerate histograms
    (a handful of 10k-observation tracks rounded up to 256 points x 10k
    rows). On such tiers — and ONLY such tiers — the rounding step drops to
    a smaller 8-multiple sized to a padding budget. Ordinary power-law
    histograms keep the exact legacy 256-point rounding: tier sizes and
    slot-region offsets stay large multiples, which the downstream
    per-tier stream slices want (odd tier sizes measured ~2x the
    whole-solve execute time on the 500-camera profile — misaligned slice
    starts relayout the (O, 21) stream every CG iteration)."""
    M = int(counts_desc.size)
    total_obs = int(counts_desc.sum())
    budget = max(64 * round_to, total_obs // 2)
    tiers: list = []
    i = 0
    while i < M and counts_desc[i] > 0:
        c = int(counts_desc[i])
        # tier covers counts in (pow2/2, pow2]
        pow2 = 1 << (c - 1).bit_length() if c > 1 else 1
        j = int(np.searchsorted(-counts_desc, -(pow2 // 2), side="left"))
        j = max(j, i + 1)
        step = round_to
        pad_pts = (-(j - i)) % step
        if pad_pts * c > budget:
            # degenerate pull-up (few ultra-long tracks): bound the padding
            step = max(8, (budget // c) // 8 * 8)
        j = min(i + _round_up(j - i, step), M)
        tiers.append((j - i, int(counts_desc[i])))
        i = j
    if i < M:
        tiers.append((M - i, 0))  # zero-observation (padding) points
    return tuple(tiers)


def pack_tiered(
    obs: "BAObservations",
    tiers: tuple,
    order: np.ndarray,
    align: int = 512,
) -> "BAObservations":
    """Host-side numpy packing of an observation stream into the tiered-ELL
    layout (``BAConfig.obs_layout='tiered'``): point ids must ALREADY be
    renumbered by descending track length (``order``: original id of each
    new row — the same permutation applied to the problem's point arrays),
    tier t owns the next ``n_t`` points x ``rows_t`` slots, stream padded
    to an ``align`` multiple (fused Pallas assembly tile). Runs once per
    global solve; every LM/CG iteration downstream is scatter-free."""
    point = np.asarray(obs.point)
    cam = np.asarray(obs.cam)
    uv = np.asarray(obs.uv_norm)
    valid = np.asarray(obs.valid)

    newid = np.empty(order.size, np.int64)
    newid[order] = np.arange(order.size)

    # per-new-point slot base from the static tier partition
    base = np.empty(order.size, np.int64)
    rows_of = np.empty(order.size, np.int64)
    p0, s0 = 0, 0
    for n, r in tiers:
        base[p0 : p0 + n] = s0 + np.arange(n, dtype=np.int64) * r
        rows_of[p0 : p0 + n] = r
        p0 += n
        s0 += n * r
    total = s0 + (-s0) % align

    np_v = newid[point[valid]]
    o2 = np.argsort(np_v, kind="stable")
    np_s = np_v[o2]
    first = np.searchsorted(np_s, np_s)  # index of first occurrence
    rank = np.arange(np_s.size) - first
    dest = base[np_s] + rank

    cam_t = np.zeros(total, np.int32)
    uv_t = np.zeros((total, 2), uv.dtype)
    val_t = np.zeros(total, bool)
    pt_t = np.zeros(total, np.int32)
    p0, s0 = 0, 0
    for n, r in tiers:
        pt_t[s0 : s0 + n * r] = np.repeat(np.arange(p0, p0 + n, dtype=np.int32), r)
        p0 += n
        s0 += n * r
    cam_t[dest] = cam[valid][o2]
    uv_t[dest] = uv[valid][o2]
    val_t[dest] = True

    import jax.numpy as jnp

    return BAObservations(
        cam=jnp.asarray(cam_t),
        point=jnp.asarray(pt_t),
        uv_norm=jnp.asarray(uv_t),
        valid=jnp.asarray(val_t),
    )


_SPILL_COST = 12  # relative cost of one CSR-tail slot vs one dense ELL slot


def _choose_ell_rows(counts: np.ndarray, m_pad: int) -> tuple[int, int]:
    """Pick the hybrid-ELL row count from the track-length histogram.

    Minimises ``m_pad * rows + _SPILL_COST * spilled(rows)`` where
    ``spilled(rows)`` is the number of observations past each point's first
    ``rows`` — the dense stream is priced per slot, spilled observations at
    the measured ~12x premium of a TPU scatter/segment-sum row over a dense
    reshape-sum slot. Returns (rows, spilled). With heavy revisits this
    lands near the ~p95 track length: the few hundred-camera landmarks
    spill into a short tail instead of padding EVERY point to the longest
    track (the round-3 failure that forced whole-trajectory BA back onto
    the CSR path at ~5.5 s per LM iteration)."""
    if counts.size == 0 or counts.max() == 0:
        return 1, 0
    max_t = int(counts.max())
    hist = np.bincount(counts, minlength=max_t + 2)
    ge = np.cumsum(hist[::-1])[::-1]  # ge[k] = #points with count >= k
    suffix = np.concatenate([np.cumsum(ge[::-1])[::-1], [0]])
    rows = np.arange(1, max_t + 1)
    spilled = suffix[rows + 1]  # sum_{c > r} (c - r) * hist[c]
    cost = m_pad * rows.astype(np.int64) + _SPILL_COST * spilled
    best = int(np.argmin(cost))
    return int(rows[best]), int(spilled[best])


def _align_tail(n_dense: int, tail: int, mult: int = 512) -> int:
    """Pad the tail so the packed stream length is tile-aligned (the fused
    Pallas assembly kernel wants a 512-row multiple; padding slots are
    masked invalid and cost only bandwidth)."""
    total = n_dense + tail
    return tail + (-total) % mult


def solve_global(
    problem: GlobalProblem,
    ba_config: BAConfig,
    iterations: int = 20,
    num_shards: int = 1,
) -> tuple["BAState", np.ndarray]:
    """Run (optionally sharded) Schur-LM over a reassembled global problem.

    ``num_shards > 1`` uses the distributed layout of
    ``parallel/ba_sharded.py`` — points/observations sharded, cameras
    replicated, one psum'd reduced system per LM iteration.

    The observation layout is sized host-side from the problem's own
    histograms (assembly runs once per reconstruction; the solve must not
    pay for rare long tracks). Single device: tiered ELL — points
    renumbered by descending track length, per-tier row counts, every
    point reduction a dense reshape-sum (``choose_tiers``/``pack_tiered``)
    — with the Pallas matvec kernels fusing the per-CG camera
    expand/reduce on TPU (``ops/ba_matvec_pallas.py``). Sharded: hybrid
    ELL per shard (uniform rows + CSR spill tail). Both size the
    camera-ELL reduction (``BAConfig.cam_rows``) to the busiest camera so
    no PCG iteration materialises an (O, V) one-hot operand."""
    from structure_from_motion_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    import jax

    # grouped fetch: one tunnel round trip for all three streams
    point, cam, valid = jax.device_get(
        (problem.obs.point, problem.obs.cam, problem.obs.valid)
    )
    V = int(problem.state.C.shape[0])
    M_pad = int(problem.state.X.shape[0])

    if num_shards <= 1:
        # tiered ELL: renumber points by descending track length so every
        # point-axis reduction is a concat of per-tier dense reshape-sums
        # in point order — no scatters/segment-sums in the LM/CG loops, and
        # no max-track padding (the single-level hybrid's failure mode on
        # the power-law histograms long revisit loops produce)
        import jax.numpy as jnp

        counts = np.bincount(point[valid], minlength=M_pad)
        order = np.argsort(-counts, kind="stable")
        tiers = choose_tiers(counts[order])
        obs_t = pack_tiered(problem.obs, tiers, order)
        X_np, pv_np = jax.device_get((problem.state.X, problem.state.pt_valid))
        st = problem.state._replace(
            X=jnp.asarray(X_np[order]),
            pt_valid=jnp.asarray(pv_np[order]),
        )
        cam_max = int(np.bincount(cam[valid], minlength=V).max())
        # camera-ELL pays off once the (O, V) one-hot operand outweighs the
        # permuted stream; at windowed V the MXU one-hot matmul wins
        cam_rows = _round_up(cam_max, 8) if V >= 64 else 0
        cfg = dataclasses.replace(
            ba_config, iterations=iterations, obs_layout="tiered",
            tiers=tiers, ell_rows=0, ell_tail=0, cam_rows=cam_rows,
        )
        from structure_from_motion_tpu.ops.ba import run_bundle_adjustment

        out, costs = run_bundle_adjustment(st, obs_t, cfg)
        # un-permute the refined points back to the problem's original order
        Xo_np, pvo_np = jax.device_get((out.X, out.pt_valid))
        X = np.empty_like(Xo_np)
        X[order] = Xo_np
        pv = np.empty_like(pvo_np)
        pv[order] = pvo_np
        out = out._replace(X=jnp.asarray(X), pt_valid=jnp.asarray(pv))
        return out, np.asarray(costs)

    from structure_from_motion_tpu.parallel.ba_sharded import (
        deinterleave_points,
        interleave_points,
        partition_observations,
        sharded_bundle_adjustment,
    )
    from structure_from_motion_tpu.parallel.mesh import make_mesh

    S = num_shards
    M = M_pad
    O = problem.obs.cam.shape[0]
    # per-shard static layout: rows shared (one compiled program), tail and
    # cam_rows sized to the worst shard (interleaved point placement:
    # point p lives on shard p % S, and its observations with it)
    counts = np.bincount(point[valid], minlength=M)
    rows, _ = _choose_ell_rows(counts, M)
    pt_shard = point % S
    obs_shard = pt_shard[valid]
    spill_per_obs_pt = np.maximum(counts - rows, 0)
    spill_shard = np.bincount(
        np.arange(M) % S, weights=spill_per_obs_pt, minlength=S
    )
    tail = _align_tail((M // S) * rows, int(spill_shard.max()))
    cam_max = max(
        int(np.bincount(cam[valid][obs_shard == s], minlength=V).max())
        for s in range(S)
    )
    cam_rows = _round_up(cam_max, 8) if V >= 64 else 0
    cfg = dataclasses.replace(
        ba_config, iterations=iterations, obs_layout="ell",
        ell_rows=rows, ell_tail=tail, cam_rows=cam_rows,
    )
    # per-shard bucket: balanced load + slack for round-robin imbalance
    bucket = _round_up(int(np.ceil(O / S * 1.25)), 8)
    part = partition_observations(problem.obs, M, S, bucket, interleave=True)
    st_p = problem.state._replace(
        X=interleave_points(problem.state.X, S),
        pt_valid=interleave_points(problem.state.pt_valid, S),
    )
    mesh = make_mesh(S)
    if jax.process_count() > 1:
        # multi-host runtime (jax.distributed): every process assembled the
        # identical host-side problem, so global arrays are built
        # shard-by-shard from the local copy and the shard_map spans all
        # processes — the whole-trajectory analogue of the per-frame
        # 2-process BA path exercised by tests/test_distributed.py.
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec

        shard = PartitionSpec(tuple(mesh.axis_names))
        rep = PartitionSpec()

        def to_global(arr, spec):
            a = np.asarray(arr)
            return jax.make_array_from_callback(
                a.shape, NamedSharding(mesh, spec), lambda idx: a[idx]
            )

        st_g = BAState(
            C=to_global(st_p.C, rep),
            q=to_global(st_p.q, rep),
            X=to_global(st_p.X, shard),
            cam_valid=to_global(st_p.cam_valid, rep),
            pt_valid=to_global(st_p.pt_valid, shard),
        )
        obs_g = BAObservations(
            cam=to_global(part.cam, shard),
            point=to_global(part.point, shard),
            uv_norm=to_global(part.uv_norm, shard),
            valid=to_global(part.valid, shard),
        )
        out, costs = sharded_bundle_adjustment(st_g, obs_g, cfg, mesh)
        # point shards live on remote processes; one all-gather makes the
        # refined map locally addressable everywhere for the write-back
        gather = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, rep))
        X_full = np.asarray(gather(out.X).addressable_data(0))
        pv_full = np.asarray(gather(out.pt_valid).addressable_data(0))
        out = BAState(
            C=jnp.asarray(np.asarray(out.C.addressable_data(0))),
            q=jnp.asarray(np.asarray(out.q.addressable_data(0))),
            X=deinterleave_points(jnp.asarray(X_full), S),
            cam_valid=jnp.asarray(np.asarray(out.cam_valid.addressable_data(0))),
            pt_valid=deinterleave_points(jnp.asarray(pv_full), S),
        )
        return out, np.asarray(costs.addressable_data(0))
    out, costs = sharded_bundle_adjustment(st_p, part, cfg, mesh)
    out = out._replace(X=deinterleave_points(out.X, S))
    return out, np.asarray(costs)
