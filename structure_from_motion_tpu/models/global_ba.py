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
    A = len(archive)
    dt = np.asarray(state.cam_C).dtype

    cam_C = np.asarray(state.cam_C)[:n_live]
    cam_q = np.asarray(state.cam_q)[:n_live]
    cam_K = np.asarray(state.K)[:n_live]
    if A:
        cam_C = np.concatenate([np.stack([np.asarray(r.C) for r in archive]), cam_C])
        cam_q = np.concatenate([np.stack([np.asarray(r.q) for r in archive]), cam_q])
        cam_K = np.concatenate([np.stack([np.asarray(r.K) for r in archive]), cam_K])
    F = A + n_live

    # -- observation union (cam, gid, uv) ---------------------------------
    cams, gids, uvs = [], [], []
    for i, r in enumerate(archive):
        v = np.asarray(r.valid)
        cams.append(np.full(int(v.sum()), i, np.int32))
        gids.append(np.asarray(r.gid)[v])
        uvs.append(np.asarray(r.uv)[v])
    lv = np.asarray(state.obs_valid)
    live_pt = np.asarray(state.obs_pt)[lv]
    cams.append(np.asarray(state.obs_cam)[lv].astype(np.int32) + A)
    gids.append(np.asarray(state.pt_gid)[live_pt])
    uvs.append(np.asarray(state.obs_uv)[lv])
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
    X_seed = np.zeros((max(P_real, 1), 3), dt)
    for r in archive:
        v = np.asarray(r.valid)
        g = np.asarray(r.gid)[v]
        j = np.searchsorted(sel, g)
        j = np.clip(j, 0, max(P_real - 1, 0))
        ok = sel[j] == g if P_real else np.zeros(g.shape, bool)
        X_seed[j[ok]] = np.asarray(r.X)[v][ok]
    live_mask = np.asarray(state.pt_valid)
    g = np.asarray(state.pt_gid)[live_mask]
    j = np.searchsorted(sel, np.clip(g, 0, None))
    j = np.clip(j, 0, max(P_real - 1, 0))
    ok = np.logical_and(g >= 0, sel[j] == g) if P_real else np.zeros(g.shape, bool)
    X_seed[j[ok]] = np.asarray(state.points)[live_mask][ok]

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


def solve_global(
    problem: GlobalProblem,
    ba_config: BAConfig,
    iterations: int = 20,
    num_shards: int = 1,
) -> tuple["BAState", np.ndarray]:
    """Run (optionally sharded) Schur-LM over a reassembled global problem.

    ``num_shards > 1`` uses the distributed layout of
    ``parallel/ba_sharded.py`` — points/observations sharded, cameras
    replicated, one psum'd reduced system per LM iteration. ELL packing is
    sized to the measured longest track instead of the camera count, so the
    per-iteration streams stay proportional to the real observation load.
    """
    ell_rows = max(problem.max_track_len, 1)
    M = int(problem.state.X.shape[0])
    O = int(problem.obs.cam.shape[0])
    # ELL pads every point to the LONGEST track; with heavy revisits (one
    # landmark observed by hundreds of cameras) that padding dwarfs the
    # real observation load and the CSR segment-sum stream is cheaper.
    if M * ell_rows > 8 * O:
        cfg = dataclasses.replace(
            ba_config, iterations=iterations, obs_layout="csr"
        )
    else:
        cfg = dataclasses.replace(
            ba_config, iterations=iterations, ell_rows=ell_rows
        )
    if num_shards <= 1:
        from structure_from_motion_tpu.ops.ba import run_bundle_adjustment

        out, costs = run_bundle_adjustment(problem.state, problem.obs, cfg)
        return out, np.asarray(costs)

    from structure_from_motion_tpu.parallel.ba_sharded import (
        deinterleave_points,
        interleave_points,
        partition_observations,
        sharded_bundle_adjustment,
    )
    from structure_from_motion_tpu.parallel.mesh import make_mesh

    S = num_shards
    M = problem.state.X.shape[0]
    O = problem.obs.cam.shape[0]
    # per-shard bucket: balanced load + slack for round-robin imbalance
    bucket = _round_up(int(np.ceil(O / S * 1.25)), 8)
    part = partition_observations(problem.obs, M, S, bucket, interleave=True)
    st_p = problem.state._replace(
        X=interleave_points(problem.state.X, S),
        pt_valid=interleave_points(problem.state.pt_valid, S),
    )
    out, costs = sharded_bundle_adjustment(st_p, part, cfg, make_mesh(S))
    out = out._replace(X=deinterleave_points(out.X, S))
    return out, np.asarray(costs)
