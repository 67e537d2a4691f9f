"""The flagship model: incremental Structure-from-Motion.

Re-designs the reference orchestrator ``BaProcessor.process``
(``ba_processor.py:43-270``) as a host-side state machine over four jitted,
fixed-shape device stages (the only host decisions are the frame counter
and which stage to dispatch — every array stays on device between frames):

    frame 0   : store features, pin view 0 at the origin
    frame 1   : two-view bootstrap (F -> E -> 4 candidates -> per-candidate
                linear triangulation -> cheirality vote -> LM refinement)
    frame >= 2: localize against the most covisible view (PnP), triangulate
                the not-yet-constructed matches, run bundle adjustment

Deliberate improvements over the reference (each cited in the stage
docstrings): the reference's single-best-view localization (its
``find_best_view`` stub always returns 0) is superseded by PnP against the
union of correspondences from ALL prior views; newly triangulated points
must pass a positive-depth
(cheirality) gate before entering the map; PnP-inlier re-observations of
existing points are recorded, so bundle adjustment sees every view of a
point rather than only its creating pair; BA runs adaptive-damping LM.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from structure_from_motion_tpu.config import PipelineConfig
from structure_from_motion_tpu.models import tracks
from structure_from_motion_tpu.models.tracks import SfMState
from structure_from_motion_tpu.ops.ba import (
    BAObservations,
    BAState,
    run_bundle_adjustment,
)
from structure_from_motion_tpu.ops.campose import (
    candidate_projections,
    decompose_essential,
    disambiguate_poses,
    refine_relative_pose,
)
from structure_from_motion_tpu.ops.epipolar import (
    essential_from_fundamental,
    find_fundamental,
)
from structure_from_motion_tpu.ops.features import detect_and_describe
from structure_from_motion_tpu.ops.matching import match_descriptors
from structure_from_motion_tpu.ops.pnp import PnPResult, estimate_pnp
from structure_from_motion_tpu.ops.triangulation import (
    linear_triangulate,
    refine_triangulate,
    reprojection_residuals,
    triangulate,
)
from structure_from_motion_tpu.utils.geometry import (
    camera_projection,
    normalized_camera_coords,
    normalized_camera_coords_per_obs,
)
from structure_from_motion_tpu.utils.rotations import (
    quat_to_rotation,
    rotation_to_quat,
)


@functools.partial(jax.jit, static_argnames=("config",))
def _match_stage(
    state: SfMState, v: Array, key: Array, config: PipelineConfig
) -> SfMState:
    """Match view v against every prior view (reference ``add_new_view``,
    ``key_tracker.py:97-129``: the all-pairs O(V^2) policy). Sequential
    ``lax.map`` over the view axis keeps peak memory at one (K, K)
    distance matrix.

    With ``config.matcher.use_fundamental_gate`` each pair's matches are
    additionally filtered by a fundamental-matrix RANSAC inlier test
    (reference ``key_tracker.py:294-299``), which strictly shrinks the
    match set."""
    desc_v = state.kp_desc[v]
    valid_v = state.kp_valid[v]
    xy_v = state.kp_xy[v]
    V = state.kp_desc.shape[0]

    def per_view(u):
        res = match_descriptors(
            state.kp_desc[u], desc_v,
            jnp.logical_and(state.kp_valid[u], u < v), valid_v,
            config.matcher,
        )
        valid = res.valid
        if config.matcher.use_fundamental_gate:
            que_xy = xy_v[jnp.maximum(res.target, 0)]
            gate = find_fundamental(
                jax.random.fold_in(key, u),
                state.kp_xy[u],
                que_xy,
                valid,
                config.matcher.gate_ransac,
            )
            # only gate when enough matches exist for a meaningful model
            valid = jnp.where(
                jnp.sum(valid) >= 16, jnp.logical_and(valid, gate.inliers), valid
            )
        return res.target, valid

    targets, valids = jax.lax.map(per_view, jnp.arange(V))

    def write(u, st):
        return tracks.record_matches(st, u, v, targets[u], jnp.logical_and(valids[u], u < v))

    return jax.lax.fori_loop(0, V, write, state)


@functools.partial(jax.jit, static_argnames=("config",))
def _bootstrap_stage(state: SfMState, key: Array, config: PipelineConfig) -> tuple[SfMState, dict]:
    """Two-view bootstrap (reference ``ba_processor.py:63-135``) with draw
    redundancy: the whole map quality hangs on ONE F-RANSAC draw, and a
    wrong-basin essential estimate can look healthy on the pair itself
    (good two-view reprojection) while producing a depth-degenerate map no
    third view can localize against (observed: a seed whose frame-2 PnP
    got 3 inliers from 96 candidates). Two independent draws run inside
    the same program; each admits points through cheirality + epipolar
    inlier + reprojection gates, and the draw with more admitted points
    that ALSO clear the parallax threshold wins — wrong-basin geometry
    triangulates depth-degenerate low-parallax points in bulk, so its
    parallax-cleared count collapses even when raw admission looks normal.
    (Low-parallax points themselves stay in the map: pruning them cost
    0.5 px mean reprojection and ~20% of the map — they anchor rotation.)
    """
    k_a, k_b = jax.random.split(key)
    st_a, info_a = _bootstrap_once(state, k_a, config)
    st_b, info_b = _bootstrap_once(state, k_b, config)
    # selection metric: admitted points that ALSO clear the parallax
    # threshold — a wrong-basin essential fits its own pair (so admitted
    # counts look normal) but triangulates depth-degenerate, low-parallax
    # points in bulk, so this count collapses for the bad draw
    use_b = info_b["parallax_ok"] > info_a["parallax_ok"]
    st = jax.tree_util.tree_map(
        lambda a, b: jnp.where(use_b, b, a), st_a, st_b
    )
    info = jax.tree_util.tree_map(
        lambda a, b: jnp.where(use_b, b, a), info_a, info_b
    )
    info.pop("parallax_ok")
    return st, info


def _bootstrap_once(state: SfMState, key: Array, config: PipelineConfig) -> tuple[SfMState, dict]:
    ref_keys, que_keys, ref_xy, que_xy, valid = tracks.matched_pair_arrays(state, 0, 1)

    F = find_fundamental(key, ref_xy, que_xy, valid, config.fundamental_ransac)
    K0, K1 = state.K[0], state.K[1]  # per-view intrinsics (may differ)
    E = essential_from_fundamental(F.F, K0, K1)
    cands = decompose_essential(E)

    R0 = quat_to_rotation(state.cam_q[0])
    P_ref = camera_projection(K0, R0, state.cam_C[0])
    P_cands = candidate_projections(K1, cands)

    uv = jnp.stack([ref_xy, que_xy], axis=1)  # (K, 2 views, 2)
    obs_mask = jnp.stack([valid, valid], axis=1)
    X4 = jax.vmap(
        lambda P2: linear_triangulate(jnp.stack([P_ref, P2]), uv, obs_mask)
    )(P_cands)  # (4, K, 4)

    best, counts, cheir_ok = disambiguate_poses(P_ref, P_cands, X4, valid)

    # essential-manifold refinement of the winning (R, t): the 8-point
    # F -> E chain leaves ~10 deg of translation-direction error on real
    # pairs; Gauss-Newton on the Sampson error closes it (ops/campose.py)
    x1n = normalized_camera_coords(K0, ref_xy)
    x2n = normalized_camera_coords(K1, que_xy)
    R1, t1, C1 = refine_relative_pose(
        cands.R[best], cands.t[best], x1n, x2n,
        jnp.logical_and(valid, F.inliers),
    )
    state = tracks.set_camera(state, 1, C1, rotation_to_quat(R1))

    P1 = camera_projection(K1, R1, C1)
    # re-triangulate with the refined pose
    X2 = linear_triangulate(jnp.stack([P_ref, P1]), uv, obs_mask)
    refine_mask = jnp.stack([cheir_ok, cheir_ok], axis=1)
    Xh = refine_triangulate(
        jnp.stack([P_ref, P1]), uv, refine_mask, X2, config.triangulation_lm
    )

    # map admission: cheirality AND epipolar inlier AND two-view
    # reprojection (the reference admits every cheirality-positive match,
    # including F-RANSAC outliers, which poisons its map and BA with wrong
    # correspondences). Low-PARALLAX points are deliberately KEPT in the
    # map — measured: pruning them cost 0.5 px mean reprojection and ~20%
    # of the map on the throughput config (they anchor rotation even when
    # their depth is soft) — but they are counted separately as the
    # two-draw selection metric above.
    P_pair = jnp.stack([P_ref, P1])  # (2, 3, 4)
    res, _ = reprojection_residuals(P_pair, Xh[:, :3], uv, obs_mask)
    err = jnp.linalg.norm(res, axis=-1)  # (K, 2)
    small = jnp.max(err, axis=1) < config.triangulation_max_error_px
    r0 = Xh[:, :3] - state.cam_C[0]
    r1 = Xh[:, :3] - C1
    cosang = jnp.sum(r0 * r1, axis=1) / jnp.maximum(
        jnp.linalg.norm(r0, axis=1) * jnp.linalg.norm(r1, axis=1), 1e-12
    )
    enough_parallax = cosang < jnp.cos(jnp.deg2rad(config.min_parallax_deg))
    keep = cheir_ok & F.inliers & small
    # `stored` = keep minus capacity overflow: recording an overflowed id
    # (>= M) into tri_index / the obs store would corrupt BA via clamped
    # gathers, so every write below gates on it
    state, ids, stored = tracks.allocate_points(state, Xh[:, :3], keep)
    state = tracks.set_tri_index(state, 0, ref_keys, ids, stored)
    state = tracks.set_tri_index(state, 1, que_keys, ids, stored)
    state = tracks.append_observations(
        state, jnp.zeros_like(ids), ids, ref_xy, stored
    )
    state = tracks.append_observations(
        state, jnp.ones_like(ids), ids, que_xy, stored
    )
    info = {
        "matches": jnp.sum(valid),
        "f_inliers": F.num_inliers,
        "cheirality_counts": counts,
        "new_points": jnp.sum(keep),
        # draw-selection metric only (popped before the info dict leaves
        # `_bootstrap_stage`): admitted points that also clear the parallax
        # threshold — collapses for a wrong-basin essential draw
        "parallax_ok": jnp.sum(keep & enough_parallax),
    }
    return state, info


def _bucket_ladder(n: int, floor: int, max_levels: int = 3) -> list:
    """Static halving ladder [n, n/2, ...] for capacity-adaptive bucketing
    (stops at odd sizes or the floor)."""
    ladder = [n]
    while len(ladder) < max_levels and ladder[-1] % 2 == 0 and ladder[-1] // 2 >= floor:
        ladder.append(ladder[-1] // 2)
    return ladder


def _bucket_index(count: Array, ladder: list) -> Array:
    """Branch index = number of halved levels that still hold ``count``
    (fits are monotone along the ladder)."""
    idx = jnp.asarray(0, jnp.int32)
    for n in ladder[1:]:
        idx = idx + (count <= n).astype(jnp.int32)
    return idx


def _pack_indices(mask: Array, n: int) -> Array:
    """Indices of the valid entries of ``mask``, packed first and in
    original order, padded with (masked-out) leftovers to length ``n``."""
    N = mask.shape[0]
    score = jnp.where(mask, (N - jnp.arange(N)).astype(jnp.float32), 0.0)
    _, sel = jax.lax.top_k(score, n)
    return sel


def _localize_bucket_counts(state: SfMState, v: Array) -> tuple[Array, Array]:
    """(PnP candidate count, triangulation-candidate upper bound) for frame
    ``v``, computable right after the match stage — used by the batched
    engine to pick ONE shared bucket level for all lanes (the per-lane
    ``lax.switch`` inside :func:`_localize_stage` would lower to
    execute-every-branch under ``vmap``). The triangulation count drops the
    ``v_free`` term (it depends on PnP output), so it upper-bounds the true
    candidate count and the shared bucket is never undersized."""
    V, Kk = state.tri_index.shape
    targets = state.match_table[:, v, :]  # (V, K)
    valid_m = targets >= 0
    pnp_count = jnp.sum(valid_m & (state.tri_index >= 0))
    u_idx = jnp.repeat(jnp.arange(V, dtype=jnp.int32), Kk)
    usable = (u_idx < v) & state.cam_valid[u_idx]
    tri_ub = jnp.sum(
        valid_m.reshape(-1) & (state.tri_index < 0).reshape(-1) & usable
    )
    return pnp_count, tri_ub


@functools.partial(jax.jit, static_argnames=("config", "bucket_level"))
def _localize_stage(
    state: SfMState,
    v: Array,
    key: Array,
    config: PipelineConfig,
    bucket_level: int | None = None,
) -> tuple[SfMState, dict]:
    """PnP localization + incremental triangulation
    (reference ``ba_processor.py:137-267``).

    Deliberate improvement over the reference's single-best-view 2D-3D set
    (which is also why its ``find_best_view`` stub "works"): the PnP input
    is the UNION of correspondences from ALL prior views — every match
    (u, v, k) whose u-key already has a map point contributes one 2D-3D
    pair, deduplicated per map point. Late frames that share few features
    with any single view still localize against the whole map.
    """
    V, Kk = state.tri_index.shape
    targets = state.match_table[:, v, :]  # (V, K) key in v matched to (u, k)
    valid_m = targets >= 0  # rows for u >= v are all -1 by construction
    tri_ids_all = state.tri_index  # (V, K)
    has3d_all = tri_ids_all >= 0

    flat_pt = jnp.maximum(tri_ids_all, 0).reshape(-1)  # (V*K,)
    flat_tgt = jnp.maximum(targets, 0).reshape(-1)
    flat_mask = jnp.logical_and(valid_m, has3d_all).reshape(-1)
    # No dedup for the solver: a point re-matched through several views just
    # gets a little extra weight in RANSAC scoring, and dropping duplicates
    # measurably starves the consensus set.

    X3d = state.points[flat_pt]
    uv_v_all = state.kp_xy[v][flat_tgt]

    # motion prior: the previous frame's pose seeds a robust-LM candidate
    # inside estimate_pnp — rescues frames where contamination drops the
    # RANSAC inlier ratio below what 6-point sampling can survive
    prior_R = quat_to_rotation(state.cam_q[v - 1])
    prior_C = state.cam_C[v - 1]
    N = flat_pt.shape[0]
    ladder = _bucket_ladder(N, floor=2048) if config.localize_bucketing else [N]
    if bucket_level is not None and len(ladder) > 1:
        # static bucket (batched engine): the level was chosen OUTSIDE the
        # vmap from the max live count across lanes, so no on-device switch
        # is needed here (and under vmap it would cost, not save)
        n = ladder[min(bucket_level, len(ladder) - 1)]
        sel = _pack_indices(flat_mask, n)
        sub = estimate_pnp(
            key, X3d[sel], uv_v_all[sel], state.K[v], flat_mask[sel],
            config.pnp_ransac, config.pnp_lm,
            prior_R=prior_R, prior_C=prior_C,
        )
        pnp = PnPResult(
            R=sub.R, C=sub.C,
            inliers=jnp.zeros((N,), bool).at[sel].set(sub.inliers),
            num_inliers=sub.num_inliers,
        )
    elif len(ladder) > 1:
        # capacity-adaptive bucketing: the live 2D-3D candidates (typically
        # a few hundred) pack to the front of the smallest bucket that
        # holds them, and the whole PnP solve (RANSAC scoring + the
        # sequential LM crawls) runs at that size instead of V*K
        def _mk_pnp(n: int):
            def branch(k: Array) -> PnPResult:
                sel = _pack_indices(flat_mask, n)
                sub = estimate_pnp(
                    k, X3d[sel], uv_v_all[sel], state.K[v], flat_mask[sel],
                    config.pnp_ransac, config.pnp_lm,
                    prior_R=prior_R, prior_C=prior_C,
                )
                inl = jnp.zeros((N,), bool).at[sel].set(sub.inliers)
                return PnPResult(
                    R=sub.R, C=sub.C, inliers=inl,
                    num_inliers=sub.num_inliers,
                )

            return branch

        pnp = jax.lax.switch(
            _bucket_index(jnp.sum(flat_mask), ladder),
            [_mk_pnp(n) for n in ladder],
            key,
        )
    else:
        pnp = estimate_pnp(
            key, X3d, uv_v_all, state.K[v], flat_mask,
            config.pnp_ransac, config.pnp_lm,
            prior_R=prior_R, prior_C=prior_C,
        )
    state = tracks.set_camera(state, v, pnp.C, rotation_to_quat(pnp.R))

    # record the current view's observations of the points it localized
    # against (deliberate improvement: the reference never writes these, so
    # its BA only ever sees each point from its creating pair of views).
    # Dedup HERE: one observation per map point, from the most recent view's
    # match (closest viewpoint -> most reliable correspondence).
    obs_ok = jnp.logical_and(flat_mask, pnp.inliers)
    M = state.points.shape[0]
    order = jnp.arange(flat_pt.shape[0], dtype=jnp.int32)
    latest = jnp.full((M,), -1, jnp.int32).at[
        jnp.where(obs_ok, flat_pt, M - 1)
    ].max(jnp.where(obs_ok, order, -1), mode="drop")
    obs_ok = jnp.logical_and(obs_ok, latest[flat_pt] == order)
    state = tracks.append_observations(
        state, jnp.full_like(flat_pt, 0) + v, flat_pt, uv_v_all, obs_ok
    )
    # mark the current view's keys as covering those map points so future
    # frames can localize against them through this view
    state = tracks.set_tri_index(state, v, flat_tgt, flat_pt, obs_ok)

    # triangulate brand-new matches against EVERY prior view (improvement:
    # the reference only triangulates against its best_view stub = view 0,
    # so map growth collapses as soon as the camera leaves view 0's frustum).
    # ALL (u, v) candidate pairs go through ONE flat triangulation call with
    # per-candidate projection pairs — a sequential per-view loop of LM
    # scans is pure latency on TPU.
    P_v = camera_projection(state.K[v], pnp.R, pnp.C)
    n_before = state.num_points
    state = _triangulate_new_flat(
        state, v, P_v, flat_tgt, valid_m, config, bucket_level=bucket_level
    )

    info = {
        "matches": jnp.sum(valid_m),
        "pnp_candidates": jnp.sum(flat_mask),
        "pnp_inliers": pnp.num_inliers,
        "new_points": state.num_points - n_before,
    }
    return state, info


def _triangulate_new_flat(
    state: SfMState,
    v: Array,
    P_v: Array,
    flat_tgt: Array,
    valid_m: Array,
    config: PipelineConfig,
    bucket_level: int | None = None,
) -> SfMState:
    """Triangulate every not-yet-constructed match (u, v, k) for all prior
    views u at once, gate admissions, and register points + observations.

    Gates (the reference admits everything, ba_processor.py:222-261):
      1. positive depth in both views (cheirality),
      2. reprojection error below threshold in both views,
      3. triangulation (parallax) angle above threshold — short-baseline
         pairs give depth-degenerate points that wreck later PnP.
    A v-key matched from several prior views contributes ONE candidate (the
    earliest u: widest baseline)."""
    V, Kk = state.tri_index.shape
    N = V * Kk
    u_idx = jnp.repeat(jnp.arange(V, dtype=jnp.int32), Kk)  # (N,)
    ref_keys = jnp.tile(jnp.arange(Kk, dtype=jnp.int32), V)

    valid_flat = valid_m.reshape(-1)
    u_free = (state.tri_index < 0).reshape(-1)
    v_free = state.tri_index[v][flat_tgt] < 0
    usable = (u_idx < v) & state.cam_valid[u_idx]
    cand = valid_flat & u_free & v_free & usable

    # dedup per v-key: keep the earliest matching view u
    first_u = (
        jnp.full((Kk,), V, jnp.int32)
        .at[flat_tgt]
        .min(jnp.where(cand, u_idx, V))
    )
    cand = cand & (first_u[flat_tgt] == u_idx)

    # per-candidate projection pair (u's camera, current camera)
    R_all = quat_to_rotation(state.cam_q)  # (V, 3, 3)
    P_all = jax.vmap(camera_projection)(state.K, R_all, state.cam_C)  # (V, 3, 4)
    ref_xy_full = state.kp_xy.reshape(N, 2)
    que_xy_full = state.kp_xy[v][flat_tgt]

    def _admit(st: SfMState, sel: Array, n: int) -> SfMState:
        """Triangulate + gate + register the candidates at ``sel`` (the
        whole admission path runs at size n: every downstream op is a
        masked gather/scatter, so no write-back to the flat slab is
        needed)."""
        u_s = u_idx[sel]
        cand_s = cand[sel]
        tgt_s = flat_tgt[sel]
        P_pair = jnp.stack(
            [P_all[u_s], jnp.broadcast_to(P_v, (n, 3, 4))], axis=1
        )  # (n, 2, 3, 4)
        ref_xy = ref_xy_full[sel]
        que_xy = que_xy_full[sel]
        uv = jnp.stack([ref_xy, que_xy], axis=1)  # (n, 2, 2)
        obs_mask = jnp.stack([cand_s, cand_s], axis=1)
        Xh = triangulate(P_pair, uv, obs_mask, config.triangulation_lm)

        # gate 1: cheirality in both views
        d_u = jnp.einsum("nj,nj->n", P_pair[:, 0, 2, :], Xh)
        d_v = jnp.einsum("nj,nj->n", P_pair[:, 1, 2, :], Xh)
        cheir = (d_u > 0) & (d_v > 0)
        # gate 2: reprojection error
        res, _ = reprojection_residuals(P_pair, Xh[:, :3], uv, obs_mask)
        err = jnp.linalg.norm(res, axis=-1)  # (n, 2)
        small = jnp.max(err, axis=1) < config.triangulation_max_error_px
        # gate 3: parallax angle
        r_u = Xh[:, :3] - st.cam_C[u_s]
        r_v = Xh[:, :3] - st.cam_C[v]
        cosang = jnp.sum(r_u * r_v, axis=1) / jnp.maximum(
            jnp.linalg.norm(r_u, axis=1) * jnp.linalg.norm(r_v, axis=1), 1e-12
        )
        enough_parallax = cosang < jnp.cos(jnp.deg2rad(config.min_parallax_deg))
        keep = cand_s & cheir & small & enough_parallax

        # gate all recording on `stored` (= keep minus capacity overflow; an
        # id >= M in tri_index or the obs store would gather-clamp onto point
        # M-1 inside BA)
        st, ids, stored = tracks.allocate_points(st, Xh[:, :3], keep)
        st = tracks.set_tri_index_flat(st, u_s, ref_keys[sel], ids, stored)
        st = tracks.set_tri_index(st, v, tgt_s, ids, stored)
        st = tracks.append_observations(st, u_s, ids, ref_xy, stored)
        st = tracks.append_observations(st, jnp.full_like(ids, 0) + v, ids, que_xy, stored)
        return st

    ladder = _bucket_ladder(N, floor=2048) if config.localize_bucketing else [N]
    if bucket_level is not None and len(ladder) > 1:
        # static bucket chosen outside the vmap (see _localize_bucket_counts)
        n = ladder[min(bucket_level, len(ladder) - 1)]
        state = _admit(state, _pack_indices(cand, n), n)
    elif len(ladder) > 1:
        # capacity-adaptive bucketing (see _localize_stage): the LM scan in
        # triangulate() and the gates run at the smallest bucket holding
        # the live candidates instead of the full V*K slab
        state = jax.lax.switch(
            _bucket_index(jnp.sum(cand), ladder),
            [
                functools.partial(
                    lambda st, n: _admit(st, _pack_indices(cand, n), n), n=n
                )
                for n in ladder
            ],
            state,
        )
    else:
        state = _admit(state, jnp.arange(N, dtype=jnp.int32), N)
    return state


def _ba_ladder(M: int, O: int) -> list:
    """Static (points, observations) halving ladder for BA bucketing."""
    ladder = [(M, O)]
    while len(ladder) < 4:
        m, o = ladder[-1]
        if m % 2 or o % 2 or m // 2 < 256 or o // 2 < 1024:
            break
        ladder.append((m // 2, o // 2))
    return ladder


def _ba_bucket_index(ladder: list, num_points: Array, num_obs: Array) -> Array:
    """Branch index = number of halved levels that still hold the live
    counts (fits are monotone along the ladder)."""
    idx = jnp.asarray(0, jnp.int32)
    for m, o in ladder[1:]:
        idx = idx + jnp.logical_and(num_points <= m, num_obs <= o).astype(
            jnp.int32
        )
    return idx


@functools.partial(jax.jit, static_argnames=("config", "bucket_level"))
def _ba_stage(
    state: SfMState, config: PipelineConfig, bucket_level: int | None = None
) -> tuple[SfMState, Array, Array]:
    """Global bundle adjustment over all valid views/points/observations.

    With ``config.ba_num_shards > 1`` this IS the distributed path: map
    points and observations shard round-robin over the first N local
    devices (``parallel/ba_sharded.py``), cameras replicate, and each LM
    iteration psums one (7V, 7V)-sized reduced system over the mesh — the
    BASELINE.json north-star layout, running inside the same fused frame
    program. Returns (state, per-iteration costs, obs dropped by partition
    overflow — 0 unless a shard's observation bucket is undersized).
    """
    ba_state = BAState(
        C=state.cam_C,
        q=state.cam_q,
        X=state.points,
        cam_valid=state.cam_valid,
        pt_valid=state.pt_valid,
    )

    def full_obs(st: SfMState) -> BAObservations:
        return BAObservations(
            cam=st.obs_cam,
            point=st.obs_pt,
            uv_norm=normalized_camera_coords_per_obs(
                st.K[st.obs_cam], st.obs_uv
            ),
            valid=st.obs_valid,
        )

    dropped = jnp.asarray(0, jnp.int32)
    if config.ba_num_shards > 1:
        obs = full_obs(state)
        from structure_from_motion_tpu.parallel.ba_sharded import (
            deinterleave_points,
            interleave_points,
            partition_observations,
            sharded_bundle_adjustment,
        )
        from structure_from_motion_tpu.parallel.mesh import make_mesh

        S = config.ba_num_shards
        M = state.points.shape[0]
        O = state.obs_cam.shape[0]
        part = partition_observations(obs, M, S, O // S, interleave=True)
        dropped = (jnp.sum(obs.valid) - jnp.sum(part.valid)).astype(jnp.int32)
        st_p = ba_state._replace(
            X=interleave_points(ba_state.X, S),
            pt_valid=interleave_points(ba_state.pt_valid, S),
        )
        out, costs = sharded_bundle_adjustment(st_p, part, config.ba, make_mesh(S))
        out = out._replace(X=deinterleave_points(out.X, S))
        state = state._replace(cam_C=out.C, cam_q=out.q, points=out.X)
    elif config.ba_bucketing:
        # capacity-adaptive bucketing: the stores are prefix-packed (appends
        # are contiguous and eviction/pruning compact), so BA can run on the
        # smallest halved prefix that holds the live counts. The allocated
        # capacity is the user's worst case; early frames and steady-state
        # sliding windows live far below it, and every BA kernel scales with
        # the padded store size, not the live size (measured 19 ms -> <4 ms
        # at upenn scale). lax.switch picks the bucket on device.
        M = state.points.shape[0]
        O = state.obs_cam.shape[0]
        ladder = _ba_ladder(M, O)

        def make_branch(m: int, o: int):
            def branch(st: SfMState):
                bs = ba_state._replace(
                    X=st.points[:m], pt_valid=st.pt_valid[:m]
                )
                ob = BAObservations(
                    cam=st.obs_cam[:o],
                    point=st.obs_pt[:o],
                    uv_norm=normalized_camera_coords_per_obs(
                        st.K[st.obs_cam[:o]], st.obs_uv[:o]
                    ),
                    valid=st.obs_valid[:o],
                )
                res, costs = run_bundle_adjustment(bs, ob, config.ba)
                pts = jax.lax.dynamic_update_slice(st.points, res.X, (0, 0))
                return st._replace(cam_C=res.C, cam_q=res.q, points=pts), costs

            return branch

        if bucket_level is not None:
            # static bucket chosen outside the vmap (batched engine)
            m, o = ladder[min(bucket_level, len(ladder) - 1)]
            state, costs = make_branch(m, o)(state)
        else:
            # fits[k] is monotone (same live counts, shrinking buckets), so
            # the branch index = number of halved levels that still fit
            idx = _ba_bucket_index(ladder, state.num_points, state.num_obs)
            state, costs = jax.lax.switch(
                idx, [make_branch(m, o) for m, o in ladder], state
            )
    else:
        out, costs = run_bundle_adjustment(ba_state, full_obs(state), config.ba)
        state = state._replace(cam_C=out.C, cam_q=out.q, points=out.X)
    pruned_obs = jnp.asarray(0, jnp.int32)
    pruned_pts = jnp.asarray(0, jnp.int32)
    if config.prune_max_error_px > 0:
        state, pruned_obs, pruned_pts = tracks.prune_observations(
            state, config.prune_max_error_px
        )
    return state, costs, dropped, pruned_obs.astype(jnp.int32), pruned_pts.astype(jnp.int32)


def pipeline_reprojection_error(state: SfMState) -> Array:
    """Mean pixel reprojection error over all valid observations — the
    headline quality metric (BASELINE.json)."""
    from structure_from_motion_tpu.ops.reproj import pixel_residuals

    res, _ = pixel_residuals(
        state.K[state.obs_cam],
        state.cam_C[state.obs_cam],
        state.cam_q[state.obs_cam],
        state.points[state.obs_pt],
        state.obs_uv,
    )
    w = state.obs_valid.astype(res.dtype)
    err = jnp.linalg.norm(res * w[:, None], axis=-1)
    return jnp.sum(err) / jnp.maximum(jnp.sum(w), 1.0)


_set_feats_jit = jax.jit(tracks.set_view_features)
_set_K_jit = jax.jit(tracks.set_view_K)
_reproj_jit = jax.jit(pipeline_reprojection_error)
_evict_jit = jax.jit(tracks.evict_oldest_view)


def _zero_info(state: SfMState, config: PipelineConfig) -> dict:
    """The unified per-frame info pytree — every branch of the frame step
    returns this exact structure so ``lax.switch`` type-checks."""
    i32 = jnp.asarray(0, jnp.int32)
    return {
        "matches": i32,
        "f_inliers": i32,
        "cheirality_counts": jnp.zeros((4,), jnp.int32),
        "pnp_candidates": i32,
        "pnp_inliers": i32,
        "new_points": i32,
        "ba_costs": jnp.zeros((config.ba.iterations,), state.points.dtype),
        "ba_dropped_obs": i32,
        "pruned_obs": i32,
        "pruned_points": i32,
    }


@functools.partial(jax.jit, static_argnames=("config",))
def _frame_step(
    state: SfMState, v: Array, key: Array, xy: Array, desc: Array,
    valid: Array, config: PipelineConfig,
) -> tuple[SfMState, dict]:
    """ONE device program for a whole frame: store features, match against
    all prior views, then branch (``lax.switch``) into the v==0 / bootstrap
    / localize+BA stage, and compute the reprojection metric.

    Rationale: on a remote-tunnel TPU every dispatch is a host round trip;
    the per-stage design costs ~6-8 RTTs per frame (~2s measured) while the
    device compute itself is ~ms. Fusing the frame into one traced program
    makes the steady state one dispatch."""
    if any(config.distortion):
        # known lens distortion: undistort measurements ONCE at ingest so
        # every downstream residual is pinhole-exact (ops/distortion.py;
        # the reference has no distortion handling anywhere)
        from structure_from_motion_tpu.ops.distortion import undistort_pixels

        xy = undistort_pixels(xy, state.K[v], config.distortion)
    state = tracks.set_view_features(state, v, xy, desc, valid)
    k_match, k_stage = jax.random.split(key)
    state = _match_stage(state, v, k_match, config=config)

    def frame0(st, k):
        dtype = st.cam_C.dtype
        st = tracks.set_camera(
            st, 0, jnp.zeros(3, dtype), jnp.asarray([1.0, 0, 0, 0], dtype)
        )
        return st, _zero_info(st, config)

    def frame1(st, k):
        st, si = _bootstrap_stage(st, k, config=config)
        info = _zero_info(st, config)
        info.update(
            matches=si["matches"].astype(jnp.int32),
            f_inliers=si["f_inliers"].astype(jnp.int32),
            cheirality_counts=si["cheirality_counts"].astype(jnp.int32),
            new_points=si["new_points"].astype(jnp.int32),
        )
        return st, info

    def frame_n(st, k):
        st, si = _localize_stage(st, v, k, config=config)
        st, costs, ba_dropped, pruned_o, pruned_p = _ba_stage(st, config=config)
        info = _zero_info(st, config)
        info.update(
            matches=si["matches"].astype(jnp.int32),
            pnp_candidates=si["pnp_candidates"].astype(jnp.int32),
            pnp_inliers=si["pnp_inliers"].astype(jnp.int32),
            new_points=si["new_points"].astype(jnp.int32),
            ba_costs=costs,
            ba_dropped_obs=ba_dropped,
            pruned_obs=pruned_o,
            pruned_points=pruned_p,
        )
        return st, info

    state, info = jax.lax.switch(
        jnp.minimum(v, 2), [frame0, frame1, frame_n], state, k_stage
    )
    info["reprojection_px"] = pipeline_reprojection_error(state)
    # cumulative capacity-overflow counters: non-zero means the map/
    # observation capacities are saturated and admissions are being
    # silently dropped — surfaced here so "no new points" cannot
    # masquerade as convergence
    info["dropped_points"] = state.dropped_points
    info["dropped_obs"] = state.dropped_obs
    return state, info


@functools.partial(jax.jit, static_argnames=("config",))
def _assess_frame(
    state: SfMState, prev_slot: Array, xy: Array, desc: Array, valid: Array,
    config: PipelineConfig,
) -> Array:
    """Keyframe statistic: median pixel displacement of the candidate
    frame's descriptor matches against the stored view ``prev_slot`` (the
    last ACCEPTED frame). No fundamental gate — raw ratio matches are a
    fine flow estimate and this runs before the frame is admitted.

    Returns a large sentinel (so the frame is admitted) when fewer than 8
    matches exist: a scene cut carries new content even with zero matched
    flow, and rejecting it would stall the pipeline."""
    import dataclasses

    mcfg = dataclasses.replace(config.matcher, use_fundamental_gate=False)
    res = match_descriptors(
        state.kp_desc[prev_slot], desc, state.kp_valid[prev_slot], valid, mcfg
    )
    if any(config.distortion):
        # the STORED keypoints were undistorted at ingest (_frame_step);
        # comparing raw candidate coordinates against them would measure
        # distortion magnitude (5-30 px across a frame at photographic k1),
        # not motion — a duplicate frame would always clear the gate.
        # prev_slot's K stands in for the candidate's (exact for shared-K
        # runs; a flow statistic either way).
        from structure_from_motion_tpu.ops.distortion import undistort_pixels

        xy = undistort_pixels(xy, state.K[prev_slot], config.distortion)
    disp = jnp.linalg.norm(
        xy[jnp.maximum(res.target, 0)] - state.kp_xy[prev_slot], axis=-1
    )
    disp = jnp.where(res.valid, disp, jnp.nan)
    n = jnp.sum(res.valid)
    return jnp.where(n >= 8, jnp.nanmedian(disp), jnp.inf)


@functools.partial(jax.jit, static_argnames=("config",))
def _assess_frame_native(
    state: SfMState, prev_slot: Array, img: Array, config: PipelineConfig
):
    """Fused detect + keyframe assessment: one dispatch returns the
    features (reused by the frame step if the frame is admitted) plus the
    flow statistic."""
    kps, desc = detect_and_describe(img, config.frontend)
    flow = _assess_frame(state, prev_slot, kps.xy, desc, kps.mask, config)
    return kps.xy, desc, kps.mask, flow


@functools.partial(jax.jit, static_argnames=("config",))
def _frame_step_native(
    state: SfMState, v: Array, key: Array, img: Array, config: PipelineConfig
) -> tuple[SfMState, dict]:
    """Frame step with the on-device frontend fused in: image -> features ->
    full frame step, still one dispatch."""
    kps, desc = detect_and_describe(img, config.frontend)
    return _frame_step(state, v, key, kps.xy, desc, kps.mask, config)


class IncrementalSfM:
    """Host-side orchestrator. Feed frames; poses/map accumulate on device.

    ``frontend="native"`` runs the on-device DoG detector;
    ``frontend="precomputed"`` lets callers push externally detected
    features via :meth:`process_features` (used by tests to isolate the
    geometry stack with the cv2-SIFT oracle frontend — the analogue of the
    reference's pickled-keypoint caches, ``view_processor.py:81-98``).
    """

    def __init__(
        self,
        config: PipelineConfig,
        K,
        frontend: str = "native",
        seed: int = 0,
        collect_metrics: bool = True,
    ):
        from structure_from_motion_tpu.utils.compile_cache import (
            enable_persistent_compile_cache,
        )

        enable_persistent_compile_cache()
        if config.frontend.max_keypoints != config.capacity.max_keypoints:
            raise ValueError("frontend.max_keypoints must equal capacity.max_keypoints")
        if config.ba_num_shards > 1 and (
            config.capacity.max_points % config.ba_num_shards
            or config.capacity.max_observations % config.ba_num_shards
        ):
            raise ValueError(
                "capacity.max_points and max_observations must be divisible "
                f"by ba_num_shards={config.ba_num_shards}"
            )
        self.config = config
        # collect_metrics=False keeps every per-frame stat as an unsynced
        # device array so frames enqueue asynchronously — on a remote-tunnel
        # TPU each np.asarray/float() is a full round trip and dominates the
        # frame time (measured ~2s/frame of RTTs vs ~ms of device compute)
        self.collect_metrics = collect_metrics
        self.state = tracks.init_state(
            config.capacity, K, desc_dim=config.frontend.descriptor_dim
        )
        self.frontend = frontend
        self._key = jax.random.key(seed)
        self._frame = 0
        cfg = config

        # All stages are module-level jits with the (hashable, frozen)
        # config as a static argument, so the compile cache is shared
        # across engine instances — constructing a new IncrementalSfM
        # never recompiles.
        self._jit_frame_step = functools.partial(_frame_step, config=cfg)
        self._jit_frame_step_native = functools.partial(_frame_step_native, config=cfg)
        self._jit_assess = functools.partial(_assess_frame, config=cfg)
        self._jit_assess_native = functools.partial(_assess_frame_native, config=cfg)
        self._jit_detect = functools.partial(detect_and_describe, cfg=cfg.frontend)
        self._jit_reproj = _reproj_jit
        # instance-level so a served engine (serve.ServedSfM) can swap in
        # its exported program without re-implementing the window policy
        self._jit_evict = _evict_jit
        self._window = min(config.capacity.max_views, config.window_size)
        # archived (evicted) poses in sliding-window mode: a host list of
        # unsynced device arrays — no round trip until poses() is called
        self._archive: list = []
        # keyframe selection diagnostics: input index of every ACCEPTED
        # frame (== identity when keyframe_min_flow_px == 0)
        self._input_index = 0
        self.keyframe_indices: list = []

    def _keyframe_flow(self, assess) -> float | None:
        """Run the keyframe gate; returns the flow statistic, or None when
        gating is off / no previous view exists. ``assess`` is a thunk
        dispatching the jitted assessment against the last accepted slot."""
        if self.config.keyframe_min_flow_px <= 0 or self._frame < 1:
            return None
        prev_slot = min(self._frame, self._window) - 1
        return assess(jnp.asarray(prev_slot))

    def _skip_info(self, flow: float) -> dict:
        info = {
            "keyframe_skipped": True,
            "flow_px": flow,
            "frame": self._frame,
            "input_index": self._input_index,
        }
        self._input_index += 1
        return info

    # -- feeding frames ----------------------------------------------------
    def _begin_frame(self, v: int):
        """Window policy: returns the device slot for frame v, or None if
        the frame should be skipped ("stop" mode past the window)."""
        if v < self._window:
            return v
        if self.config.window_mode != "slide":
            return None
        self.state, rec = self._jit_evict(self.state)
        # start device->host copies NOW, overlapped with subsequent frames:
        # every archive consumer (global-BA assembly, poses(), checkpoint
        # save) reads these leaves with np.asarray, which would otherwise
        # pay one tunnel round trip PER RECORD PER FIELD at the end of a
        # long run (~270 s of the 500-camera global assembly). The async
        # copy caches the host value without blocking this frame.
        try:
            jax.tree_util.tree_map(lambda a: a.copy_to_host_async(), rec)
        except (AttributeError, NotImplementedError):
            pass  # backend without async copies: consumers fetch lazily
        self._archive.append(rec)
        return self._window - 1

    def process_image(self, img, K=None) -> dict:
        """One frame from a raw image: a SINGLE device dispatch (frontend +
        matching + geometry + BA fused into one jitted program). With
        ``config.keyframe_min_flow_px`` set, low-parallax frames are
        rejected first (one fused detect+assess dispatch + a scalar fetch);
        admitted frames reuse the detected features, so detection never
        runs twice.

        ``K``: optional per-frame (3, 3) intrinsics (the reference's
        ``BaProcessor.process(img, k)`` k argument) — zoom/varifocal input;
        omit for the shared K given at construction."""
        if self.frontend != "native":
            raise RuntimeError("process_image requires the native frontend")
        img = jnp.asarray(img)
        if self.config.keyframe_min_flow_px > 0 and self._frame >= 1:
            xy = desc = valid = None

            def assess(prev_slot):
                nonlocal xy, desc, valid
                xy, desc, valid, flow = self._jit_assess_native(
                    self.state, prev_slot, img
                )
                return float(flow)

            flow = self._keyframe_flow(assess)
            if flow < self.config.keyframe_min_flow_px:
                return self._skip_info(flow)
            return self._process_feature_arrays(xy, desc, valid, flow_px=flow, K=K)
        v = self._frame
        slot = self._begin_frame(v)
        if slot is None:
            return {"skipped": True, "frame": v}
        if K is not None:
            self.state = _set_K_jit(self.state, jnp.asarray(slot), jnp.asarray(K))
        self.state, info = self._jit_frame_step_native(
            self.state,
            jnp.asarray(slot),
            jax.random.fold_in(self._key, v),
            img,
        )
        return self._finish_frame(v, info)

    def process_features(self, xy, desc, valid, K=None) -> dict:
        dtype = self.state.kp_xy.dtype
        xy = jnp.asarray(xy, dtype)
        desc = jnp.asarray(desc, dtype)
        valid = jnp.asarray(valid, bool)
        flow = self._keyframe_flow(
            lambda prev_slot: float(
                self._jit_assess(self.state, prev_slot, xy, desc, valid)
            )
        )
        if flow is not None and flow < self.config.keyframe_min_flow_px:
            return self._skip_info(flow)
        return self._process_feature_arrays(xy, desc, valid, flow_px=flow, K=K)

    def _process_feature_arrays(self, xy, desc, valid, flow_px=None, K=None) -> dict:
        """Admit a frame whose features are already device arrays."""
        v = self._frame
        slot = self._begin_frame(v)
        if slot is None:
            return {"skipped": True, "frame": v}
        if K is not None:
            self.state = _set_K_jit(self.state, jnp.asarray(slot), jnp.asarray(K))
        self.state, info = self._jit_frame_step(
            self.state,
            jnp.asarray(slot),
            jax.random.fold_in(self._key, v),
            xy,
            desc,
            valid,
        )
        info = self._finish_frame(v, info)
        if flow_px is not None:
            info["flow_px"] = flow_px
        return info

    def _finish_frame(self, v: int, info: dict) -> dict:
        self._frame = v + 1
        self.keyframe_indices.append(self._input_index)
        self._input_index += 1
        info = dict(info)
        info["frame"] = v
        if self.collect_metrics:
            # ONE grouped device_get: async host copies for every metric,
            # then a single blocking wait. A per-entry np.asarray is a full
            # tunnel round trip each (~25 ms x ~12 metrics = the difference
            # between 2.5 and 11 frames/s on the rendered-GT run — the
            # round-3 SYNTHGT throughput anomaly).
            dev = {k: val for k, val in info.items() if hasattr(val, "shape")}
            info.update(jax.device_get(dev))
            info["reprojection_px"] = float(info["reprojection_px"])
        return info

    # -- checkpointing -------------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        """Persist the COMPLETE engine: device state, frame counter, and the
        sliding-window pose archive (without which a slide-mode resume would
        silently drop every evicted camera from :meth:`poses`)."""
        from structure_from_motion_tpu.utils import checkpoint as ckpt

        ckpt.save_state(
            path,
            self.state,
            self._frame,
            archive=self._archive,
            keyframes=(self.keyframe_indices, self._input_index),
        )

    def load_checkpoint(self, path: str) -> int:
        """Restore :meth:`save_checkpoint` output; returns the resume frame."""
        from structure_from_motion_tpu.utils import checkpoint as ckpt

        self.state, self._frame, self._archive, kf = ckpt.load_state(path)
        self.keyframe_indices, self._input_index = kf
        return self._frame

    # -- results -----------------------------------------------------------
    def finalize(self, iterations: int = 10):
        """Final global bundle adjustment with a larger iteration budget
        (the per-frame BA runs config.ba.iterations, default 3 — the
        reference's fixed count, ba_processor.py:24). Returns the
        per-iteration costs. One extra compile on first use."""
        import dataclasses

        cfg = dataclasses.replace(
            self.config,
            ba=dataclasses.replace(self.config.ba, iterations=iterations),
        )
        self.state, costs, _, _, _ = _ba_stage(self.state, config=cfg)
        return np.asarray(costs)

    def finalize_global(
        self,
        iterations: int = 20,
        num_shards: int = 1,
        min_obs: int = 2,
    ) -> dict:
        """Global bundle adjustment over EVERY camera of the run — the
        eviction archive plus the live window — reassembled by persistent
        global point id and solved by the (optionally sharded) Schur-LM
        engine. This is the whole-trajectory consistency the reference gets
        by bundle-adjusting all views every frame (``ba_processor.py:
        274-439``); here it costs one solve at the end instead of O(F) per
        frame. Updates the archived poses, the live window poses, and the
        live map in place; returns the problem size and per-iteration
        costs. No-op shortcut when nothing was ever evicted (the per-frame
        BA already covers the whole problem — use :meth:`finalize`)."""
        from structure_from_motion_tpu.models import global_ba

        n_live = min(self._frame, self._window)
        prob = global_ba.build_global_problem(
            self.state, self._archive, n_live, min_obs=min_obs
        )
        out, costs = global_ba.solve_global(
            prob, self.config.ba, iterations=iterations, num_shards=num_shards
        )
        A = len(self._archive)
        C = np.asarray(out.C)
        q = np.asarray(out.q)
        # refined archive poses stay HOST numpy rows: every consumer of the
        # archive (poses(), re-assembly, checkpoint save) reads host-side,
        # and per-record device ops cost one tunnel round trip each
        self._archive = [
            r._replace(C=C[i], q=q[i])
            for i, r in enumerate(self._archive)
        ]
        self.state = self.state._replace(
            cam_C=self.state.cam_C.at[:n_live].set(
                jnp.asarray(C[A : A + n_live])
            ),
            cam_q=self.state.cam_q.at[:n_live].set(
                jnp.asarray(q[A : A + n_live])
            ),
        )
        # refined points back into live map slots (dead/archived points have
        # no live slot; their refinement lives only in the solved problem)
        sel = prob.gids[: prob.n_points]
        live_gid = np.asarray(self.state.pt_gid)
        j = np.clip(
            np.searchsorted(sel, np.clip(live_gid, 0, None)),
            0,
            max(prob.n_points - 1, 0),
        )
        ok = np.logical_and(
            np.asarray(self.state.pt_valid),
            np.logical_and(live_gid >= 0, sel[j] == live_gid)
            if prob.n_points
            else False,
        )
        pts = np.array(np.asarray(self.state.points))
        pts[ok] = np.asarray(out.X)[: prob.n_points][j[ok]]
        self.state = self.state._replace(points=jnp.asarray(pts))
        return {
            "costs": costs,
            "n_cams": prob.n_cams,
            "n_points": prob.n_points,
            "n_obs": prob.n_obs,
            "max_track_len": prob.max_track_len,
        }

    def reprojection_error(self) -> float:
        """Mean pixel reprojection error over all observations (one sync)."""
        return float(self._jit_reproj(self.state))

    def poses(self):
        """(locs (F,3), rots (F,3,3)) for ALL processed frames (archived
        evicted poses + the live window) — the layout of the reference's
        golden ``view_pose.pkl``."""
        n = min(self._frame, self._window)
        C = np.asarray(self.state.cam_C)[:n]
        R = np.asarray(quat_to_rotation(self.state.cam_q[:n]))
        if self._archive:
            # host stacks: record leaves are host-cached (async-copied at
            # eviction) or numpy (checkpoint load / global-BA refinement)
            Ca = np.stack([np.asarray(r.C) for r in self._archive])
            qa = jnp.asarray(np.stack([np.asarray(r.q) for r in self._archive]))
            Ra = np.asarray(quat_to_rotation(qa))
            C = np.concatenate([Ca, C])
            R = np.concatenate([Ra, R])
        return C, R

    def map_points(self):
        X = np.asarray(self.state.points)
        return X[np.asarray(self.state.pt_valid)]
