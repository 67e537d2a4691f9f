"""Device-resident track table, map, and observation store.

Replaces the reference ``KeyTrack``/``KeyTracker`` (``key_tracker.py:14-204``)
and the growing ``tri_pts`` hstack map (``triangulation_processor.py:21-28``)
with one fixed-capacity pytree that lives on the device across the whole
reconstruction:

* ``match_table[u, v, k]`` = index of the key in view v matched with key k
  of view u (-1 invalid) — the dense equivalent of ``KeyTrack.table``'s
  off-diagonal rows, symmetric by construction
  (``key_tracker.py:305-314``).
* ``tri_index[v, k]`` = map-point id triangulated from key k of view v
  (-1 none) — the reference's diagonal-row trick (``key_tracker.py:21-29``).
* ``points``/``pt_valid``/``num_points`` — masked-capacity map instead of
  hstack growth.
* explicit SoA observation store (cam, point, pixel uv) — the reference
  derives visibility by ``is_visible`` table scans inside the BA loop
  (``key_tracker.py:198-204``); keeping observations explicit makes BA a
  pure gather and the observation axis shardable.

All mutation helpers are pure (state in, state out), jit-safe, and use
``mode="drop"`` scatters so masked writes vanish instead of clobbering.
The reference's ``row > 0`` quirk that silently drops key index 0
(``key_tracker.py:162``) is deliberately fixed: validity is ``>= 0``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from structure_from_motion_tpu.config import CapacityConfig


class SfMState(NamedTuple):
    # frontend
    kp_xy: Array  # (V, K, 2) f32
    kp_desc: Array  # (V, K, D) f32
    kp_valid: Array  # (V, K) bool
    # correspondence / track store
    match_table: Array  # (V, V, K) int32
    tri_index: Array  # (V, K) int32
    # cameras
    cam_C: Array  # (V, 3)
    cam_q: Array  # (V, 4)
    cam_valid: Array  # (V,) bool
    # map
    points: Array  # (M, 3)
    pt_valid: Array  # (M,) bool
    num_points: Array  # () int32
    # observations (pixel coords; normalised lazily for BA)
    obs_cam: Array  # (O,) int32
    obs_pt: Array  # (O,) int32
    obs_uv: Array  # (O, 2)
    obs_valid: Array  # (O,) bool
    num_obs: Array  # () int32
    # cumulative capacity-overflow counters: candidates silently dropped
    # because the point/observation stores were full. A healthy run keeps
    # both at zero; non-zero means capacities are undersized and the map
    # "converging" is actually saturation (validate_state flags it).
    dropped_points: Array  # () int32
    dropped_obs: Array  # () int32
    # persistent global point identity: ``pt_gid[m]`` is the id assigned
    # when slot m's point was first triangulated, permuted (never renamed)
    # by compaction and eviction, -1 for invalid slots. This is what lets a
    # sliding-window run reassemble a GLOBAL bundle-adjustment problem at
    # the end (finalize_global): observations archived at eviction and the
    # live store refer to the same physical point iff their gids match.
    # The reference has no analogue — it never evicts (its filter_size just
    # stops processing, ba_processor.py:44-46).
    pt_gid: Array  # (M,) int32
    next_gid: Array  # () int32
    # PER-VIEW intrinsics, row v = K of the view in slot v. The reference's
    # View struct stores its own k per image (view_processor.py:14-98 and
    # BaProcessor.process(img, k) takes k per frame) even though its own
    # pipeline always passes one constant K; here heterogeneous intrinsics
    # (zoom/varifocal video, mixed rigs) are first-class: a single (3, 3) K
    # is broadcast at init, and per-frame Ks flow through every projection,
    # normalisation, and BA residual via per-view / per-observation gathers.
    K: Array  # (V, 3, 3)


def init_state(cap: CapacityConfig, K: Array, desc_dim: int = 128, dtype=jnp.float32) -> SfMState:
    V, Kk, M, O = cap.max_views, cap.max_keypoints, cap.max_points, cap.max_observations
    return SfMState(
        kp_xy=jnp.zeros((V, Kk, 2), dtype),
        kp_desc=jnp.zeros((V, Kk, desc_dim), dtype),
        kp_valid=jnp.zeros((V, Kk), bool),
        match_table=jnp.full((V, V, Kk), -1, jnp.int32),
        tri_index=jnp.full((V, Kk), -1, jnp.int32),
        cam_C=jnp.zeros((V, 3), dtype),
        cam_q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (V, 1)),
        cam_valid=jnp.zeros((V,), bool),
        points=jnp.zeros((M, 3), dtype),
        pt_valid=jnp.zeros((M,), bool),
        num_points=jnp.asarray(0, jnp.int32),
        obs_cam=jnp.zeros((O,), jnp.int32),
        obs_pt=jnp.zeros((O,), jnp.int32),
        obs_uv=jnp.zeros((O, 2), dtype),
        obs_valid=jnp.zeros((O,), bool),
        num_obs=jnp.asarray(0, jnp.int32),
        dropped_points=jnp.asarray(0, jnp.int32),
        dropped_obs=jnp.asarray(0, jnp.int32),
        pt_gid=jnp.full((M,), -1, jnp.int32),
        next_gid=jnp.asarray(0, jnp.int32),
        K=jnp.broadcast_to(jnp.asarray(K, dtype), (V, 3, 3)),
    )


def set_view_features(
    state: SfMState, v: Array, xy: Array, desc: Array, valid: Array
) -> SfMState:
    """Store one view's fixed-size keypoint buffers at row ``v``."""
    return state._replace(
        kp_xy=state.kp_xy.at[v].set(jnp.asarray(xy, state.kp_xy.dtype)),
        kp_desc=state.kp_desc.at[v].set(jnp.asarray(desc, state.kp_desc.dtype)),
        kp_valid=state.kp_valid.at[v].set(jnp.asarray(valid, bool)),
    )


def record_matches(
    state: SfMState, u: Array, v: Array, target: Array, valid: Array
) -> SfMState:
    """Write matches of view u's keys onto view v symmetrically.

    ``target[k]`` = key index in v matched with key k of u. Writes
    ``match_table[u, v, k] = target[k]`` and the inverse row
    ``match_table[v, u, target[k]] = k`` (the reference's symmetric update,
    ``key_tracker.py:305-314``).
    """
    Kk = target.shape[0]
    fwd = jnp.where(valid, target, -1).astype(jnp.int32)
    table = state.match_table.at[u, v].set(fwd)
    ks = jnp.arange(Kk, dtype=jnp.int32)
    safe_tgt = jnp.where(valid, target, Kk)  # Kk drops out of bounds
    inv_row = jnp.full((Kk,), -1, jnp.int32).at[safe_tgt].set(ks, mode="drop")
    table = table.at[v, u].set(inv_row)
    return state._replace(match_table=table)


def set_view_K(state: SfMState, v: Array, K: Array) -> SfMState:
    """Set slot ``v``'s intrinsics (per-frame K, the analogue of the
    reference's ``BaProcessor.process(img, k)`` k argument)."""
    return state._replace(
        K=state.K.at[v].set(jnp.asarray(K, state.K.dtype))
    )


def set_camera(state: SfMState, v: Array, C: Array, q: Array) -> SfMState:
    return state._replace(
        cam_C=state.cam_C.at[v].set(jnp.asarray(C, state.cam_C.dtype)),
        cam_q=state.cam_q.at[v].set(jnp.asarray(q, state.cam_q.dtype)),
        cam_valid=state.cam_valid.at[v].set(True),
    )


def allocate_points(state: SfMState, X: Array, mask: Array):
    """Append masked new points to the map.

    ``X``: (N, 3) candidates, ``mask``: (N,) which to keep. Returns
    (state, ids (N,) int32, stored (N,) bool): ids[i] is the assigned map
    id (garbage where ``stored`` is False). ``stored`` is ``mask`` minus
    capacity overflow — candidates past capacity are counted in
    ``dropped_points`` and get ids >= M, so every downstream recording
    (tri_index, observation store) MUST gate on ``stored``, not ``mask``:
    an id >= M written into those stores would later be gather-clamped to
    point M-1, silently corrupting BA with another point's position.
    """
    ranks = jnp.cumsum(mask.astype(jnp.int32)) - 1
    ids = state.num_points + ranks
    M = state.points.shape[0]
    stored = jnp.logical_and(mask, ids < M)
    dest = jnp.where(stored, ids, M)
    points = state.points.at[dest].set(jnp.asarray(X, state.points.dtype), mode="drop")
    pt_valid = state.pt_valid.at[dest].set(stored, mode="drop")
    # global ids: every masked candidate consumes one id (dropped candidates
    # burn theirs — ids only need to be unique and stable, not dense)
    pt_gid = state.pt_gid.at[dest].set(
        (state.next_gid + ranks).astype(jnp.int32), mode="drop"
    )
    n_new = jnp.sum(mask, dtype=jnp.int32)
    kept = jnp.sum(stored, dtype=jnp.int32)
    state = state._replace(
        points=points,
        pt_valid=pt_valid,
        pt_gid=pt_gid,
        next_gid=(state.next_gid + n_new).astype(jnp.int32),
        num_points=jnp.minimum(state.num_points + n_new, M).astype(jnp.int32),
        dropped_points=(state.dropped_points + n_new - kept).astype(jnp.int32),
    )
    return state, ids.astype(jnp.int32), stored


def set_tri_index(state: SfMState, v: Array, keys: Array, ids: Array, mask: Array) -> SfMState:
    """tri_index[v, keys] = ids where mask (masked scatter)."""
    Kk = state.tri_index.shape[1]
    safe_keys = jnp.where(mask, keys, Kk)
    row = state.tri_index[v].at[safe_keys].set(
        jnp.where(mask, ids, -1).astype(jnp.int32), mode="drop"
    )
    return state._replace(tri_index=state.tri_index.at[v].set(row))


def set_tri_index_flat(
    state: SfMState, views: Array, keys: Array, ids: Array, mask: Array
) -> SfMState:
    """tri_index[views, keys] = ids where mask — 2-D masked scatter for
    candidates spanning many views at once."""
    V = state.tri_index.shape[0]
    safe_views = jnp.where(mask, views, V)  # out of range -> dropped
    tri = state.tri_index.at[safe_views, keys].set(
        jnp.where(mask, ids, -1).astype(jnp.int32), mode="drop"
    )
    return state._replace(tri_index=tri)


def append_observations(
    state: SfMState, cam: Array, point: Array, uv: Array, mask: Array
) -> SfMState:
    """Append masked observations to the SoA store (capacity-bounded)."""
    O = state.obs_cam.shape[0]
    ranks = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask, state.num_obs + ranks, O)
    dest = jnp.where(dest >= O, O, dest)
    kept = jnp.logical_and(mask, dest < O)
    n_dropped = jnp.sum(mask, dtype=jnp.int32) - jnp.sum(kept, dtype=jnp.int32)
    return state._replace(
        obs_cam=state.obs_cam.at[dest].set(cam.astype(jnp.int32), mode="drop"),
        obs_pt=state.obs_pt.at[dest].set(point.astype(jnp.int32), mode="drop"),
        obs_uv=state.obs_uv.at[dest].set(jnp.asarray(uv, state.obs_uv.dtype), mode="drop"),
        obs_valid=state.obs_valid.at[dest].set(kept, mode="drop"),
        num_obs=jnp.minimum(
            state.num_obs + jnp.sum(kept, dtype=jnp.int32), O
        ).astype(jnp.int32),
        dropped_obs=(state.dropped_obs + n_dropped).astype(jnp.int32),
    )


def matched_pair_arrays(state: SfMState, u: Array, v: Array):
    """Correspondences of views (u, v) as fixed-shape arrays.

    Returns (ref_keys (K,), que_keys (K,), ref_xy (K,2), que_xy (K,2),
    valid (K,)). The reference rebuilds ragged pair lists per call
    (``key_tracker.py:132-181``); here the row itself is the pair set.
    """
    Kk = state.match_table.shape[2]
    tgt = state.match_table[u, v]
    valid = tgt >= 0
    ref_keys = jnp.arange(Kk, dtype=jnp.int32)
    que_keys = jnp.where(valid, tgt, 0)
    ref_xy = state.kp_xy[u]
    que_xy = state.kp_xy[v][que_keys]
    return ref_keys, que_keys, ref_xy, que_xy, valid


def compact_state(state: SfMState) -> SfMState:
    """Stable-compact the point and observation stores.

    Given the current validity masks, moves every valid point/observation to
    the front of its store, remaps all ``tri_index``/``obs_pt`` references
    through the new ids, drops observations of invalid points, and resets
    ``num_points``/``num_obs`` to the valid counts — so freed capacity is
    reusable and the ``num_points == pt_valid.sum()`` invariant holds.
    Jit-safe; shared by :func:`evict_oldest_view` and
    :func:`prune_observations`.
    """
    M = state.points.shape[0]
    O = state.obs_cam.shape[0]
    pt_valid = state.pt_valid

    new_id = jnp.cumsum(pt_valid.astype(jnp.int32)) - 1  # (M,)
    n_pts = jnp.sum(pt_valid, dtype=jnp.int32)
    dest_pt = jnp.where(pt_valid, new_id, M)
    points = jnp.zeros_like(state.points).at[dest_pt].set(
        state.points, mode="drop"
    )
    pt_valid_c = jnp.zeros_like(pt_valid).at[dest_pt].set(pt_valid, mode="drop")
    pt_gid_c = jnp.full_like(state.pt_gid, -1).at[dest_pt].set(
        state.pt_gid, mode="drop"
    )
    remap = jnp.where(pt_valid, new_id, -1)  # (M,) old -> new or -1

    safe_tri = jnp.maximum(state.tri_index, 0)
    tri_index = jnp.where(state.tri_index >= 0, remap[safe_tri], -1)

    keep_obs = jnp.logical_and(state.obs_valid, remap[state.obs_pt] >= 0)
    obs_rank = jnp.cumsum(keep_obs.astype(jnp.int32)) - 1
    n_obs = jnp.sum(keep_obs, dtype=jnp.int32)
    dest_o = jnp.where(keep_obs, obs_rank, O)
    obs_cam_c = jnp.zeros_like(state.obs_cam).at[dest_o].set(
        state.obs_cam, mode="drop"
    )
    obs_pt_c = jnp.zeros_like(state.obs_pt).at[dest_o].set(
        remap[state.obs_pt].astype(jnp.int32), mode="drop"
    )
    obs_uv_c = jnp.zeros_like(state.obs_uv).at[dest_o].set(
        state.obs_uv, mode="drop"
    )
    obs_valid_c = jnp.zeros_like(state.obs_valid).at[dest_o].set(
        keep_obs, mode="drop"
    )
    return state._replace(
        tri_index=tri_index,
        points=points,
        pt_valid=pt_valid_c,
        pt_gid=pt_gid_c,
        num_points=n_pts,
        obs_cam=obs_cam_c,
        obs_pt=obs_pt_c,
        obs_uv=obs_uv_c,
        obs_valid=obs_valid_c,
        num_obs=n_obs,
    )


class EvictionRecord(NamedTuple):
    """Everything :func:`evict_oldest_view` preserves about the dropped
    view, enough to rebuild a GLOBAL bundle-adjustment problem later
    (``IncrementalSfM.finalize_global``): the pose, the view's intrinsics,
    and its observations keyed by persistent global point id (``pt_gid``)
    together with each observed point's position at eviction time (the
    seed for points that die before the end of the run). Fixed shape
    (keypoint capacity), jit-safe. The reference never needs this — it BAs
    all views every frame and never evicts (``ba_processor.py:274-439``)."""

    C: Array  # (3,)
    q: Array  # (4,)
    K: Array  # (3, 3)
    gid: Array  # (Kk,) int32 global point id per observation (-1 empty)
    uv: Array  # (Kk, 2) pixel coordinates in the evicted view
    X: Array  # (Kk, 3) observed point's position at eviction
    valid: Array  # (Kk,) bool


def evict_oldest_view(state: SfMState):
    """Slide the window: drop view 0, shift every view down by one.

    The sliding-window/keyframe management the reference lacks (its
    ``filter_size`` simply stops processing, ``ba_processor.py:44-46``).
    Shifting (rather than ring-buffer slot reuse) preserves the "prior
    views have smaller indices" invariant every stage relies on.

    Returns (state, :class:`EvictionRecord`). All compaction is jittable:
      * view rows shift; last row cleared,
      * observations of the evicted view are dropped and the store is
        compacted to the front (stable),
      * points left with no observations die; the point store is compacted
        and every tri_index / obs_pt reference is remapped.
    """
    V, Kk = state.tri_index.shape
    M = state.points.shape[0]

    # archive the evicted view's observations before they are dropped: at
    # most one observation per (view, point) pair and the view has at most
    # Kk triangulated keys, so a (Kk,) table always fits
    ev_mask = jnp.logical_and(state.obs_valid, state.obs_cam == 0)
    ev_rank = jnp.cumsum(ev_mask.astype(jnp.int32)) - 1
    ev_dst = jnp.where(ev_mask, jnp.minimum(ev_rank, Kk), Kk)  # Kk drops
    pt = state.obs_pt
    rec = EvictionRecord(
        C=state.cam_C[0],
        q=state.cam_q[0],
        K=state.K[0],
        gid=jnp.full((Kk,), -1, jnp.int32).at[ev_dst].set(
            state.pt_gid[pt], mode="drop"
        ),
        uv=jnp.zeros((Kk, 2), state.obs_uv.dtype).at[ev_dst].set(
            state.obs_uv, mode="drop"
        ),
        X=jnp.zeros((Kk, 3), state.points.dtype).at[ev_dst].set(
            state.points[pt], mode="drop"
        ),
        valid=jnp.zeros((Kk,), bool).at[ev_dst].set(ev_mask, mode="drop"),
    )

    def shift0(x, fill):
        return jnp.concatenate(
            [x[1:], jnp.full_like(x[:1], fill)], axis=0
        )

    kp_xy = shift0(state.kp_xy, 0)
    kp_desc = shift0(state.kp_desc, 0)
    kp_valid = shift0(state.kp_valid, False)
    cam_C = shift0(state.cam_C, 0)
    cam_q = jnp.concatenate(
        [state.cam_q[1:], jnp.asarray([[1.0, 0, 0, 0]], state.cam_q.dtype)]
    )
    cam_valid = shift0(state.cam_valid, False)
    tri_index = shift0(state.tri_index, -1)
    # intrinsics rows shift with their views; the vacated last slot
    # inherits the newest K (correct for shared-K runs, and overwritten by
    # set_view_K when the next frame supplies its own K)
    K_rows = jnp.concatenate([state.K[1:], state.K[-1:]], axis=0)

    mt = state.match_table[1:, 1:, :]  # drop row+col 0
    match_table = jnp.full_like(state.match_table, -1)
    match_table = match_table.at[: V - 1, : V - 1, :].set(mt)

    # drop evicted view's observations, shift camera ids
    keep_obs = jnp.logical_and(state.obs_valid, state.obs_cam != 0)
    obs_cam = (state.obs_cam - 1).astype(jnp.int32)

    # kill points with no remaining observations
    counts = jnp.zeros((M,), jnp.int32).at[
        jnp.where(keep_obs, state.obs_pt, M - 1)
    ].add(jnp.where(keep_obs, 1, 0))
    pt_valid = jnp.logical_and(state.pt_valid, counts > 0)

    state = state._replace(
        kp_xy=kp_xy,
        kp_desc=kp_desc,
        kp_valid=kp_valid,
        match_table=match_table,
        tri_index=tri_index,
        cam_C=cam_C,
        cam_q=cam_q,
        cam_valid=cam_valid,
        pt_valid=pt_valid,
        obs_cam=obs_cam,
        obs_valid=keep_obs,
        K=K_rows,
    )
    return compact_state(state), rec


def prune_observations(state: SfMState, max_err_px: float):
    """Drop observations whose pixel reprojection error exceeds
    ``max_err_px`` and kill map points left with fewer than two supporting
    observations (they cannot be triangulated and only mislead PnP).

    The reference has no outlier management once a point enters the map —
    bad matches poison its BA forever (ba_processor.py:222-261). Returns
    (state, num_dropped_obs, num_dropped_points).
    """
    from structure_from_motion_tpu.ops.reproj import pixel_residuals

    res, depth = pixel_residuals(
        state.K[state.obs_cam],
        state.cam_C[state.obs_cam],
        state.cam_q[state.obs_cam],
        state.points[state.obs_pt],
        state.obs_uv,
    )
    err = jnp.linalg.norm(res, axis=-1)
    keep = jnp.logical_and(
        state.obs_valid, jnp.logical_and(err <= max_err_px, depth > 0)
    )
    n_dropped = jnp.sum(state.obs_valid) - jnp.sum(keep)

    M = state.points.shape[0]
    counts = jnp.zeros((M,), jnp.int32).at[
        jnp.where(keep, state.obs_pt, M - 1)
    ].add(jnp.where(keep, 1, 0))
    pt_valid = jnp.logical_and(state.pt_valid, counts >= 2)
    n_pts_dropped = jnp.sum(state.pt_valid) - jnp.sum(pt_valid)
    # compact_state drops observations of dead points, clears their
    # tri_index entries, and reclaims the freed point/observation slots
    # (without compaction pruned slots would leak for the rest of the
    # sequence and num_points would drift from pt_valid.sum())
    state = compact_state(state._replace(obs_valid=keep, pt_valid=pt_valid))
    return state, n_dropped, n_pts_dropped
