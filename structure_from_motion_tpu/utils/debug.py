"""Invariant validation — the TPU analogue of the reference's scattered
``ValueError`` raises and hard ``sys.exit`` checks (``utils.py:43-51,93-95``,
``epipolar_processor.py:88-91``, ``ba_processor.py:170-174,233-237``).

Two layers:

* :func:`validate_state` — host-side, sync: structural invariants of the
  device-resident reconstruction (index ranges, mask consistency, finite
  values, unit quaternions). Cheap enough to call between frames in debug
  runs; returns a list of violation strings (empty = healthy) so callers
  decide whether to raise.
* :func:`nan_guard` — pure/jittable: replaces non-finite entries and
  reports a count, for use inside long-running loops where a host sync is
  unacceptable.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import Array


def validate_state(state) -> list[str]:
    """Check every structural invariant of an ``SfMState``; list violations."""
    problems: list[str] = []
    V, Kk = state.tri_index.shape
    M = state.points.shape[0]
    O = state.obs_cam.shape[0]

    tri = np.asarray(state.tri_index)
    pt_valid = np.asarray(state.pt_valid)
    obs_cam = np.asarray(state.obs_cam)
    obs_pt = np.asarray(state.obs_pt)
    obs_valid = np.asarray(state.obs_valid)
    cam_valid = np.asarray(state.cam_valid)
    mt = np.asarray(state.match_table)

    if tri.max() >= M:
        problems.append(f"tri_index exceeds map capacity ({tri.max()} >= {M})")
    used = tri[tri >= 0]
    if used.size and not pt_valid[used].all():
        problems.append("tri_index points at invalid map slots")
    if int(np.asarray(state.num_points)) != int(pt_valid.sum()):
        problems.append(
            f"num_points {int(np.asarray(state.num_points))} != "
            f"valid count {int(pt_valid.sum())}"
        )
    if obs_valid.any():
        oc, op = obs_cam[obs_valid], obs_pt[obs_valid]
        if (oc < 0).any() or (oc >= V).any():
            problems.append("observation camera index out of range")
        elif not cam_valid[oc].all():
            problems.append("observation references an invalid camera")
        if (op < 0).any() or (op >= M).any():
            problems.append("observation point index out of range")
        elif not pt_valid[op].all():
            problems.append("observation references an invalid map point")
    # match-table symmetry (reference key_tracker.py:436-453 property):
    # mt[u, v, k] = j  =>  mt[v, u, j] = k
    for u in range(V):
        for v in range(V):
            row = mt[u, v]
            ks = np.nonzero(row >= 0)[0]
            if ks.size and not (mt[v, u][row[ks]] == ks).all():
                problems.append(f"match table asymmetric for pair ({u}, {v})")
    # finite values + unit quaternions on valid slots
    if not np.isfinite(np.asarray(state.points)[pt_valid]).all():
        problems.append("non-finite map points")
    C = np.asarray(state.cam_C)[cam_valid]
    q = np.asarray(state.cam_q)[cam_valid]
    if not np.isfinite(C).all():
        problems.append("non-finite camera centers")
    if q.size and np.abs(np.linalg.norm(q, axis=1) - 1.0).max() > 1e-4:
        problems.append("non-unit camera quaternions")
    # capacity overflow: silently dropped admissions mean the configured
    # capacities are too small for the sequence — a saturated map looks
    # like convergence ("no new points") unless this is surfaced
    ndp = int(np.asarray(state.dropped_points))
    ndo = int(np.asarray(state.dropped_obs))
    if ndp > 0:
        problems.append(f"map capacity overflow: {ndp} points dropped")
    if ndo > 0:
        problems.append(f"observation capacity overflow: {ndo} observations dropped")
    return problems


def nan_guard(x: Array, replace: float = 0.0) -> tuple[Array, Array]:
    """Jittable: (cleaned array, count of non-finite entries replaced)."""
    bad = jnp.logical_not(jnp.isfinite(x))
    return jnp.where(bad, jnp.asarray(replace, x.dtype), x), jnp.sum(bad)
