"""Sparse bundle adjustment: Schur-complement Levenberg-Marquardt.

Replaces the reference ``BaProcessor.__execute_bundle_adjustment``
(``ba_processor.py:274-439``) with a TPU-native formulation:

Reference (per LM iteration): a Python loop over every (point, view) pair,
``is_visible`` table lookups, per-observation dense Jacobian strips into a
2 x 7V camera Jacobian and 2 x 3M point Jacobian, an explicit
``scipy.linalg.block_diag`` of all 3x3 point-block inverses — O((3M)^2)
memory — and a dense reduced camera solve.

Here: observations live in an SoA layout ``(obs_cam, obs_point, obs_uv)``
with a validity mask (fixed capacity), packed ONCE per BA call into a
dense ELL table — point m owns ``ell_rows`` contiguous slots — so that no
LM or CG iteration contains a scatter or segment-sum (on TPU a
scatter-add over 131k rows costs ~10 ms while the equivalent dense
reshape-sum runs at HBM bandwidth; measured in
``examples/profile_ba_breakdown.py``). One LM iteration is:

    1. residual + Jacobian blocks for ALL observations at once (one fused
       vmapped kernel from ``ops/reproj.py``): res (O,2), J_cam (O,2,7),
       J_pt (O,2,3);
    2. optional Huber robust-loss reweighting (deliberate improvement; off
       by default for reference parity);
    3. block assembly:
         U_v  = sum_{o in view v}  J_cam^T J_cam   (V,7,7)  one-hot matmul
         D_m  = sum_{o in point m} J_pt^T J_pt     (M,3,3)  reshape-sum
         W_o  = J_cam^T J_pt                       (O,7,3)
         b_c, b_p = J^T res
       D stays a batched (M,3,3) array; its inverse is the closed-form
       ``inv3x3`` — never a dense block_diag;
    4. Schur complement on point blocks. Per-point camera coupling
       G (M,V,7,3) builds as a one-hot MXU matmul over the ELL rows (at
       most one observation per (view,point) pair, matching the
       reference's table semantics) and the reduced system
       S = U + lambda I - G D^-1 G^T is formed by one einsum contraction —
       XLA never materialises an (M,7V,7V) intermediate;
    5. dense Cholesky solve of the (7V,7V) reduced system (V <= window
       size; for large V, ``parallel/ba_sharded.py`` swaps in PCG with
       psum'd matvecs), then back-substitution for the point updates;
    6. ``C += dc``, ``q <- normalize(q + dq)``, ``X += dp`` (the
       reference's quaternion-renorm update, ``ba_processor.py:386-416``).

``BAConfig.obs_layout = "csr"`` keeps the round-2 sorted-stream layout
(segment-sums + coupling scatter) for comparison benchmarks.

Damping is the reference's fixed lambda added to both camera and point
blocks; iteration count is static. Gauge fixing (pin camera 0) is optional
— the reference leaves the gauge free.

The whole step is pure and shard-ready: ``_assemble`` and ``_solve`` are
written so the observation/point axes can be sharded and the (7V,7V)
reduced system psum-reduced (see ``parallel/ba_sharded.py``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from structure_from_motion_tpu.config import BAConfig
from structure_from_motion_tpu.ops.linalg import inv3x3
from structure_from_motion_tpu.ops.reproj import batched_residual_jacobians
from structure_from_motion_tpu.utils.rotations import quat_normalize


class BAState(NamedTuple):
    C: Array  # (V, 3) camera centers
    q: Array  # (V, 4) camera quaternions (w, x, y, z)
    X: Array  # (M, 3) map points
    cam_valid: Array  # (V,) bool
    pt_valid: Array  # (M,) bool


class BAObservations(NamedTuple):
    cam: Array  # (O,) int32 camera index
    point: Array  # (O,) int32 point index
    uv_norm: Array  # (O, 2) measurement in normalised camera coords
    valid: Array  # (O,) bool


class ObsLayout(NamedTuple):
    """Static description of how the observation stream is laid out.

    ``ell_rows == 0``: CSR — a point-sorted stream, point-axis reductions
    are sorted segment-sums. ``ell_rows > 0``: hybrid ELL — the first
    ``M * ell_rows`` slots are a dense (point, slot) table (reshape-sums,
    broadcast gathers) and the last ``tail`` slots are a point-sorted CSR
    tail holding each point's observations beyond ``ell_rows``. The hybrid
    keeps the dense-stream cost proportional to the TYPICAL track length
    while a few heavily-revisited landmarks (track length in the hundreds)
    spill into a short segment-summed tail instead of padding every point
    to the longest track — the failure mode that made whole-trajectory BA
    fall back to CSR and its ~10 ms/iteration TPU scatters.

    ``tiers`` (from ``BAConfig.tiers``): tiered ELL for power-law track
    histograms. The stream arrives pre-packed with points RENUMBERED in
    descending track-length order and partitioned into static tiers —
    tier t covers the next ``n_t`` points with ``rows_t`` slots each —
    so point-axis reductions are a concat of per-tier dense reshape-sums
    that lands directly in point order: no scatter, no segment-sum, no
    permutation gather, and total slots ~1.2x the observation count where
    single-level ELL needed 4x padding plus a segment-summed tail.
    Sets ``ell_rows``/``tail`` to 0; slots past the tiers' total (pallas
    tile alignment) are invalid padding excluded from point reductions.

    ``cam_perm``/``cam_mask`` (present when ``BAConfig.cam_rows > 0``)
    describe a second, camera-major ELL view of the SAME stream: slot
    ``v * cam_rows + r`` holds the index of camera v's r-th observation.
    Camera-axis reductions then run as gather + reshape-sum at HBM
    bandwidth instead of materialising a (O, V) one-hot matmul operand —
    at 500 cameras x 500k slots that operand alone is ~1 GB of HBM traffic
    per reduction, and the PCG matvec does one per CG iteration."""

    ell_rows: int = 0
    tail: int = 0
    tiers: tuple = ()  # ((n_points, rows), ...) static tier partition
    pad: int = 0  # alignment slots appended after the tier region
    cam_rows: int = 0
    cam_perm: Array | None = None  # (V * cam_rows,) int32 into the stream
    cam_mask: Array | None = None  # (V * cam_rows,) bool


def huber_weights(res: Array, delta: float) -> Array:
    """Per-observation sqrt-IRLS weights for the Huber loss; 1.0 if off."""
    if delta <= 0.0:
        return jnp.ones(res.shape[0], dtype=res.dtype)
    norm = jnp.linalg.norm(res, axis=-1)
    w = jnp.where(norm <= delta, 1.0, delta / jnp.maximum(norm, 1e-12))
    return jnp.sqrt(w)


def _use_pallas(config: BAConfig, n_obs: int) -> bool:
    if config.assemble_impl == "pallas":
        if n_obs % 512 != 0:
            raise ValueError(
                "assemble_impl='pallas' requires the observation capacity to "
                f"be a multiple of the 512-row kernel tile; got {n_obs}"
            )
        return True
    return (
        config.assemble_impl == "auto"
        and jax.default_backend() == "tpu"
        and n_obs % 512 == 0
    )


def _sort_obs_by_point(obs: BAObservations) -> BAObservations:
    """Reorder observations by point id (stable). BA is order-invariant
    (everything is a sum over observations), and a point-sorted layout
    turns every point-axis scatter-add in assembly, back-substitution and
    the PCG matvec into a sorted segment-sum — measured ~30% faster per
    reduction on TPU at 262k observations. Sorted ONCE per BA call,
    hoisted out of the LM/CG loops."""
    order = jnp.argsort(obs.point)
    return BAObservations(
        cam=obs.cam[order],
        point=obs.point[order],
        uv_norm=obs.uv_norm[order],
        valid=obs.valid[order],
    )


def _to_ell(obs: BAObservations, m: int, rows: int, tail: int = 0) -> BAObservations:
    """Pack the observation stream into (hybrid) ELL layout: point p owns
    the ``rows`` contiguous slots ``[p*rows, (p+1)*rows)`` of the returned
    flat stream, empty slots marked invalid. ``point`` becomes the implicit
    ``arange(m*rows) // rows``, so every point-axis reduction downstream is
    a dense ``reshape(m, rows, ...).sum(1)`` and every point-axis gather a
    broadcast — the layout that removes all scatters/segment-sums from the
    LM and PCG loops (one TPU scatter-add over 131k rows costs ~10 ms; the
    dense sum runs at HBM bandwidth).

    With ``tail > 0`` observations beyond a point's first ``rows`` spill
    into ``tail`` extra point-sorted CSR slots appended after the ELL block
    (their explicit point ids live in ``point``; empty tail slots carry
    ``m - 1`` so the tail stays sorted). This keeps ``rows`` at the TYPICAL
    track length even when a few landmarks are observed by hundreds of
    cameras. With ``tail == 0`` excess observations are dropped (validity
    cleared) — the track table guarantees at most one observation per
    (view, point) pair, so ``rows = V`` always loses nothing. Pure JAX; one
    sort + one scatter per BA call, amortised over every LM/CG iteration."""
    s = _sort_obs_by_point(
        obs._replace(point=jnp.where(obs.valid, obs.point, m))
    )
    # rank of each observation within its point's contiguous run
    start = jnp.searchsorted(s.point, jnp.arange(m + 1, dtype=s.point.dtype))
    rank = jnp.arange(s.point.shape[0], dtype=s.point.dtype) - start[
        jnp.minimum(s.point, m)
    ]
    keep = jnp.logical_and(s.valid, rank < rows)
    total = m * rows + tail
    if tail:
        is_tail = jnp.logical_and(s.valid, rank >= rows)
        tpos = jnp.cumsum(is_tail.astype(jnp.int32)) - 1  # point-sorted order
        keep_tail = jnp.logical_and(is_tail, tpos < tail)
        dest = jnp.where(
            keep,
            s.point * rows + rank,
            jnp.where(keep_tail, m * rows + tpos, total),
        )
        keep = jnp.logical_or(keep, keep_tail)
    else:
        dest = jnp.where(keep, s.point * rows + rank, total)  # dump slot

    cam = jnp.zeros((total + 1,), jnp.int32).at[dest].set(s.cam.astype(jnp.int32))
    uv = jnp.zeros((total + 1, 2), s.uv_norm.dtype).at[dest].set(s.uv_norm)
    valid = jnp.zeros((total + 1,), bool).at[dest].set(keep)
    point = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None], (m, rows)
    ).reshape(m * rows)
    if tail:
        # empty tail slots read m-1 (max id) so the tail stays sorted for
        # the indices_are_sorted segment-sums; their zero weights/Jacobians
        # make the binned contribution exactly zero
        pt_tail = jnp.full((total + 1,), m - 1, jnp.int32).at[dest].set(
            s.point.astype(jnp.int32)
        )[m * rows : total]
        point = jnp.concatenate([point, pt_tail])
    return BAObservations(
        cam=cam[:total], point=point, uv_norm=uv[:total], valid=valid[:total]
    )


def compute_cam_ell(
    cam: Array, valid: Array, n_views: int, rows: int
) -> tuple[Array, Array]:
    """Camera-major ELL view of an observation stream: returns
    ``(perm, mask)`` of shape (n_views * rows,) such that slot
    ``v * rows + r`` indexes camera v's r-th valid observation (mask False
    on empty slots). Camera-axis reductions become
    ``vals[perm].reshape(V, rows, ...).sum(1)`` — HBM-bandwidth gather +
    dense sum instead of a (O, V) one-hot matmul operand. ``rows`` must be
    >= the maximum number of valid observations of any camera or the
    excess silently drops from camera reductions (callers size it exactly,
    host-side). One argsort per BA call."""
    O = cam.shape[0]
    key = jnp.where(valid, cam, n_views)
    order = jnp.argsort(key)
    cam_s = key[order]
    start = jnp.searchsorted(cam_s, jnp.arange(n_views + 1, dtype=cam_s.dtype))
    rank = jnp.arange(O, dtype=cam_s.dtype) - start[jnp.minimum(cam_s, n_views)]
    keep = jnp.logical_and(valid[order], rank < rows)
    dest = jnp.where(keep, cam_s * rows + rank, n_views * rows)
    total = n_views * rows
    perm = jnp.zeros((total + 1,), jnp.int32).at[dest].set(order.astype(jnp.int32))
    mask = jnp.zeros((total + 1,), bool).at[dest].set(keep)
    return perm[:total], mask[:total]


def _cam_sum(vals: Array, cam: Array, n_views: int, lay: "ObsLayout") -> Array:
    """Sum per-observation values into (n_views, ...) camera bins."""
    if lay.cam_perm is not None:
        m = lay.cam_mask.astype(vals.dtype).reshape(
            (-1,) + (1,) * (vals.ndim - 1)
        )
        g = vals[lay.cam_perm] * m
        return g.reshape((n_views, lay.cam_rows) + vals.shape[1:]).sum(axis=1)
    oh = jax.nn.one_hot(cam, n_views, dtype=vals.dtype)  # (O, V)
    return jnp.tensordot(oh, vals, axes=[[0], [0]])


def _point_sum(
    vals: Array,
    point: Array,
    m: int,
    sorted_by_point: bool,
    lay: "ObsLayout | None" = None,
) -> Array:
    """Sum per-observation values into (m, ...) point bins."""
    if lay is not None and lay.tiers:
        # per-tier dense reshape-sums, concatenated directly in point order
        # (points are renumbered by descending track length at packing);
        # slots past the tiers' total are alignment padding — ignored
        outs, off = [], 0
        for n, r in lay.tiers:
            if r == 0:
                outs.append(
                    jnp.zeros((n,) + vals.shape[1:], vals.dtype)
                )
                continue
            outs.append(
                vals[off : off + n * r]
                .reshape((n, r) + vals.shape[1:])
                .sum(axis=1)
            )
            off += n * r
        return jnp.concatenate(outs)[:m]
    ell_rows = lay.ell_rows if lay is not None else 0
    if ell_rows:
        n_ell = m * ell_rows
        out = vals[:n_ell].reshape((m, ell_rows) + vals.shape[1:]).sum(axis=1)
        if lay.tail:
            out = out + jax.ops.segment_sum(
                vals[n_ell:], point[n_ell:], num_segments=m,
                indices_are_sorted=True,
            )
        return out
    if sorted_by_point:
        return jax.ops.segment_sum(
            vals, point, num_segments=m, indices_are_sorted=True
        )
    return jnp.zeros((m,) + vals.shape[1:], vals.dtype).at[point].add(vals)


def _point_gather(
    vals: Array, point: Array, lay: "ObsLayout | None" = None
) -> Array:
    """Expand (m, ...) point values to the per-observation stream."""
    if lay is not None and lay.tiers:
        outs, p0 = [], 0
        for n, r in lay.tiers:
            if r:
                outs.append(
                    jnp.broadcast_to(
                        vals[p0 : p0 + n, None], (n, r) + vals.shape[1:]
                    ).reshape((n * r,) + vals.shape[1:])
                )
            p0 += n
        if lay.pad:
            # alignment slots: broadcast a REAL point row (point 0) so the
            # masked residual math stays finite; their weight is zero
            outs.append(
                jnp.broadcast_to(
                    vals[:1], (lay.pad,) + vals.shape[1:]
                )
            )
        return jnp.concatenate(outs)
    ell_rows = lay.ell_rows if lay is not None else 0
    if ell_rows:
        m = vals.shape[0]
        g = jnp.broadcast_to(
            vals[:, None], (m, ell_rows) + vals.shape[1:]
        ).reshape((m * ell_rows,) + vals.shape[1:])
        if lay.tail:
            g = jnp.concatenate([g, vals[point[m * ell_rows :]]], axis=0)
        return g
    return vals[point]


def _assemble(
    state: BAState,
    obs: BAObservations,
    config: BAConfig,
    sorted_by_point: bool = False,
    lay: ObsLayout = ObsLayout(),
):
    """Residuals -> all LM blocks. Shard-safe: pure segment-sums (CSR) or
    dense reshape-sums (ELL) over the local observation shard. On TPU the
    residual/Jacobian/block-product stage runs as one fused Pallas kernel
    (``ops/ba_pallas.py``) with the camera-axis reduction accumulated in
    VMEM."""
    V = state.C.shape[0]
    M = state.X.shape[0]
    w = obs.valid.astype(state.X.dtype)
    X_o = _point_gather(state.X, obs.point, lay)

    if _use_pallas(config, obs.cam.shape[0]):
        from structure_from_motion_tpu.ops.ba_pallas import pallas_ba_blocks

        U, b_c, DtD, W, bp_o, cost = pallas_ba_blocks(
            obs.cam,
            state.C[obs.cam],
            state.q[obs.cam],
            X_o,
            obs.uv_norm,
            w,
            n_views=V,
            huber_delta=float(config.huber_delta),
            # the Mosaic kernel only lowers on TPU; every other backend
            # (cpu test meshes, gpu) runs the interpreter
            interpret=jax.default_backend() != "tpu",
        )
        dt = state.X.dtype
        D = _point_sum(DtD.astype(dt), obs.point, M, sorted_by_point, lay)
        b_p = _point_sum(bp_o.astype(dt), obs.point, M, sorted_by_point, lay)
        return U.astype(dt), D, W.astype(dt), b_c.astype(dt), b_p, cost.astype(dt)

    res, J_cam, J_pt = batched_residual_jacobians(
        state.C[obs.cam], state.q[obs.cam], X_o, obs.uv_norm
    )
    rw = huber_weights(res, config.huber_delta) * w
    res = res * rw[:, None]
    J_cam = J_cam * rw[:, None, None]
    J_pt = J_pt * rw[:, None, None]

    # per-observation blocks
    UtU = jnp.einsum("oki,okj->oij", J_cam, J_cam)  # (O,7,7)
    DtD = jnp.einsum("oki,okj->oij", J_pt, J_pt)  # (O,3,3)
    W = jnp.einsum("oki,okj->oij", J_cam, J_pt)  # (O,7,3)
    bc_o = jnp.einsum("oki,ok->oi", J_cam, res)  # (O,7)
    bp_o = jnp.einsum("oki,ok->oi", J_pt, res)  # (O,3)

    # segment sums into camera / point blocks (W stays per-observation —
    # the camera-point coupling is consumed either as a dense (M,V,7,3)
    # scatter for the small-V exact Schur solve or matrix-free in PCG).
    # Camera-axis reductions go through a one-hot matmul (small V: on TPU a
    # scatter-add over 131k observations costs ~10 ms while the (V, O) x
    # (O, 49) matmul rides the MXU at ~3.6 ms) or, with
    # ``BAConfig.cam_rows``, the camera-ELL gather+reshape-sum (large V,
    # where the (O, V) one-hot operand itself becomes the bandwidth cost);
    # the point axis (M large) must stay a scatter in CSR layout.
    U = _cam_sum(UtU, obs.cam, V, lay)
    b_c = _cam_sum(bc_o, obs.cam, V, lay)
    D = _point_sum(DtD, obs.point, M, sorted_by_point, lay)
    b_p = _point_sum(bp_o, obs.point, M, sorted_by_point, lay)

    cost = jnp.sum(res**2)
    return U, D, W, b_c, b_p, cost


def _gauge_pin(state: BAState, config: BAConfig) -> Array:
    """(V,) bool: cameras whose update is pinned to zero — invalid slots,
    plus camera 0 when gauge fixing is on (the reference leaves the gauge
    free, ``ba_processor.py:285-289``)."""
    pin = jnp.logical_not(state.cam_valid)
    if config.fix_first_camera_gauge:
        pin = pin.at[0].set(True)
    return pin


def _solve_dense(U, Dinv, W, b_red, obs, pin, lam, V, dtype, psum, lay=ObsLayout()):
    """Exact Schur solve: build the coupling G (M,V,7,3) — a one-hot MXU
    matmul over the ELL rows, or a scatter from the CSR stream — then one
    einsum for the (7V,7V) reduced system and a dense solve. Right for
    windowed V (<= a few hundred cameras)."""
    M = Dinv.shape[0]
    if lay.tiers:
        # per-tier one-hot MXU builds, concatenated in point order
        Gs, off = [], 0
        for n, r in lay.tiers:
            if r == 0:
                Gs.append(jnp.zeros((n, V, 7, 3), dtype))
                continue
            ohc = jax.nn.one_hot(
                obs.cam[off : off + n * r].reshape(n, r), V, dtype=dtype
            )
            Gs.append(
                jnp.einsum(
                    "ntv,ntic->nvic",
                    ohc,
                    W[off : off + n * r].reshape(n, r, 7, 3),
                )
            )
            off += n * r
        G = jnp.concatenate(Gs)[:M]
    elif lay.ell_rows:
        # dense build: (M,T,V) one-hot x (M,T,7,3) -> (M,V,7,3) on the MXU;
        # invalid slots carry zero Jacobians so their cam id 0 adds nothing
        n_ell = M * lay.ell_rows
        ohc = jax.nn.one_hot(
            obs.cam[:n_ell].reshape(M, lay.ell_rows), V, dtype=dtype
        )
        G = jnp.einsum(
            "mtv,mtic->mvic", ohc, W[:n_ell].reshape(M, lay.ell_rows, 7, 3)
        )
        if lay.tail:
            G = G.at[obs.point[n_ell:], obs.cam[n_ell:]].add(W[n_ell:])
    else:
        G = jnp.zeros((M, V, 7, 3), dtype).at[obs.point, obs.cam].add(W)
    S_coupling = jnp.einsum("mvic,mcd,mwjd->vijw", G, Dinv, G)  # (V,7,7,V)
    if psum is not None:
        U = psum(U)
        S_coupling = psum(S_coupling)

    S = jnp.zeros((V, 7, V, 7), dtype)
    S = S.at[jnp.arange(V), :, jnp.arange(V), :].set(
        U + lam * jnp.eye(7, dtype=dtype)[None]
    )
    S = S - jnp.transpose(S_coupling, (0, 1, 3, 2))  # (V,7,V,7)
    S_flat = S.reshape(V * 7, V * 7)
    b_flat = b_red.reshape(V * 7)

    # pinned cameras: identity rows/cols, zero rhs
    pin7 = jnp.repeat(pin, 7)
    eye = jnp.eye(V * 7, dtype=dtype)
    S_flat = jnp.where(pin7[:, None], eye, S_flat)
    S_flat = jnp.where(pin7[None, :], jnp.where(eye > 0, S_flat, 0.0), S_flat)
    b_flat = jnp.where(pin7, 0.0, b_flat)

    # the damped reduced system is SPD (pinned rows are identity), so a
    # Cholesky solve beats the general LU factorisation
    from structure_from_motion_tpu.ops.linalg import solve_psd

    return solve_psd(S_flat, b_flat).reshape(V, 7)


def _solve_pcg(
    U, Dinv, W, b_red, obs, pin, lam, V, dtype, psum, config: BAConfig,
    sorted_by_point: bool = False, lay: ObsLayout = ObsLayout(),
):
    """Matrix-free PCG on the reduced camera system (large V).

    Never forms S or even G: one S-matvec is two einsums plus a point-axis
    reduction over the (local) observation shard plus one psum of a (V,7)
    vector — O(O) work, O(V) communication, independent of the point
    count. The preconditioner is block-Jacobi: exact 7x7 diagonal blocks
    of S, inverted per camera.

    In ELL layout (the default) the per-CG-iteration point reduction is a
    dense reshape-sum and the D^-1 G^T x expansion a broadcast; the CSR
    path keeps the sorted segment-sum (re-sorting here once per solve when
    the caller didn't).
    """
    from structure_from_motion_tpu.ops.linalg import pcg_solve

    M = Dinv.shape[0]
    U_hat = psum(U) if psum is not None else U
    U_hat = U_hat + lam * jnp.eye(7, dtype=dtype)[None]

    if sorted_by_point or lay.ell_rows or lay.tiers:
        # run_bundle_adjustment already canonicalised the layout once for
        # the whole BA call
        pt_s, cam_s, W_s = obs.point, obs.cam, W
    else:
        order = jnp.argsort(obs.point)
        pt_s = obs.point[order]
        cam_s = obs.cam[order]
        W_s = W[order]

    # Pallas-fused matvec halves (ops/ba_matvec_pallas.py): the per-CG
    # x[cam] expansion and per-camera coupling reduction are gather-row-
    # latency bound in XLA (~6 ms/iteration at 191k slots); in-kernel
    # one-hot MXU contractions run them at streaming bandwidth. Tiered
    # streams are 512-aligned by construction; V <= 2048 bounds the
    # per-tile one-hot VMEM.
    use_pallas_mv = (
        bool(lay.tiers)
        and config.matvec_impl != "xla"
        and (
            config.matvec_impl == "pallas"
            or jax.default_backend() == "tpu"
        )
        and V <= 2048
        and W_s.shape[0] % 512 == 0
    )
    if use_pallas_mv:
        from structure_from_motion_tpu.ops.ba_matvec_pallas import (
            pallas_expand_cam,
            pallas_reduce_cam,
        )

        w21 = W_s.reshape(-1, 21).T  # (21, O) component-major stream
        mv_interp = jax.default_backend() != "tpu"

    # exact diagonal blocks of the coupling: sum over each camera's own
    # observations of W_o Dinv_{pt(o)} W_o^T  (cross-observation terms of the
    # same (cam, point) pair don't exist: at most one obs per pair)
    Dinv_o = _point_gather(Dinv, pt_s, lay)
    WD = jnp.einsum("oic,ocd->oid", W_s, Dinv_o)  # (O,7,3)
    diag_o = jnp.einsum("oid,ojd->oij", WD, W_s)  # (O,7,7)
    S_diag = _cam_sum(diag_o, cam_s, V, lay)
    if psum is not None:
        S_diag = psum(S_diag)
    P = U_hat - S_diag  # (V,7,7) block-Jacobi preconditioner
    P = jnp.where(pin[:, None, None], jnp.eye(7, dtype=dtype)[None], P)
    Pinv = jnp.linalg.inv(P)

    def matvec(x):
        # the U_hat x term is computed from the already-global U_hat and so
        # stays OUTSIDE the collective; only the local coupling is psummed
        xz = jnp.where(pin[:, None], 0.0, x)
        if use_pallas_mv:
            t = pallas_expand_cam(
                cam_s, w21, xz.astype(jnp.float32), interpret=mv_interp
            ).T.astype(W_s.dtype)  # (O,3) = G^T x per obs
        else:
            t = jnp.einsum("oic,oi->oc", W_s, xz[cam_s])
        g = _point_sum(t, pt_s, M, sorted_by_point=True, lay=lay)
        y = jnp.einsum("mcd,md->mc", Dinv, g)  # D^-1 G^T x
        if use_pallas_mv:
            y3 = _point_gather(y, pt_s, lay).T  # tier broadcast, (3, O)
            coup = pallas_reduce_cam(
                cam_s, w21, y3.astype(jnp.float32), V, interpret=mv_interp
            ).astype(x.dtype)
        else:
            z = jnp.einsum("oic,oc->oi", W_s, _point_gather(y, pt_s, lay))
            coup = _cam_sum(z, cam_s, V, lay)  # MXU one-hot / cam-ELL sum
        if psum is not None:
            coup = psum(coup)
        out = jnp.einsum("vij,vj->vi", U_hat, xz) - coup
        return jnp.where(pin[:, None], x, out)

    def precond(r):
        return jnp.einsum("vij,vj->vi", Pinv, r)

    b = jnp.where(pin[:, None], 0.0, b_red)
    return pcg_solve(matvec, b, config.pcg_iterations, precond=precond)


def _reduce_and_solve(
    U, D, W, b_c, b_p, state: BAState, obs: BAObservations, config: BAConfig,
    psum: Callable[[Array], Array] | None = None,
    damping: Array | None = None,
    sorted_by_point: bool = False,
    lay: ObsLayout = ObsLayout(),
):
    """Schur reduction + reduced camera solve + point back-substitution.

    ``psum``: optional collective applied to the reduced (replicated-size)
    quantities when observations/points are sharded across devices.
    Below ``config.pcg_fallback_cameras`` cameras the reduced system is
    solved exactly (dense Cholesky-grade solve); above it, by matrix-free
    block-Jacobi PCG.
    """
    V = state.C.shape[0]
    dtype = state.X.dtype
    lam = jnp.asarray(config.damping if damping is None else damping, dtype)

    Dtilde = D + lam * jnp.eye(3, dtype=dtype)[None]
    # only real points get inverted; invalid rows become zero contribution
    Dinv = inv3x3(Dtilde) * state.pt_valid[:, None, None]

    # b_red = b_c - G D^-1 b_p, from per-observation W blocks
    y = jnp.einsum("mcd,md->mc", Dinv, b_p)  # (M,3)
    contrib = jnp.einsum(
        "oic,oc->oi", W, _point_gather(y, obs.point, lay)
    )  # (O,7)
    b_red = b_c - _cam_sum(contrib, obs.cam, V, lay)
    if psum is not None:
        b_red = psum(b_red)

    pin = _gauge_pin(state, config)
    if V >= config.pcg_fallback_cameras:
        dc = _solve_pcg(
            U, Dinv, W, b_red, obs, pin, lam, V, dtype, psum, config,
            sorted_by_point, lay,
        )
    else:
        b_red = jnp.where(pin[:, None], 0.0, b_red)
        dc = _solve_dense(
            U, Dinv, W, b_red, obs, pin, lam, V, dtype, psum, lay
        )

    # back-substitute points: dp_m = Dinv (b_p - sum_{o in m} W_o^T dc_{cam o})
    t = jnp.einsum("oic,oi->oc", W, dc[obs.cam])  # (O,3)
    Gt_dc = _point_sum(t, obs.point, D.shape[0], sorted_by_point, lay)
    dp = jnp.einsum("mcd,md->mc", Dinv, b_p - Gt_dc)
    return dc, dp


def _apply_step(state: BAState, dc: Array, dp: Array) -> BAState:
    cam_ok = state.cam_valid[:, None].astype(state.C.dtype)
    pt_ok = state.pt_valid[:, None].astype(state.X.dtype)
    C = state.C + dc[:, :3] * cam_ok
    q = quat_normalize(state.q + dc[:, 3:] * cam_ok)
    X = state.X + dp * pt_ok
    return BAState(C=C, q=q, X=X, cam_valid=state.cam_valid, pt_valid=state.pt_valid)


def _lm_body(st, lam, obs, config, psum, sorted_by_point, lay=ObsLayout()):
    U, D, W, b_c, b_p, cost = _assemble(
        st, obs, config, sorted_by_point, lay
    )
    if psum is not None:
        cost = psum(cost)  # cost must be global for the accept test
    dc, dp = _reduce_and_solve(
        U, D, W, b_c, b_p, st, obs, config, psum, lam, sorted_by_point, lay
    )
    return _apply_step(st, dc, dp), cost


def run_bundle_adjustment(
    state: BAState,
    obs: BAObservations,
    config: BAConfig,
    psum: Callable[[Array], Array] | None = None,
) -> tuple[BAState, Array]:
    """``config.iterations`` LM iterations (reference default 3,
    ``ba_processor.py:24``). Returns final state and per-iteration costs.

    With ``config.adaptive`` (default) this is true trust-region LM: each
    candidate step is evaluated, rejected steps are rolled back and grow
    lambda, accepted steps shrink it. With ``adaptive=False`` it reproduces
    the reference's always-accept fixed-lambda behaviour.
    """
    dtype = state.X.dtype
    # canonicalise the observation layout ONCE per BA call, hoisted out of
    # the LM/CG loops: ELL (default) turns every point-axis reduction into
    # a dense reshape-sum and every point gather into a broadcast — no
    # scatter/segment-sum per iteration (a short CSR tail absorbs
    # over-``ell_rows`` tracks when ``config.ell_tail`` is set); CSR keeps
    # the round-2 sorted segment-sum stream.
    lay = ObsLayout()
    if config.obs_layout == "tiered":
        # stream arrives PRE-PACKED (models/global_ba.pack_tiered): points
        # renumbered by descending track length, tier t = next n_t points
        # with rows_t slots each, then alignment padding
        if not config.tiers:
            raise ValueError("obs_layout='tiered' requires config.tiers")
        tier_slots = sum(n * r for n, r in config.tiers)
        lay = lay._replace(
            tiers=tuple(config.tiers),
            pad=obs.cam.shape[0] - tier_slots,
        )
    elif config.obs_layout == "ell":
        rows = config.ell_rows or state.C.shape[0]
        obs = _to_ell(obs, state.X.shape[0], rows, config.ell_tail)
        lay = lay._replace(ell_rows=rows, tail=config.ell_tail)
    else:
        obs = _sort_obs_by_point(obs)
    if config.cam_rows:
        perm, mask = compute_cam_ell(
            obs.cam, obs.valid, state.C.shape[0], config.cam_rows
        )
        lay = lay._replace(
            cam_rows=config.cam_rows, cam_perm=perm, cam_mask=mask
        )

    def body(carry, _):
        st, lam = carry
        cand, cost = _lm_body(
            st, lam, obs, config, psum, sorted_by_point=True, lay=lay
        )
        if not config.adaptive:
            return (cand, lam), cost
        # the accept test must compare the SAME objective _assemble charged
        # `cost` under — with huber_delta > 0 a raw-cost comparison
        # systematically rejects improving steps on contaminated maps (raw
        # >= Huber always, so outliers inflate only the candidate's side)
        new_cost = total_reprojection_cost(
            cand, obs, psum, huber_delta=config.huber_delta, lay=lay
        )
        accept = new_cost < cost
        st_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand, st
        )
        lam_next = jnp.clip(
            jnp.where(accept, lam * config.damping_down, lam * config.damping_up),
            config.min_damping,
            config.max_damping,
        )
        return (st_next, lam_next), cost

    init = (state, jnp.asarray(config.damping, dtype))
    (state, _), costs = jax.lax.scan(body, init, None, length=config.iterations)
    return state, costs


def total_reprojection_cost(
    state: BAState,
    obs: BAObservations,
    psum: Callable[[Array], Array] | None = None,
    huber_delta: float = 0.0,
    lay: ObsLayout = ObsLayout(),
) -> Array:
    """Sum of squared normalised-coordinate residuals over valid
    observations. With ``huber_delta > 0`` residuals are IRLS-weighted
    exactly like :func:`_assemble`'s cost (sum of min(r^2, delta*|r|)) —
    the adaptive accept test passes ``config.huber_delta`` so both sides
    of the comparison measure the same robust objective."""
    res, _, _ = batched_residual_jacobians(
        state.C[obs.cam],
        state.q[obs.cam],
        _point_gather(state.X, obs.point, lay),
        obs.uv_norm,
    )
    w = huber_weights(res, huber_delta) * obs.valid.astype(res.dtype)
    cost = jnp.sum((res * w[:, None]) ** 2)
    return cost if psum is None else psum(cost)
