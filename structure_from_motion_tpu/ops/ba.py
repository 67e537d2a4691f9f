"""Sparse bundle adjustment: Schur-complement Levenberg-Marquardt.

Replaces the reference ``BaProcessor.__execute_bundle_adjustment``
(``ba_processor.py:274-439``) with a TPU-native formulation:

Reference (per LM iteration): a Python loop over every (point, view) pair,
``is_visible`` table lookups, per-observation dense Jacobian strips into a
2 x 7V camera Jacobian and 2 x 3M point Jacobian, an explicit
``scipy.linalg.block_diag`` of all 3x3 point-block inverses — O((3M)^2)
memory — and a dense reduced camera solve.

Here: observations live in an SoA layout ``(obs_cam, obs_point, obs_uv)``
with a validity mask (fixed capacity). One LM iteration is:

    1. residual + Jacobian blocks for ALL observations at once (one fused
       vmapped kernel from ``ops/reproj.py``): res (O,2), J_cam (O,2,7),
       J_pt (O,2,3);
    2. optional Huber robust-loss reweighting (deliberate improvement; off
       by default for reference parity);
    3. block assembly by segment-sum:
         U_v  = sum_{o in view v}  J_cam^T J_cam   (V,7,7)
         D_m  = sum_{o in point m} J_pt^T J_pt     (M,3,3)
         W_o  = J_cam^T J_pt                       (O,7,3)
         b_c, b_p = J^T res
       D stays a batched (M,3,3) array; its inverse is the closed-form
       ``inv3x3`` — never a dense block_diag;
    4. Schur complement on point blocks. Per-point camera coupling is
       scattered into G (M,V,7,3) (at most one observation per (view,point)
       pair, matching the reference's table semantics) and the reduced
       system S = U + lambda I - G D^-1 G^T is formed by one einsum
       contraction — XLA never materialises an (M,7V,7V) intermediate;
    5. dense Cholesky solve of the (7V,7V) reduced system (V <= window
       size; for large V, ``parallel/ba_sharded.py`` swaps in PCG with
       psum'd matvecs), then back-substitution for the point updates;
    6. ``C += dc``, ``q <- normalize(q + dq)``, ``X += dp`` (the
       reference's quaternion-renorm update, ``ba_processor.py:386-416``).

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


def _point_sum(vals: Array, point: Array, m: int, sorted_by_point: bool) -> Array:
    """Sum per-observation values into (m, ...) point bins."""
    if sorted_by_point:
        return jax.ops.segment_sum(
            vals, point, num_segments=m, indices_are_sorted=True
        )
    return jnp.zeros((m,) + vals.shape[1:], vals.dtype).at[point].add(vals)


def _assemble(
    state: BAState,
    obs: BAObservations,
    config: BAConfig,
    sorted_by_point: bool = False,
):
    """Residuals -> all LM blocks. Shard-safe: pure segment-sums over the
    local observation shard. On TPU the residual/Jacobian/block-product
    stage runs as one fused Pallas kernel (``ops/ba_pallas.py``) with the
    camera-axis reduction accumulated in VMEM."""
    V = state.C.shape[0]
    M = state.X.shape[0]
    w = obs.valid.astype(state.X.dtype)

    if _use_pallas(config, obs.cam.shape[0]):
        from structure_from_motion_tpu.ops.ba_pallas import pallas_ba_blocks

        U, b_c, DtD, W, bp_o, cost = pallas_ba_blocks(
            obs.cam,
            state.C[obs.cam],
            state.q[obs.cam],
            state.X[obs.point],
            obs.uv_norm,
            w,
            n_views=V,
            huber_delta=float(config.huber_delta),
            # the Mosaic kernel only lowers on TPU; every other backend
            # (cpu test meshes, gpu) runs the interpreter
            interpret=jax.default_backend() != "tpu",
        )
        dt = state.X.dtype
        D = _point_sum(DtD.astype(dt), obs.point, M, sorted_by_point)
        b_p = _point_sum(bp_o.astype(dt), obs.point, M, sorted_by_point)
        return U.astype(dt), D, W.astype(dt), b_c.astype(dt), b_p, cost.astype(dt)

    res, J_cam, J_pt = batched_residual_jacobians(
        state.C[obs.cam], state.q[obs.cam], state.X[obs.point], obs.uv_norm
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
    # Camera-axis reductions go through a one-hot matmul: on TPU a scatter
    # -add over 131k observations costs ~10 ms while the (V, O) x (O, 49)
    # matmul rides the MXU at ~3.6 ms; the point axis (M large) must stay
    # a scatter.
    oh_cam = jax.nn.one_hot(obs.cam, V, dtype=state.X.dtype)  # (O, V)
    U = jnp.einsum("ov,oij->vij", oh_cam, UtU)
    b_c = jnp.einsum("ov,oi->vi", oh_cam, bc_o)
    D = _point_sum(DtD, obs.point, M, sorted_by_point)
    b_p = _point_sum(bp_o, obs.point, M, sorted_by_point)

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


def _solve_dense(U, Dinv, W, b_red, obs, pin, lam, V, dtype, psum):
    """Exact Schur solve: scatter W into G (M,V,7,3), one einsum for the
    (7V,7V) reduced system, dense solve. Right for windowed V (<= a few
    hundred cameras)."""
    M = Dinv.shape[0]
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
    sorted_by_point: bool = False,
):
    """Matrix-free PCG on the reduced camera system (large V).

    Never forms S or even G: one S-matvec is two einsums + two segment-sums
    over the (local) observation shard plus one psum of a (V,7) vector —
    O(O) work, O(V) communication, independent of the point count. The
    preconditioner is block-Jacobi: exact 7x7 diagonal blocks of S,
    inverted per camera.

    The local observation shard is re-sorted by point id ONCE per solve so
    the per-CG-iteration point-axis reduction runs as a sorted segment-sum
    — measured ~30% faster than the unsorted scatter-add on TPU at 262k
    observations, and it executes ``pcg_iterations`` times per solve.
    """
    from structure_from_motion_tpu.ops.linalg import pcg_solve

    U_hat = psum(U) if psum is not None else U
    U_hat = U_hat + lam * jnp.eye(7, dtype=dtype)[None]

    if sorted_by_point:
        # the caller (run_bundle_adjustment) already point-sorted the
        # observations once for the whole BA call
        pt_s, cam_s, W_s = obs.point, obs.cam, W
    else:
        order = jnp.argsort(obs.point)
        pt_s = obs.point[order]
        cam_s = obs.cam[order]
        W_s = W[order]

    # exact diagonal blocks of the coupling: sum over each camera's own
    # observations of W_o Dinv_{pt(o)} W_o^T  (cross-observation terms of the
    # same (cam, point) pair don't exist: at most one obs per pair)
    oh_cam = jax.nn.one_hot(cam_s, V, dtype=dtype)  # (O, V)
    WD = jnp.einsum("oic,ocd->oid", W_s, Dinv[pt_s])  # (O,7,3)
    diag_o = jnp.einsum("oid,ojd->oij", WD, W_s)  # (O,7,7)
    S_diag = jnp.einsum("ov,oij->vij", oh_cam, diag_o)
    if psum is not None:
        S_diag = psum(S_diag)
    P = U_hat - S_diag  # (V,7,7) block-Jacobi preconditioner
    P = jnp.where(pin[:, None, None], jnp.eye(7, dtype=dtype)[None], P)
    Pinv = jnp.linalg.inv(P)

    def matvec(x):
        # the U_hat x term is computed from the already-global U_hat and so
        # stays OUTSIDE the collective; only the local coupling is psummed
        xz = jnp.where(pin[:, None], 0.0, x)
        t = jnp.einsum("oic,oi->oc", W_s, xz[cam_s])  # (O,3) = G^T x per obs
        g = jax.ops.segment_sum(
            t, pt_s, num_segments=Dinv.shape[0], indices_are_sorted=True
        )
        y = jnp.einsum("mcd,md->mc", Dinv, g)  # D^-1 G^T x
        z = jnp.einsum("oic,oc->oi", W_s, y[pt_s])  # (O,7)
        coup = jnp.einsum("ov,oi->vi", oh_cam, z)  # one-hot matmul, not scatter
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
    contrib = jnp.einsum("oic,oc->oi", W, y[obs.point])  # (O,7)
    oh_cam = jax.nn.one_hot(obs.cam, V, dtype=dtype)  # (O, V)
    b_red = b_c - jnp.einsum("ov,oi->vi", oh_cam, contrib)
    if psum is not None:
        b_red = psum(b_red)

    pin = _gauge_pin(state, config)
    if V >= config.pcg_fallback_cameras:
        dc = _solve_pcg(
            U, Dinv, W, b_red, obs, pin, lam, V, dtype, psum, config,
            sorted_by_point,
        )
    else:
        b_red = jnp.where(pin[:, None], 0.0, b_red)
        dc = _solve_dense(U, Dinv, W, b_red, obs, pin, lam, V, dtype, psum)

    # back-substitute points: dp_m = Dinv (b_p - sum_{o in m} W_o^T dc_{cam o})
    t = jnp.einsum("oic,oi->oc", W, dc[obs.cam])  # (O,3)
    Gt_dc = _point_sum(t, obs.point, D.shape[0], sorted_by_point)
    dp = jnp.einsum("mcd,md->mc", Dinv, b_p - Gt_dc)
    return dc, dp


def _apply_step(state: BAState, dc: Array, dp: Array) -> BAState:
    cam_ok = state.cam_valid[:, None].astype(state.C.dtype)
    pt_ok = state.pt_valid[:, None].astype(state.X.dtype)
    C = state.C + dc[:, :3] * cam_ok
    q = quat_normalize(state.q + dc[:, 3:] * cam_ok)
    X = state.X + dp * pt_ok
    return BAState(C=C, q=q, X=X, cam_valid=state.cam_valid, pt_valid=state.pt_valid)


def _lm_body(st, lam, obs, config, psum, sorted_by_point):
    U, D, W, b_c, b_p, cost = _assemble(st, obs, config, sorted_by_point)
    if psum is not None:
        cost = psum(cost)  # cost must be global for the accept test
    dc, dp = _reduce_and_solve(
        U, D, W, b_c, b_p, st, obs, config, psum, lam, sorted_by_point
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
    # point-sorted layout: every point-axis reduction in the LM/CG loops
    # becomes a sorted segment-sum; one argsort per BA call instead of one
    # per PCG solve
    obs = _sort_obs_by_point(obs)

    def body(carry, _):
        st, lam = carry
        cand, cost = _lm_body(st, lam, obs, config, psum, sorted_by_point=True)
        if not config.adaptive:
            return (cand, lam), cost
        # the accept test must compare the SAME objective _assemble charged
        # `cost` under — with huber_delta > 0 a raw-cost comparison
        # systematically rejects improving steps on contaminated maps (raw
        # >= Huber always, so outliers inflate only the candidate's side)
        new_cost = total_reprojection_cost(
            cand, obs, psum, huber_delta=config.huber_delta
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
) -> Array:
    """Sum of squared normalised-coordinate residuals over valid
    observations. With ``huber_delta > 0`` residuals are IRLS-weighted
    exactly like :func:`_assemble`'s cost (sum of min(r^2, delta*|r|)) —
    the adaptive accept test passes ``config.huber_delta`` so both sides
    of the comparison measure the same robust objective."""
    res, _, _ = batched_residual_jacobians(
        state.C[obs.cam], state.q[obs.cam], state.X[obs.point], obs.uv_norm
    )
    w = huber_weights(res, huber_delta) * obs.valid.astype(res.dtype)
    cost = jnp.sum((res * w[:, None]) ** 2)
    return cost if psum is None else psum(cost)
