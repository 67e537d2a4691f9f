"""Small batched linear-algebra kernels shared by the geometry stages.

The reference calls ``np.linalg.svd`` once per point / per RANSAC sample in
Python loops; here every SVD/solve is batched over a leading axis so XLA
lowers one fused batched kernel. Tiny fixed-size systems (3x3, 4x4) get
closed forms — cheaper than LAPACK-style iterations and fully fusible.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def nullspace(A: Array) -> Array:
    """Unit null vector (right-singular vector of the smallest singular
    value) of each matrix in a batch ``(..., M, N)`` -> ``(..., N)``.

    Uses a full SVD so wide systems (e.g. the 8x9 eight-point design matrix)
    expose the true null direction.
    """
    _, _, vh = jnp.linalg.svd(A, full_matrices=True)
    return vh[..., -1, :]


def inv3x3(A: Array, eps: float = 1e-12) -> Array:
    """Closed-form adjugate inverse of ``(..., 3, 3)`` batches.

    Used for the BA point blocks (D^-1 stays a (M, 3, 3) batch instead of the
    reference's dense ``scipy.linalg.block_diag`` of all inverses,
    ``ba_processor.py:359-363``).
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], axis=-1),
            jnp.stack([co10, co11, co12], axis=-1),
            jnp.stack([co20, co21, co22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def solve_psd(A: Array, b: Array, damping: float = 0.0) -> Array:
    """Solve (damped) symmetric positive-definite systems by Cholesky.

    ``A``: ``(..., N, N)``, ``b``: ``(..., N)``. Used for the LM normal
    equations and the reduced camera system when it is small enough to
    solve densely (replicated across devices).
    """
    if damping:
        eye = jnp.eye(A.shape[-1], dtype=A.dtype)
        A = A + damping * eye
    L = jnp.linalg.cholesky(A)
    # cho_solve is not exposed in jnp; two triangular solves via solve on L, L^T
    z = jnp.linalg.solve(L, b[..., None])[..., 0]
    return jnp.linalg.solve(jnp.swapaxes(L, -1, -2), z[..., None])[..., 0]


def pcg_solve(matvec, b: Array, iterations: int, rtol: float = 1e-6, precond=None) -> Array:
    """Matrix-free preconditioned conjugate gradients with early exit.

    ``matvec`` maps ``x -> A x`` and may hide ``psum`` collectives when the
    Hessian is sharded — this is the "PCG fallback" path for the reduced
    camera system at large camera counts (BASELINE.json north star).
    ``precond`` applies an (approximate) inverse M^-1 to a residual — e.g.
    the block-Jacobi 7x7 camera-block inverses.

    ``iterations`` caps the trip count; the loop stops as soon as the
    preconditioned residual norm drops below ``rtol**2`` of its initial
    value (a ``while_loop``, so converged solves pay only what they use —
    measured: the block-Jacobi-preconditioned reduced camera system
    converges in ~8 iterations at V=64, so a fixed 64-iteration loop was
    ~3x wasted wall time per LM iteration). Under ``shard_map`` the stop
    test uses psummed scalars, so every shard takes the same branch.
    """
    import jax

    apply_m = precond if precond is not None else (lambda r: r)

    x0 = jnp.zeros_like(b)
    z0 = apply_m(b)
    rz0 = jnp.vdot(b, z0)

    def cond(state):
        i, x, r, p, rz = state
        return jnp.logical_and(i < iterations, jnp.abs(rz) > rtol**2 * jnp.abs(rz0))

    def body(state):
        i, x, r, p, rz = state
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap)
        alpha = jnp.where(jnp.abs(denom) > 0, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_m(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(jnp.abs(rz) > 0, rz_new / rz, 0.0)
        p = z + beta * p
        return i + 1, x, r, p, rz_new

    state = (jnp.asarray(0, jnp.int32), x0, b, z0, rz0)
    _, x, *_ = jax.lax.while_loop(cond, body, state)
    return x
