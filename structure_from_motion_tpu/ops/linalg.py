"""Small batched linear-algebra kernels shared by the geometry stages.

The reference calls ``np.linalg.svd`` once per point / per RANSAC sample in
Python loops; here every SVD/solve is batched over a leading axis so XLA
lowers one fused batched kernel. Tiny fixed-size systems (3x3, 4x4) get
closed forms — cheaper than LAPACK-style iterations and fully fusible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def nullspace(A: Array) -> Array:
    """Unit null vector (right-singular vector of the smallest singular
    value) of each matrix in a batch ``(..., M, N)`` -> ``(..., N)``.

    Tall systems (M >= N) use the economy SVD — its (N, N) ``vh`` carries
    every right-singular vector, and a full SVD would materialise the
    (M, M) ``U`` (a 1 GB intermediate for the (16k, 12) all-inlier PnP
    refit). Wide systems (e.g. the 8x9 eight-point design matrix) need the
    full SVD to expose the true null direction.
    """
    wide = A.shape[-2] < A.shape[-1]
    _, _, vh = jnp.linalg.svd(A, full_matrices=wide)
    return vh[..., -1, :]


def inv4x4(A: Array, eps: float = 1e-30) -> Array:
    """Closed-form cofactor inverse of ``(..., 4, 4)`` batches.

    ~200 fused elementwise flops per matrix — on TPU this beats the
    batched LU solve by ~5x and the batched SVD by ~30x at 8k matrices."""
    m = [[A[..., i, j] for j in range(4)] for i in range(4)]

    def det3(r, c):
        rs = [x for x in range(4) if x != r]
        cs = [x for x in range(4) if x != c]
        a, b, c_ = [[m[rr][cc] for cc in cs] for rr in rs]
        return (
            a[0] * (b[1] * c_[2] - b[2] * c_[1])
            - a[1] * (b[0] * c_[2] - b[2] * c_[0])
            + a[2] * (b[0] * c_[1] - b[1] * c_[0])
        )

    cof = [[((-1) ** (i + j)) * det3(i, j) for j in range(4)] for i in range(4)]
    det = sum(m[0][j] * cof[0][j] for j in range(4))
    det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    adjT = jnp.stack(
        [jnp.stack([cof[i][j] for i in range(4)], -1) for j in range(4)], -2
    )
    return adjT / det[..., None, None]


def nullspace_gram(A: Array, iters: int = 6) -> Array:
    """Null vector of ``(..., M, N)`` batches via shifted inverse iteration
    on the N x N gram matrix — the TPU-fast path for the DLT solves.

    ``x_{k+1} = normalize((A^T A + eps I)^{-1} x_k)`` converges to the
    eigenvector of the smallest eigenvalue at rate ~(lam_min+eps)/(lam_2+eps)
    per step (eps = 1e-5 trace << lam_2 makes that ~1e-5 for rank-deficient
    systems, so a handful of steps reaches f32 resolution); the inverse's
    max-norm column already lies along the null direction and seeds x_0.
    Inverse iteration is stable even with inexact solves: solve error
    re-projects onto the dominant eigenspace of the inverse, which is the
    target. Batched small SVDs on TPU cost ~30-50x more (measured:
    (8192,4,4) SVD 47 ms vs 1.5 ms closed-form inverse + iterations).

    Requires M >= N - 1 rank (a single null direction). Matches the SVD
    null vector to ~4e-7 |dot| in f32 on DLT-shaped systems.
    """
    n = A.shape[-1]
    G = jnp.einsum("...ki,...kj->...ij", A, A)
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    eps = (1e-5 * tr + 1e-30)[..., None, None]
    Gd = G + eps * jnp.eye(n, dtype=A.dtype)
    if n == 4:
        Ginv = inv4x4(Gd)
    else:
        # Gd is SPD by construction (gram + positive shift): Cholesky +
        # two triangular solves beat the generic batched LU inverse ~2x on
        # TPU (traced 4.9 -> 2.6 ms at 1024 x 12 x 12)
        L = jnp.linalg.cholesky(Gd)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), Gd.shape)
        Y = jax.lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True
        )
        Ginv = jax.lax.linalg.triangular_solve(
            L, Y, left_side=True, lower=True, transpose_a=True
        )
    # init: the inverse's largest-norm column (amplified along the null
    # direction; immune to the unlucky-fixed-column failure mode)
    norms = jnp.linalg.norm(Ginv, axis=-2)  # (..., n) column norms
    best = jnp.argmax(norms, axis=-1)
    x = jnp.take_along_axis(Ginv, best[..., None, None], axis=-1)[..., 0]
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    for _ in range(iters):
        x = jnp.einsum("...ij,...j->...i", Ginv, x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    return x


def use_fast_nullspace() -> bool:
    """Gram-based nullspace on accelerators; exact SVD on CPU (the f64
    oracle-parity tests run there, and gram squaring costs digits)."""
    import jax

    return jax.default_backend() != "cpu"


def det3x3(A: Array) -> Array:
    """Determinant of ``(..., 3, 3)`` batches (closed form, elementwise)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def polar_rotation_3x3(A: Array, iters: int = 9) -> tuple[Array, Array]:
    """(R, s_max) of ``(..., 3, 3)`` batches: the orthogonal polar factor
    (= U V^T of the SVD, same sign convention: det R = sign det A) and the
    largest singular value — WITHOUT a batched SVD (traced at ~5.8 ms for
    1024 matrices on TPU vs ~1.8 ms here; the PnP RANSAC runs one per
    hypothesis, ``ops/pnp.solve_pnp_dlt``).

    Newton polar iteration ``X <- (X + X^-T) / 2`` after a Frobenius
    prescale: every singular value flows to 1 quadratically (from the
    prescaled minimum ~0.57 that is < 5 iterations; the budget covers
    skewed spectra), using only the closed-form :func:`inv3x3` —
    elementwise ops, no custom calls. Degenerate inputs stay finite
    (inv3x3's eps floor), producing a garbage-but-scoreable rotation,
    which is exactly what a degenerate RANSAC hypothesis deserves.
    ``s_max`` is the analytic largest eigenvalue of the SPD polar part
    H = R^T A (trigonometric closed form for symmetric 3x3)."""
    nrm = jnp.maximum(
        jnp.linalg.norm(A, axis=(-2, -1), keepdims=True), 1e-20
    )
    X = A / nrm
    for _ in range(iters):
        X = 0.5 * (X + jnp.swapaxes(inv3x3(X), -1, -2))
    R = X
    H = jnp.einsum("...ji,...jk->...ik", R, A)
    Hs = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    q = jnp.trace(Hs, axis1=-2, axis2=-1) / 3.0
    D = Hs - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p = jnp.sqrt(jnp.maximum(jnp.sum(D * D, axis=(-2, -1)) / 6.0, 1e-30))
    r = jnp.clip(det3x3(D / p[..., None, None]) / 2.0, -1.0, 1.0)
    s_max = q + 2.0 * p * jnp.cos(jnp.arccos(r) / 3.0)
    return R, s_max


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
    # triangular back-substitution (jnp.linalg.solve on L would run a
    # full LU factorisation of the already-factored triangle)
    return jax.scipy.linalg.cho_solve((L, True), b[..., None])[..., 0]


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
