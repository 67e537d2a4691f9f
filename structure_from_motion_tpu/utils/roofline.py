"""Speed-of-light (roofline) accounting for the hot kernels.

BASELINE.json's north star says "BA and matching kernels at speed-of-light
per chip"; wall numbers alone cannot say how far from that light we are.
This module provides analytic FLOP + HBM-byte models for one descriptor
match and one BA LM iteration, and converts a measured wall time into a
percent-of-roofline figure:

    sol_seconds = max(flops / peak_flops, bytes / peak_bandwidth)
    sol_pct     = 100 * sol_seconds / measured_seconds

Interpretation note (printed into the bench JSON): these kernels are
dominated by top-k reductions and row-granular gather/scatter, which the
roofline model (pure matmul FLOPs + streaming bytes) does NOT price — a low
percentage therefore localises the gap to latency-bound data movement, not
to MXU underutilisation. The models are deliberately optimistic so the
number is a true upper-bound gap.

Peaks are for TPU v5e (the chip behind this container's tunnel): 197
bf16 TFLOP/s MXU peak and 819 GB/s HBM bandwidth (public spec figures).
f32 matmuls lower through the MXU at roughly half the bf16 rate; both
figures are reported.
"""

from __future__ import annotations

V5E_BF16_FLOPS = 1.97e14
V5E_F32_FLOPS = 0.5 * V5E_BF16_FLOPS  # conservative f32-through-MXU rate
V5E_HBM_BYTES_PER_S = 8.19e11


def matcher_model(n_ref: int, n_que: int, dim: int, bytes_per_el: int = 4):
    """(flops, hbm_bytes) of one brute-force match: the (Nr, D) x (D, Nq)
    distance matmul + the top-2 reduction's streaming traffic."""
    flops = 2.0 * n_ref * n_que * dim
    bytes_ = bytes_per_el * (
        n_ref * dim + n_que * dim  # descriptor reads
        + n_ref * n_que  # distance matrix write OR fused top-2 read-equivalent
        + 3 * n_ref  # d1/d2/argmax outputs
    )
    return flops, bytes_


def ba_iteration_model(
    n_views: int, n_points: int, n_obs: int, dense_schur: bool = True,
    pcg_iters: int = 8, bytes_per_el: int = 4, ell_rows: int = 0,
    adaptive: bool = True,
):
    """(flops, hbm_bytes) of one Schur-LM iteration.

    Counts: residual+Jacobian assembly (~300 flops/obs), the per-observation
    block products (U/D/W/b, ~360 flops/obs), the Schur reduction (dense:
    the (M,V,7,3) coupling build — one-hot matmul in ELL layout, scatter in
    CSR — plus one (V,7,7,V) contraction; PCG: per-CG matvec einsums), the
    reduced solve, point back-substitution, and (``adaptive``) the
    trust-region accept test's extra residual pass. With ``ell_rows > 0``
    the observation stream is the padded ELL table (``n_points * ell_rows``
    slots) and every point-axis reduction is a dense pass priced at HBM
    bandwidth; gathers from the small camera table and the materialised
    one-hot masks are priced by their streamed bytes. Round 2's model
    skipped the coupling-build and gather traffic entirely, which is why
    its sol%% could not separate physics from fixable layout cost.
    """
    V, M, O, b = n_views, n_points, n_obs, bytes_per_el
    if ell_rows:
        O = M * ell_rows  # padded slot count — invalid slots still stream
    flops = O * (300.0 + 360.0)  # assembly + block products
    # assemble pass: inputs (cam,uv,valid,C_o,q_o,X_o = 14) + outputs
    # (DtD 9, W 21, b_p 3) + camera-table gather outputs (C,q = 7)
    bytes_ = b * O * (14 + 9 + 21 + 3 + 7)
    # point reductions read DtD/b_p once more; D, Dinv, b_p at point grain
    bytes_ += b * O * (9 + 3) + b * M * (9 + 9 + 3)
    if adaptive:
        # accept-test residual pass re-reads the observation inputs
        bytes_ += b * O * 14
        flops += O * 300.0
    if dense_schur:
        flops += M * V * V * (21 * 3 + 21 * 7)  # G Dinv G^T contraction
        if ell_rows:
            # one-hot (M,T,V) mask write+read for the G matmul, G write+read
            flops += M * ell_rows * V * 21 * 2.0
            bytes_ += b * (M * ell_rows * V) * 2 + b * (M * V * 21) * 3
        else:
            bytes_ += b * (M * V * 21) * 3  # G scatter write + 2 reads
        flops += ((7 * V) ** 3) / 3.0  # dense solve
    else:
        per_cg = O * (2 * 42 + 2 * 21) + M * 9 + V * 49  # two W einsums, Dinv, U
        flops += pcg_iters * per_cg
        # per CG iter: W read, x gather out, point reduction, y broadcast,
        # one-hot coupling matmul read
        bytes_ += b * pcg_iters * (O * (21 + 7 + 3 + 3 + V) + M * 6)
    flops += O * 42 + M * 9  # back-substitution
    bytes_ += b * O * (21 + 7 + 3) + b * M * 6
    return flops, bytes_


def speed_of_light_seconds(
    flops: float, hbm_bytes: float, peak_flops: float = V5E_F32_FLOPS,
    peak_bw: float = V5E_HBM_BYTES_PER_S,
) -> float:
    return max(flops / peak_flops, hbm_bytes / peak_bw)


def sol_pct(measured_seconds: float, flops: float, hbm_bytes: float) -> float:
    """Percent of the (optimistic) roofline the measured time achieves."""
    return 100.0 * speed_of_light_seconds(flops, hbm_bytes) / measured_seconds
