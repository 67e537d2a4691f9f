"""Descriptor matching on the MXU.

Replaces the reference's OpenCV ``BFMatcher`` stage
(``key_tracker.py:82-85, 246-344``): L2 brute-force matching with Lowe's
ratio test (0.7), optional cross-check (mutual nearest neighbour), and
train-index deduplication keeping the minimum distance.

TPU design: the (Nr, Nq) squared-distance matrix is one matmul
(``|a|^2 + |b|^2 - 2 a.b``) that XLA tiles onto the MXU; top-2 per row is a
single ``lax.top_k``; dedup is a scatter-min over the target axis. A Pallas
kernel (:func:`pallas_match_top2`) fuses the distance computation with the
running top-2 so the full distance matrix never round-trips to HBM —
the fused path streams (128, D) x (D, Nq) tiles through VMEM.

All shapes are static; invalid rows/columns are masked with +inf distances.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from structure_from_motion_tpu.config import MatcherConfig


class MatchResult(NamedTuple):
    target: Array  # (Nr,) int32 index into que keys, -1 when invalid
    valid: Array  # (Nr,) bool
    distance: Array  # (Nr,) float L2 distance of the best match


_INF = 3.0e38  # plain float: jnp scalars would be captured consts in pallas


def squared_distances(
    desc_ref: Array, desc_que: Array, mask_ref: Array, mask_que: Array
) -> Array:
    """Masked (Nr, Nq) squared L2 distances; one MXU matmul.

    Accumulates the cross term in float32 (``preferred_element_type``) so
    bfloat16 descriptors still score accurately.
    """
    cross = jnp.matmul(
        desc_ref, desc_que.T, preferred_element_type=jnp.float32
    )
    sq_r = jnp.sum(desc_ref.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    sq_q = jnp.sum(desc_que.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    d2 = sq_r + sq_q.T - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    d2 = jnp.where(mask_que[None, :], d2, _INF)
    d2 = jnp.where(mask_ref[:, None], d2, _INF)
    return d2


def hamming_distances(
    desc_ref: Array, desc_que: Array, mask_ref: Array, mask_que: Array
) -> Array:
    """Masked (Nr, Nq) Hamming distances of +-1 binary codes; one MXU matmul:
    ham(a, b) = (D - a.b) / 2 for a, b in {-1, +1}^D (the reference's
    Hamming BFMatcher branch, ``key_tracker.py:82-85``)."""
    D = desc_ref.shape[1]
    dot = jnp.matmul(desc_ref, desc_que.T, preferred_element_type=jnp.float32)
    ham = 0.5 * (D - dot)
    ham = jnp.where(mask_que[None, :], ham, _INF)
    ham = jnp.where(mask_ref[:, None], ham, _INF)
    return ham


def match_descriptors(
    desc_ref: Array,
    desc_que: Array,
    mask_ref: Array,
    mask_que: Array,
    config: MatcherConfig,
) -> MatchResult:
    """Brute-force matching with ratio test / cross-check / dedup.

    For every valid ref key: nearest + second-nearest que key; keep when
    ``d1 < ratio * d2`` (Lowe, on unsquared L2 like the reference's
    ``key_tracker.py:337-344``); with ``cross_check`` also require the ref
    key to be its match's nearest neighbour. Finally each que key may be
    claimed by at most one ref key — the one at minimum distance (the
    reference's trainIdx dedup, ``key_tracker.py:276-291``).
    ``config.metric`` picks L2 (float descriptors) or Hamming (+-1 codes).
    """
    def _tile_ok(n: int, tile: int) -> bool:
        # pallas_match_top2 tiles at min(tile, n): n must divide into the
        # tile when n >= tile, and be lane-aligned (x128) when it IS the
        # tile — e.g. 768 ref keys pass a naive %256 check but crash the
        # 512-wide query tiling
        return n % tile == 0 if n >= tile else n % 128 == 0

    use_pallas = config.metric == "l2" and not config.cross_check and (
        config.impl == "pallas"
        or (
            config.impl == "auto"
            and jax.default_backend() == "tpu"
            and _tile_ok(desc_ref.shape[0], 256)
            and _tile_ok(desc_que.shape[0], 512)
        )
    )
    if config.metric == "hamming":
        d2 = hamming_distances(desc_ref, desc_que, mask_ref, mask_que)
        neg_top2, idx_top2 = jax.lax.top_k(-d2, 2)
        d1 = jnp.maximum(-neg_top2[:, 0], 0.0)
        d2nd = jnp.maximum(-neg_top2[:, 1], 0.0)
        j = idx_top2[:, 0]
        nq_total = d2.shape[1]
    elif use_pallas:
        d1_sq, d2_sq, j = pallas_match_top2(
            desc_ref, desc_que, mask_que,
            interpret=jax.default_backend() != "tpu",
        )
        d1 = jnp.where(mask_ref, jnp.sqrt(d1_sq), _INF)
        d2nd = jnp.sqrt(d2_sq)
        nq_total = desc_que.shape[0]
    else:
        d2 = squared_distances(desc_ref, desc_que, mask_ref, mask_que)
        neg_top2, idx_top2 = jax.lax.top_k(-d2, 2)
        d1 = jnp.sqrt(jnp.maximum(-neg_top2[:, 0], 0.0))
        d2nd = jnp.sqrt(jnp.maximum(-neg_top2[:, 1], 0.0))
        j = idx_top2[:, 0]
        nq_total = d2.shape[1]

    valid = jnp.logical_and(mask_ref, d1 < config.ratio * d2nd)

    if config.cross_check:
        # nearest ref for every que column
        back = jnp.argmin(d2, axis=0)  # (Nq,)
        mutual = back[j] == jnp.arange(d2.shape[0])
        valid = jnp.logical_and(valid, mutual)

    # dedup: each que index keeps only its minimum-distance claimant
    nr = desc_ref.shape[0]
    dist_or_inf = jnp.where(valid, d1, _INF)
    best_per_que = jnp.full((nq_total,), _INF, dtype=d1.dtype).at[j].min(dist_or_inf)
    is_winner = dist_or_inf <= best_per_que[j]
    # break exact ties by lowest ref index
    first_claimant = (
        jnp.full((nq_total,), nr, dtype=jnp.int32)
        .at[j]
        .min(jnp.where(is_winner, jnp.arange(nr, dtype=jnp.int32), nr))
    )
    valid = jnp.logical_and(
        valid,
        jnp.logical_and(is_winner, first_claimant[j] == jnp.arange(nr)),
    )

    target = jnp.where(valid, j, -1)
    return MatchResult(target=target.astype(jnp.int32), valid=valid, distance=d1)


# ---------------------------------------------------------------------------
# Pallas fused distance + top-2 kernel
# ---------------------------------------------------------------------------


def _match_top2_kernel(ref_ref, que_ref, sqq_ref, maskq_ref, d1_ref, d2_ref, j1_ref):
    """One grid step: a (TR, D) ref tile against a (TQ, D) que tile.

    Keeps a running (best, second-best, argbest) per ref row across the que
    grid dimension. Distances omit the |ref|^2 term (constant per row —
    irrelevant to the top-2 ordering) and add it back on the host side.

    Mosaic notes: ``lax.top_k``/``argmin`` do not lower on TPU, so the
    per-tile top-2 is built from row-min reductions + an iota select; the
    running state is stored lane-major as (1, TR) rows (a (TR, 1) output
    block would pad every row to 128 lanes in VMEM).
    """
    from jax.experimental import pallas as plmod

    ri = plmod.program_id(0)
    qi = plmod.program_id(1)
    TQ = que_ref.shape[0]
    row = (plmod.ds(ri, 1), slice(None))

    cross = jnp.dot(
        ref_ref[:, :], que_ref[:, :].T, preferred_element_type=jnp.float32
    )  # (TR, TQ)
    d = sqq_ref[0, :][None, :] - 2.0 * cross  # (TR, TQ) partial distances
    d = jnp.where(maskq_ref[0, :][None, :] != 0, d, _INF)

    iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)  # (TR, TQ)
    tile_d1 = jnp.min(d, axis=1)  # (TR,)
    # first column index attaining the min (top_k's tie rule)
    tile_j1 = jnp.min(
        jnp.where(d <= tile_d1[:, None], iota, TQ), axis=1
    )
    d_excl = jnp.where(iota == tile_j1[:, None], _INF, d)
    tile_d2 = jnp.min(d_excl, axis=1)
    tile_j1 = tile_j1 + qi * TQ

    @plmod.when(qi == 0)
    def _init():
        d1_ref[row] = tile_d1[None, :]
        d2_ref[row] = tile_d2[None, :]
        j1_ref[row] = tile_j1[None, :]

    @plmod.when(qi != 0)
    def _merge():
        old_d1 = d1_ref[row][0, :]
        old_d2 = d2_ref[row][0, :]
        old_j1 = j1_ref[row][0, :]
        new_best = tile_d1 < old_d1
        best = jnp.where(new_best, tile_d1, old_d1)
        best_j = jnp.where(new_best, tile_j1, old_j1)
        # second best: min of (loser of best contest, both seconds)
        runner = jnp.where(new_best, old_d1, tile_d1)
        second = jnp.minimum(runner, jnp.minimum(old_d2, tile_d2))
        d1_ref[row] = best[None, :]
        d2_ref[row] = second[None, :]
        j1_ref[row] = best_j[None, :]


@functools.partial(jax.jit, static_argnames=("interpret", "tr", "tq"))
def pallas_match_top2(
    desc_ref: Array,
    desc_que: Array,
    mask_que: Array,
    interpret: bool = False,
    tr: int = 256,
    tq: int = 512,
):
    """Fused top-2 nearest-neighbour distances without materialising the
    (Nr, Nq) matrix in HBM.

    Returns (d1_sq, d2_sq, j1) per ref row (squared L2, full value including
    the |ref|^2 term). Requires Nr, Nq multiples of 128 (the caller pads —
    capacities are powers of two throughout the pipeline).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nr, dim = desc_ref.shape
    nq = desc_que.shape[0]
    TR, TQ = min(tr, nr), min(tq, nq)
    assert nr % TR == 0 and nq % TQ == 0, (nr, nq)

    sqq = jnp.sum(desc_que.astype(jnp.float32) ** 2, axis=1)[None, :]  # (1, Nq)
    maskq = mask_que.astype(jnp.int32)[None, :]

    grid = (nr // TR, nq // TQ)
    d1, d2, j1 = pl.pallas_call(
        _match_top2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, dim), lambda i, q: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, dim), lambda i, q: (q, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ), lambda i, q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ), lambda i, q: (0, q), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # the whole (nr/TR, TR) result stays VMEM-resident across the
            # grid (it is tiny); each step row-stores its ref tile's state
            pl.BlockSpec((nr // TR, TR), lambda i, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr // TR, TR), lambda i, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr // TR, TR), lambda i, q: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nr // TR, TR), jnp.float32),
            jax.ShapeDtypeStruct((nr // TR, TR), jnp.float32),
            jax.ShapeDtypeStruct((nr // TR, TR), jnp.int32),
        ],
        interpret=interpret,
    )(desc_ref, desc_que, sqq, maskq)

    sqr = jnp.sum(desc_ref.astype(jnp.float32) ** 2, axis=1)
    d1_sq = jnp.maximum(d1.reshape(nr) + sqr, 0.0)
    d2_sq = jnp.maximum(d2.reshape(nr) + sqr, 0.0)
    return d1_sq, d2_sq, j1.reshape(nr)
