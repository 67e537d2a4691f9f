"""Hypothesis-batch RANSAC machinery.

The reference runs RANSAC as a sequential Python loop — sample, fit, score,
keep-best — seeded through the *global* ``random`` module
(``epipolar_processor.py:194-247``, ``campose_processor.py:485-562``,
``utils.py:163-174``). On TPU the whole loop becomes one batch:

    1. draw ALL hypothesis index-sets at once (Gumbel top-k gives
       without-replacement samples as a single (K, N) uniform + top_k),
    2. vmap the minimal solver over the K hypothesis sets (one batched SVD),
    3. score every hypothesis against every point as one (K, N) matrix op,
    4. argmax inlier counts.

Randomness is an explicit ``jax.random`` key; determinism for tests comes
from fixing the key, not from seeding global state.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


class RansacResult(NamedTuple):
    model: Array  # best model parameters
    inliers: Array  # (N,) bool inlier mask of the best model
    num_inliers: Array  # () int32
    best_index: Array  # () int32 index of the winning hypothesis


def sample_index_sets(
    key: Array, mask: Array, num_hypotheses: int, sample_size: int
) -> Array:
    """Draw ``(num_hypotheses, sample_size)`` index sets of valid points,
    uniformly *without replacement* within each hypothesis.

    Gumbel/uniform top-k trick: rank i.i.d. uniforms, masked entries get
    ``-inf`` so only valid indices can win. If fewer than ``sample_size``
    points are valid, invalid indices leak in — callers must gate on the
    valid count (the pipeline checks minimum correspondences up front,
    mirroring the reference's >= 6 / >= 8 point guards).
    """
    n = mask.shape[0]
    u = jax.random.uniform(key, (num_hypotheses, n))
    u = jnp.where(mask[None, :], u, -jnp.inf)
    _, idx = jax.lax.top_k(u, sample_size)
    return idx


def ransac(
    key: Array,
    mask: Array,
    num_hypotheses: int,
    sample_size: int,
    fit: Callable[[Array], Array],
    score: Callable[[Array], Array],
) -> RansacResult:
    """Generic batched RANSAC.

    ``fit`` maps one ``(sample_size,)`` int index set -> model params and is
    vmapped over hypotheses; ``score`` maps the *batched* models
    ``(K, ...)`` -> residuals ``(K, N)`` (so scoring stays one big matrix
    op — implementers should use einsum/matmul, not a second vmap if
    avoidable). Points where ``mask`` is False never count as inliers.

    Inlier decision (residual < threshold) lives inside ``score`` returning
    a boolean matrix, keeping this function metric-agnostic.
    """
    idx_sets = sample_index_sets(key, mask, num_hypotheses, sample_size)
    models = jax.vmap(fit)(idx_sets)  # (K, ...)
    inlier_matrix = score(models)  # (K, N) bool
    inlier_matrix = jnp.logical_and(inlier_matrix, mask[None, :])
    counts = jnp.sum(inlier_matrix, axis=1)
    best = jnp.argmax(counts)  # ties -> lowest index, like the reference
    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    return RansacResult(
        model=best_model,
        inliers=inlier_matrix[best],
        num_inliers=counts[best],
        best_index=best,
    )
