"""Distributed Schur-complement bundle adjustment.

The BASELINE.json north star: camera blocks replicated, 3D-point blocks and
their observations sharded across a TPU mesh; the Schur reduction
``S = U + lambda I - sum_m G_m D_m^-1 G_m^T`` computed as local per-shard
contractions followed by one ``psum`` of the small (7V, 7V) reduced system
(+ right-hand side) over ICI; the reduced solve replicated on every device;
point back-substitution purely local.

Layout contract: observation o lives on the shard that owns point
``obs.point[o]`` with point indices rewritten to be shard-local —
:func:`partition_observations` produces exactly that layout. Communication
per LM iteration is then just

    psum: U (V,7,7) + S_coupling (V,7,7,V) + b_red (V,7) + 2 scalars (cost)

independent of the number of points/observations — the design scales until
the reduced camera system itself saturates (at which point
``BAConfig.pcg_fallback_cameras`` switches the replicated dense solve to
matrix-free PCG; see ``ops/linalg.pcg_solve``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from structure_from_motion_tpu.config import BAConfig
from structure_from_motion_tpu.ops.ba import (
    BAObservations,
    BAState,
    run_bundle_adjustment,
)


def interleave_points(x: Array, num_shards: int) -> Array:
    """Permute a point-axis array so global point id p lands on shard
    ``p % num_shards`` at local offset ``p // num_shards``.

    Round-robin placement balances *sequentially allocated* point ids (the
    incremental pipeline allocates map slots in order, so a block partition
    would pile every early observation onto shard 0 and overflow its
    bucket). The output block-reshapes onto the mesh point axis; pair with
    ``partition_observations(..., interleave=True)``.
    """
    M = x.shape[0]
    return x.reshape((M // num_shards, num_shards) + x.shape[1:]).swapaxes(
        0, 1
    ).reshape(x.shape)


def deinterleave_points(x: Array, num_shards: int) -> Array:
    """Inverse of :func:`interleave_points`."""
    M = x.shape[0]
    return x.reshape((num_shards, M // num_shards) + x.shape[1:]).swapaxes(
        0, 1
    ).reshape(x.shape)


def partition_observations(
    obs: BAObservations,
    num_points: int,
    num_shards: int,
    per_shard_capacity: int,
    interleave: bool = False,
) -> BAObservations:
    """Rearrange observations into per-point-shard buckets.

    With ``interleave=False`` points are block-partitioned: shard s owns
    points ``[s * M/num_shards, (s+1) * M/num_shards)``. With
    ``interleave=True`` shard s owns points ``p`` with ``p % num_shards == s``
    (local id ``p // num_shards``) — the balanced layout for sequentially
    allocated ids; the point arrays must then be permuted with
    :func:`interleave_points`. Every observation is routed to its point's
    shard and its point index rewritten to shard-local.
    Output arrays have shape (num_shards * per_shard_capacity, ...) so that
    a plain block reshape matches the mesh sharding; overflowing
    observations (more than ``per_shard_capacity`` on one shard) are dropped
    with their validity cleared — callers should size capacities so this
    cannot happen (the count is checkable via the returned mask).
    Pure JAX — usable inside jit.
    """
    if num_points % num_shards:
        raise ValueError(f"{num_points=} not divisible by {num_shards=}")
    pts_per_shard = num_points // num_shards

    if interleave:
        shard = obs.point % num_shards  # (O,)
    else:
        shard = obs.point // pts_per_shard  # (O,)
    shard = jnp.where(obs.valid, shard, num_shards)  # invalid -> overflow bin
    # position of each obs within its shard bucket (stable order)
    one_hot = jax.nn.one_hot(shard, num_shards + 1, dtype=jnp.int32)  # (O,S+1)
    pos_in_shard = jnp.cumsum(one_hot, axis=0) - one_hot  # exclusive prefix
    pos = jnp.take_along_axis(pos_in_shard, shard[:, None], axis=1)[:, 0]

    keep = jnp.logical_and(obs.valid, pos < per_shard_capacity)
    dest = shard * per_shard_capacity + jnp.minimum(pos, per_shard_capacity - 1)
    dest = jnp.where(keep, dest, num_shards * per_shard_capacity)  # scratch slot

    local_pt = (
        obs.point // num_shards if interleave else obs.point - shard * pts_per_shard
    )
    total = num_shards * per_shard_capacity
    cam = jnp.zeros((total + 1,), jnp.int32).at[dest].set(obs.cam.astype(jnp.int32))
    pt = jnp.zeros((total + 1,), jnp.int32).at[dest].set(
        local_pt.astype(jnp.int32)
    )
    uv = jnp.zeros((total + 1, 2), obs.uv_norm.dtype).at[dest].set(obs.uv_norm)
    valid = jnp.zeros((total + 1,), bool).at[dest].set(keep)
    return BAObservations(
        cam=cam[:total], point=pt[:total], uv_norm=uv[:total], valid=valid[:total]
    )


def sharded_bundle_adjustment(
    state: BAState,
    obs: BAObservations,
    config: BAConfig,
    mesh: Mesh,
):
    """Run BA with points+observations sharded over ``mesh``.

    ``state.X``/``state.pt_valid`` shard along the point axis;
    ``obs`` must already be in :func:`partition_observations` layout
    (its leading axis shards evenly). Cameras replicate. Returns the same
    (state, costs) as the single-device path — bitwise identical math up to
    reduction order.
    """
    # all mesh axes gang up on the point/observation axis: a 2-D
    # (hosts, chips) mesh shards points over hosts x chips and the psum of
    # the reduced camera system rides ICI within a host and DCN across
    # hosts — one collective either way
    axes = tuple(mesh.axis_names)
    n = mesh.devices.size

    def local_ba(C, q, cam_valid, X, pt_valid, o_cam, o_pt, o_uv, o_valid):
        st = BAState(C=C, q=q, X=X, cam_valid=cam_valid, pt_valid=pt_valid)
        ob = BAObservations(cam=o_cam, point=o_pt, uv_norm=o_uv, valid=o_valid)
        psum = lambda x: jax.lax.psum(x, axes)
        out, costs = run_bundle_adjustment(st, ob, config, psum=psum)
        return out.C, out.q, out.X, costs

    shard = P(axes)
    rep = P()
    fn = jax.shard_map(
        local_ba,
        mesh=mesh,
        in_specs=(rep, rep, rep, shard, shard, shard, shard, shard, shard),
        out_specs=(rep, rep, shard, rep),
        check_vma=False,
    )
    C, q, X, costs = fn(
        state.C,
        state.q,
        state.cam_valid,
        state.X,
        state.pt_valid,
        obs.cam,
        obs.point,
        obs.uv_norm,
        obs.valid,
    )
    return (
        BAState(C=C, q=q, X=X, cam_valid=state.cam_valid, pt_valid=state.pt_valid),
        costs,
    )
