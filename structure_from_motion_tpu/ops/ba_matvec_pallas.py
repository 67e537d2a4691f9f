"""Pallas-fused halves of the PCG Schur matvec.

The matrix-free reduced-camera matvec (``ops/ba.py::_solve_pcg``) is
gather-row-latency bound on TPU: per CG iteration it gathers the camera
vector ``x[cam_o]`` across the whole observation stream (~191k rows at the
500-camera whole-trajectory scale) and scatters/gathers the coupling term
back per camera (camera-ELL: another ~220k-row gather) — ~6 ms of row
latency per iteration against < 1 ms of streaming bandwidth. Both sides
are really (observation x camera) incidence contractions, which the MXU
does natively: build the one-hot incidence ON THE FLY in VMEM per 512-slot
tile (an iota compare — never materialised to HBM) and contract.

    kernel A ("expand"):   t[o, :]  = W_o^T  x[cam_o]      -> (3, O)
        x (7, V) resident in VMEM; xo = x @ onehot^T rides the MXU.
    kernel B ("reduce"):   coup[v] = sum_{o: cam_o = v} W_o y_o  -> (7, V)
        payload z = W_o y_o computed in-register; z @ onehot accumulates
        (7, V) across the sequential grid — the same accumulator pattern
        as ``ops/ba_pallas.py``'s U reduction.

Streams use the transposed (component, O) layout so observations ride the
128-lane axis. The point-axis reductions stay in XLA: with the tiered ELL
layout they are dense reshape-sums at HBM bandwidth already
(``models/global_ba.pack_tiered``). Guard: V <= 2048 keeps the per-tile
one-hot under ~4 MB of VMEM.

Reference analogue: the reference's bundle adjustment solves its reduced
system densely on the host (``ba_processor.py:359-382``); a matrix-free
MXU-contracted PCG is the TPU-native replacement at 100x its problem size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

_TO = 512


def _expand_kernel(cam_ref, w_ref, x_ref, t_ref):
    import jax.lax as lax

    ids = cam_ref[0, :]
    V = x_ref.shape[1]
    onehot = (
        ids[:, None] == lax.broadcasted_iota(jnp.int32, (ids.shape[0], V), 1)
    ).astype(x_ref.dtype)
    xo = jnp.dot(x_ref[:, :], onehot.T, preferred_element_type=jnp.float32)
    # t[c] = sum_i W[i*3+c] * xo[i]
    for c in range(3):
        acc = w_ref[c, :] * xo[0, :]
        for i in range(1, 7):
            acc += w_ref[i * 3 + c, :] * xo[i, :]
        t_ref[c, :] = acc


def _reduce_kernel(cam_ref, w_ref, y_ref, acc_ref):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    pi = pl.program_id(0)
    ids = cam_ref[0, :]
    V = acc_ref.shape[1]
    # z[i] = sum_c W[i*3+c] * y[c]  (7, TO)
    z = jnp.stack(
        [
            w_ref[i * 3, :] * y_ref[0, :]
            + w_ref[i * 3 + 1, :] * y_ref[1, :]
            + w_ref[i * 3 + 2, :] * y_ref[2, :]
            for i in range(7)
        ],
        axis=0,
    )
    onehot = (
        ids[:, None] == lax.broadcasted_iota(jnp.int32, (ids.shape[0], V), 1)
    ).astype(z.dtype)
    tile = jnp.dot(z, onehot, preferred_element_type=jnp.float32)  # (7, V)

    @pl.when(pi == 0)
    def _init():
        acc_ref[:, :] = tile

    @pl.when(pi != 0)
    def _acc():
        acc_ref[:, :] += tile


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_expand_cam(
    cam: Array, w21: Array, x: Array, interpret: bool = False
) -> Array:
    """t (3, O) with t[:, o] = W_o^T x[cam_o].

    ``w21``: (21, O) transposed W blocks (component-major: W[o, i, c] at
    row i*3+c), ``x``: (V, 7) camera vector. O must be a 512 multiple.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    O = cam.shape[0]
    V = x.shape[0]
    assert O % _TO == 0, O
    dtype = jnp.float32

    def tile(width):
        return pl.BlockSpec((width, _TO), lambda i: (0, i), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _expand_kernel,
        grid=(O // _TO,),
        in_specs=[
            tile(1),
            tile(21),
            pl.BlockSpec((7, V), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tile(3),
        out_shape=jax.ShapeDtypeStruct((3, O), dtype),
        interpret=interpret,
    )(cam.astype(jnp.int32)[None, :], w21.astype(dtype), x.astype(dtype).T)


@functools.partial(jax.jit, static_argnames=("n_views", "interpret"))
def pallas_reduce_cam(
    cam: Array, w21: Array, y3: Array, n_views: int, interpret: bool = False
) -> Array:
    """coup (V, 7) with coup[v] = sum_{o: cam_o = v} W_o y[:, o].

    ``y3``: (3, O) per-slot point vectors (already tier-broadcast).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    O = cam.shape[0]
    assert O % _TO == 0, O
    dtype = jnp.float32

    def tile(width):
        return pl.BlockSpec((width, _TO), lambda i: (0, i), memory_space=pltpu.VMEM)

    acc = pl.pallas_call(
        _reduce_kernel,
        grid=(O // _TO,),
        in_specs=[
            tile(1),
            tile(21),
            tile(3),
        ],
        out_specs=pl.BlockSpec(
            (7, n_views), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((7, n_views), dtype),
        interpret=interpret,
    )(cam.astype(jnp.int32)[None, :], w21.astype(dtype), y3.astype(dtype))
    return acc.T
