"""Pallas-fused DoG candidate response (extrema + contrast + edge + border).

The XLA path runs SIX separable reduce_window passes over the full
(S+2, H, W) DoG stack (max and min, three axes each) plus eight rolled
copies per layer for the 2x2 Hessian edge test — ~5 ms of the ~25 ms
accuracy-config detect, all pure HBM bandwidth re-streaming the same
stack (``ops/features._local_extrema`` / ``_edge_response_ok``). This
kernel computes the whole masked response map in ONE pass: each grid step
owns a TH-row band, its ±1-row halo arrives as the neighbouring blocks of
the same input (three BlockSpecs with shifted index maps), the 3x3x3
window max/min are register max-trees over ``pltpu.roll`` lane shifts,
and the contrast/edge/border masks fuse into the same loop. Read traffic
3x the stack (halo re-reads), write traffic the (S, H, W) response — at
HBM bandwidth that is ~0.5 ms where XLA pays ~5.

Row/lane constraints: W must be a 128-lane multiple and H a TH multiple —
true for the two largest octaves of every supported image size, which is
where the cost lives; smaller octaves fall back to the XLA path
(``ops/features._octave_candidates`` guards).

Semantics match the XLA path with f32 windows: extremum = the centre
equals its own window max (or min), wrap-around roll artifacts at the x
borders fall inside the 8-px border mask, and the vertical Hessian term
uses the true halo rows (the XLA path's jnp.roll wraps there — also
border-masked). Reference analogue: ``view_processor.py:199-202`` (cv2
SIFT's detectAndCompute does all of this inside OpenCV).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array


def _cand_kernel(
    dm_ref, d0_ref, dp_ref, out_ref, *, S, TH, H, contrast, edge_r, border
):
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = d0_ref.shape[2]
    big = jnp.concatenate(
        [dm_ref[...], d0_ref[...], dp_ref[...]], axis=1
    )  # (S+2, 3*TH, W)
    prev = big[:, TH - 1 : 2 * TH - 1]  # row y-1 of every band row
    cur = big[:, TH : 2 * TH]
    nxt = big[:, TH + 1 : 2 * TH + 1]

    def roll(a, k, axis):
        # pltpu.roll wants non-negative shifts; -1 == size-1 circularly
        return pltpu.roll(a, k % a.shape[axis], axis=axis)

    def xwin(a, op):
        return op(op(roll(a, 1, 2), a), roll(a, -1, 2))

    mx, mn = jnp.maximum, jnp.minimum
    wmax = mx(mx(xwin(prev, mx), xwin(cur, mx)), xwin(nxt, mx))  # (S+2,TH,W)
    wmin = mn(mn(xwin(prev, mn), xwin(cur, mn)), xwin(nxt, mn))

    row0 = pl.program_id(0) * TH
    rows = row0 + lax.broadcasted_iota(jnp.int32, (TH, W), 0)
    cols = lax.broadcasted_iota(jnp.int32, (TH, W), 1)
    bm = (
        (rows >= border)
        & (rows < H - border)
        & (cols >= border)
        & (cols < W - border)
    )

    for s in range(1, S + 1):
        c = cur[s]
        nmax = mx(mx(wmax[s - 1], wmax[s]), wmax[s + 1])
        nmin = mn(mn(wmin[s - 1], wmin[s]), wmin[s + 1])
        is_ext = (c >= nmax) | (c <= nmin)
        cok = jnp.abs(c) > contrast

        l_prev, l_next = prev[s], nxt[s]
        rl = lambda a, k: roll(a, k, 1)  # noqa: E731
        dxx = rl(c, -1) - 2.0 * c + rl(c, 1)
        dyy = l_next - 2.0 * c + l_prev
        dxy = 0.25 * (rl(l_next, -1) - rl(l_next, 1) - rl(l_prev, -1) + rl(l_prev, 1))
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        eok = (det > 0) & (tr * tr * edge_r < (edge_r + 1.0) ** 2 * det)

        out_ref[s - 1, :, :] = jnp.where(
            is_ext & cok & eok & bm, jnp.abs(c), 0.0
        )


def pallas_candidate_response(
    dog: Array,
    contrast_threshold: float,
    edge_threshold: float,
    border: int = 8,
    interpret: bool = False,
) -> Array:
    """(S+2, H, W) f32 DoG stack -> (S, H, W) masked |response| map."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S2, H, W = dog.shape
    S = S2 - 2
    TH = 8
    if W % 128 or H % TH:
        raise ValueError(f"pallas candidate kernel needs W%128==0, H%{TH}==0; got {H}x{W}")
    nb = H // TH

    def spec(shift):
        return pl.BlockSpec(
            (S2, TH, W),
            lambda y: (0, jnp.clip(y + shift, 0, nb - 1), 0),
            memory_space=pltpu.VMEM,
        )

    kern = functools.partial(
        _cand_kernel,
        S=S,
        TH=TH,
        H=H,
        contrast=float(contrast_threshold),
        edge_r=float(edge_threshold),
        border=int(border),
    )
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[spec(-1), spec(0), spec(+1)],
        out_specs=pl.BlockSpec(
            (S, TH, W), lambda y: (0, y, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, H, W), dog.dtype),
        interpret=interpret,
    )(dog, dog, dog)
