"""Pallas separable Gaussian pyramid blur.

The MXU path multiplies dense banded matrices (``ops/features._blur_levels``):
at HIGH precision (bf16x3 passes, needed for DoG-grade accuracy) the
2x-upsampled octave costs ~8 ms of MXU time for what is arithmetically a
~21-tap stencil. This kernel runs the stencil on the VPU instead: one
horizontal pass producing ALL levels from the shared base (read the image
once), one vertical pass per the (L, H, W) intermediate, each tap a
``pltpu.roll`` lane/sublane rotation + FMA in f32 — EXACT f32 arithmetic
(no bf16 truncation at all, unlike the matmul path), at streaming
bandwidth: ~55 B/pixel of traffic vs the matmul path's 3-pass MXU cost.

Halos ride the neighbouring blocks of the same input (three BlockSpecs
with clipped index maps); at the image borders the out-of-range halo block
is ZEROED in-kernel, which reproduces the band-matmul path's zero-padded
'SAME' correlation exactly (parity-tested at 1e-5, the f32 sum-order
bound).

Constraints: W % 128 == 0 (lane blocks), H % 16 == 0 and kernel radius
<= 16 (the vertical halo is one 16-row block). Callers fall back to the
matmul path otherwise (only the smallest octaves).

Reference analogue: ``view_processor.py:199-202`` — cv2's SIFT builds this
pyramid inside OpenCV; the stencil is the TPU-native equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

_TW = 128  # lane-block width of the horizontal pass
_THV = 16  # row-block height of the vertical pass (also the max radius)


def _hpass_kernel(left_ref, mid_ref, right_ref, out_ref, *, ks, radius):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(1)
    nj = pl.num_programs(1)
    zero = jnp.zeros_like(mid_ref[...])
    left = jnp.where(j == 0, zero, left_ref[...])
    right = jnp.where(j == nj - 1, zero, right_ref[...])
    strip = jnp.concatenate([left, mid_ref[...], right], axis=1)  # (TH, 3TW)
    width = strip.shape[1]
    for lvl, k in enumerate(ks):
        r = (len(k) - 1) // 2
        acc = strip * float(k[r])
        for t in range(len(k)):
            if t == r:
                continue
            acc = acc + float(k[t]) * pltpu.roll(strip, (r - t) % width, axis=1)
        TW = mid_ref.shape[1]
        out_ref[lvl, :, :] = acc[:, TW : 2 * TW]


def _vpass_kernel(top_ref, mid_ref, bot_ref, out_ref, *, ks, radius):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    ni = pl.num_programs(0)
    zero = jnp.zeros_like(mid_ref[...])
    top = jnp.where(i == 0, zero, top_ref[...])
    bot = jnp.where(i == ni - 1, zero, bot_ref[...])
    for lvl, k in enumerate(ks):
        strip = jnp.concatenate(
            [top[lvl], mid_ref[lvl], bot[lvl]], axis=0
        )  # (3*THV, W)
        height = strip.shape[0]
        r = (len(k) - 1) // 2
        acc = strip * float(k[r])
        for t in range(len(k)):
            if t == r:
                continue
            acc = acc + float(k[t]) * pltpu.roll(strip, (r - t) % height, axis=0)
        out_ref[lvl, :, :] = acc[_THV : 2 * _THV, :]


def pallas_blur_levels(
    base: Array, kernels: list, interpret: bool = False
) -> Array:
    """(H, W) f32 -> (L, H, W): level l = zero-padded 'SAME' separable
    correlation of ``base`` with ``kernels[l]`` (odd-length 1-D numpy)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = base.shape
    L = len(kernels)
    ks = [np.asarray(k, np.float32) for k in kernels]
    radius = max((len(k) - 1) // 2 for k in ks)
    if W % _TW or H % _THV or radius > _THV or radius > _TW:
        raise ValueError(
            f"pallas blur needs W%{_TW}==0, H%{_THV}==0, radius<={_THV}; "
            f"got {H}x{W} radius {radius}"
        )
    # bigger blocks amortise per-grid-step overhead (measured 3.3 -> 1.8 ms
    # on the 2x octave H-pass going 8x128 -> 64x512 blocks)
    TH = next(t for t in (64, 32, 16, 8) if H % t == 0)
    TW = next(t for t in (512, 256, 128) if W % t == 0)
    nb_h, nb_w = H // TH, W // TW

    def hspec(shift):
        return pl.BlockSpec(
            (TH, TW),
            lambda i, j: (i, jnp.clip(j + shift, 0, nb_w - 1)),
            memory_space=pltpu.VMEM,
        )

    hk = functools.partial(_hpass_kernel, ks=ks, radius=radius)
    mid = pl.pallas_call(
        hk,
        grid=(nb_h, nb_w),
        in_specs=[hspec(-1), hspec(0), hspec(+1)],
        out_specs=pl.BlockSpec(
            (L, TH, TW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, H, W), base.dtype),
        interpret=interpret,
    )(base, base, base)

    nv = H // _THV

    def vspec(shift):
        return pl.BlockSpec(
            (L, _THV, W),
            lambda i: (0, jnp.clip(i + shift, 0, nv - 1), 0),
            memory_space=pltpu.VMEM,
        )

    vk = functools.partial(_vpass_kernel, ks=ks, radius=radius)
    return pl.pallas_call(
        vk,
        grid=(nv,),
        in_specs=[vspec(-1), vspec(0), vspec(+1)],
        out_specs=pl.BlockSpec(
            (L, _THV, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, H, W), base.dtype),
        interpret=interpret,
    )(mid, mid, mid)
