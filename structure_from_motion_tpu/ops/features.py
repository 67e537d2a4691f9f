"""On-device feature detection + description ("SIFT-lite" on TPU).

Replaces the reference's OpenCV frontend (``view_processor.py:103-202``:
``cv.SIFT_create`` / ORB ``detectAndCompute``) with a fully batched JAX
implementation that runs on the TPU:

* Gaussian scale-space pyramid — separable convolutions (XLA convs),
  ``num_octaves`` octaves x (``scales_per_octave`` + 3) levels.
* Difference-of-Gaussians extrema: 3x3x3 neighbourhood max/min via
  ``reduce_window``, contrast threshold, and the 2x2 Hessian edge-response
  test (Lowe's r = 10 criterion).
* Fixed-capacity selection: per octave, ``top_k`` candidates by |DoG|
  response; octaves merged by one final global ``top_k`` — the static-shape
  substitute for OpenCV's dynamic keypoint vectors.
* 2D quadratic subpixel refinement from the DoG spatial derivatives.
* Dominant gradient orientation from a 36-bin Gaussian-weighted histogram
  (one-hot matmul — no scatter).
* 128-d descriptor: 4x4 spatial cells x 8 orientation bins over a rotated,
  scale-adaptive 16x16 sample grid with bilinear gradient sampling and soft
  orientation binning; L2-normalise -> clip 0.2 -> renormalise (SIFT's
  illumination normalisation).

The output is NOT bitwise cv2-SIFT; it is a same-shape (xy, scale, angle,
response, 128-d descriptor) frontend whose matches feed the identical
geometry stack. Tests measure repeatability/match quality against the cv2
oracle rather than equality.

Every intermediate keeps static shapes; keypoint buffers are
(max_keypoints,) with validity masks.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from structure_from_motion_tpu.config import FrontendConfig


class Keypoints(NamedTuple):
    xy: Array  # (K, 2) float32, (x, y) in full-resolution pixels
    scale: Array  # (K,) float32 sigma in full-resolution pixels
    angle: Array  # (K,) float32 orientation, radians
    response: Array  # (K,) float32 |DoG|
    mask: Array  # (K,) bool


def _gaussian_kernel1d(sigma: float) -> np.ndarray:
    # static (trace-time) numpy: the kernel feeds banded-matrix constants
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / np.sum(k)).astype(np.float32)


def _pallas_blur_ok(impl: str, shape: tuple, ks: list) -> bool:
    """Route eligible blurs to the Pallas VPU stencil
    (ops/blur_pallas.py): exact f32 at streaming bandwidth where the
    banded MXU matmul pays 3 bf16 passes (~8 ms of the 2x-octave
    pyramid). ``impl="pallas"`` forces it (interpret off-TPU, for tests);
    ``"matmul"`` auto-enables on TPU for 128-lane / 16-row multiples with
    radius <= 16 (the largest octaves — smaller ones keep the matmul)."""
    if impl not in ("pallas", "matmul"):
        return False
    if impl != "pallas" and jax.default_backend() != "tpu":
        return False
    h, w = shape
    radius = max((len(k) - 1) // 2 for k in ks)
    # largest-octave only (>= 1280x960): each pallas_call is its own
    # Mosaic module through the remote compile helper, and kernelising
    # every octave took the fused frame program's compile from ~130 s to
    # ~365 s for ~1 ms of extra runtime — the first octave is ~75% of the
    # pyramid's pixels and keeps the compile overhead to one kernel pair
    big = h * w >= 1280 * 960
    return (big or impl == "pallas") and w % 128 == 0 and h % 16 == 0 and radius <= 16


def _use_mxu_blur(impl: str = "matmul") -> bool:
    # single-input-channel convolutions lower to the VPU on TPU (measured:
    # the whole 4-octave pyramid was 43 ms of a 154 ms detect); banded
    # matmuls ride the MXU instead. On CPU the dense band matrices are
    # pure overhead — keep the conv path there. ``impl`` comes from
    # FrontendConfig.blur_impl ("matmul" | "conv").
    # "mxu" = banded matmul with the pallas stencil explicitly disabled
    return impl in ("matmul", "mxu") and jax.default_backend() != "cpu"


def _band(k: np.ndarray, n: int) -> jnp.ndarray:
    """Dense (n, n) banded matrix B with B[i, j] = k[j - i + r] (zero pad):
    (img @ B.T) == 1-D 'SAME' zero-padded correlation along that axis.

    Built ON DEVICE from iota + the (2r+1,) kernel: materialising the
    matrix as a trace-time numpy literal embeds O(n^2) constants in the
    HLO, which blows the remote-compile request past its size limit for
    the 2x-upsampled first octave (5 x 2560^2 floats per direction)."""
    r = (len(k) - 1) // 2
    d = jnp.arange(n, dtype=jnp.int32)[None, :] - jnp.arange(
        n, dtype=jnp.int32
    )[:, None] + r  # B[i, j] -> kernel tap index
    inb = (d >= 0) & (d <= 2 * r)
    kd = jnp.asarray(np.asarray(k, np.float32))
    return jnp.where(inb, kd[jnp.clip(d, 0, 2 * r)], 0.0)


def _blur(
    img: Array, sigma: float, impl: str = "matmul", precision: str = "high"
) -> Array:
    """Separable Gaussian blur of a (H, W) image.

    TPU: two banded matmuls (Bv @ img @ Bh^T) so the smoothing runs on the
    MXU at bf16x3 precision (Precision.HIGH: 1.5e-5 max error vs an f64
    oracle on unit-range images — 1000x below the DoG contrast threshold.
    HIGHEST is the SIX-pass emulation and costs 13x the wall time for
    1.3e-7, measured at 2560x1920); CPU: two 1-D convs."""
    k = _gaussian_kernel1d(sigma)
    if _pallas_blur_ok(impl, img.shape, [k]):
        from structure_from_motion_tpu.ops.blur_pallas import pallas_blur_levels

        return pallas_blur_levels(
            img, [k], interpret=jax.default_backend() != "tpu"
        )[0]
    if _use_mxu_blur(impl):
        h, w = img.shape
        Bh = _band(k, w)
        Bv = _band(k, h)
        prec = (
            jax.lax.Precision.DEFAULT
            if precision == "fast"
            else jax.lax.Precision.HIGH
        )
        hi = jnp.dot(img, Bh.T, precision=prec)
        return jnp.dot(Bv, hi, precision=prec)
    r = (k.shape[0] - 1) // 2
    x = img[None, None, :, :]
    kh = k.reshape(1, 1, 1, -1)
    kv = k.reshape(1, 1, -1, 1)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(0, 0), (r, r)])
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), [(r, r), (0, 0)])
    return x[0, 0]


def _blur_levels(
    base: Array, rel_sigmas: list, impl: str = "matmul", precision: str = "high"
) -> Array:
    """All pyramid levels of one octave in TWO grouped convolutions.

    ``base`` (H, W) is level 0; level i = gaussian(base, rel_sigmas[i-1])
    (Gaussian semigroup: blurring the base by sqrt(sig_i^2 - sig_0^2)
    equals the incremental-blur chain). Kernels are zero-padded to a shared
    width so one (L-1)-channel separable conv pair replaces 2(L-1)
    single-channel convs — single-channel (1,1,H,W) convolutions lower
    poorly on TPU (measured: the blur chain was ~60 ms of a 119 ms detect).
    """
    ks = [_gaussian_kernel1d(s) for s in rel_sigmas]
    if _pallas_blur_ok(impl, base.shape, ks):
        from structure_from_motion_tpu.ops.blur_pallas import pallas_blur_levels

        out = pallas_blur_levels(
            base, ks, interpret=jax.default_backend() != "tpu"
        )
        return jnp.concatenate([base[None], out], axis=0)
    if _use_mxu_blur(impl):
        h, w = base.shape
        Bh = jnp.stack([_band(k, w) for k in ks])  # (L, W, W)
        Bv = jnp.stack([_band(k, h) for k in ks])  # (L, H, H)
        prec = (
            jax.lax.Precision.DEFAULT
            if precision == "fast"
            else jax.lax.Precision.HIGH
        )
        hi = jnp.einsum("hw,lvw->lhv", base, Bh, precision=prec)
        out = jnp.einsum("lgh,lhv->lgv", Bv, hi, precision=prec)
        return jnp.concatenate([base[None], out], axis=0)
    radius = max((k.shape[0] - 1) // 2 for k in ks)
    width = 2 * radius + 1
    ks = [
        jnp.pad(k, ((width - k.shape[0]) // 2,) * 2) for k in ks
    ]
    L = len(ks)
    kh = jnp.stack(ks).reshape(L, 1, 1, width)
    kv = jnp.stack(ks).reshape(L, 1, width, 1)
    x = base[None, None, :, :]  # (1, 1, H, W)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(0, 0), (radius, radius)]
    )  # (1, L, H, W)
    x = jax.lax.conv_general_dilated(
        x, kv, (1, 1), [(radius, radius), (0, 0)], feature_group_count=L
    )
    return jnp.concatenate([base[None], x[0]], axis=0)  # (L+1, H, W)


def _downsample2(img: Array, impl: str = "matmul") -> Array:
    """2x subsample (every other pixel — cv2-SIFT's octave step).

    On TPU a stride-2 slice is a cross-lane relayout and costs ~14 ms at
    2560x1920 (measured) — by far the most expensive "free" op in the
    pyramid; the same selection as two 0/1 matmuls runs on the MXU in
    ~1.5 ms. Selection matrices are exact (rows are one-hot, so each
    output is a single product v * 1.0 — exact at bf16x3/HIGH). CPU keeps
    the plain slice."""
    H, W = img.shape
    if not _use_mxu_blur(impl) or H % 2 or W % 2:
        # odd dims: the slice keeps (H+1)//2 rows — matmul selection would
        # change the output shape, so keep the slice for shape parity
        return img[::2, ::2]
    sel_v = jnp.zeros((H // 2, H), img.dtype).at[
        jnp.arange(H // 2), jnp.arange(0, H, 2)
    ].set(1.0)
    sel_h = jnp.zeros((W, W // 2), img.dtype).at[
        jnp.arange(0, W, 2), jnp.arange(W // 2)
    ].set(1.0)
    hi = jnp.dot(img, sel_h, precision=jax.lax.Precision.HIGH)
    return jnp.dot(sel_v, hi, precision=jax.lax.Precision.HIGH)


def _sep_window(x: Array, init, op):
    # separable 3x3x3 window reduction: three 1-D passes. XLA lowers the
    # direct (3,3,3) reduce_window to 27 taps per element — measured 43.9
    # ms on a (5, 1920, 2560) stack vs 3.2 ms for the separable chain
    # (max/min are separable over box windows, identical result)
    for dims in ((1, 1, 3), (1, 3, 1), (3, 1, 1)):
        x = jax.lax.reduce_window(x, init, op, dims, (1, 1, 1), "SAME")
    return x


def _local_extrema(dog: Array, dtype: str = "f32") -> Array:
    """(S+2, H, W) DoG stack -> bool map of 3x3x3 extrema for layers 1..S.

    ``dtype="bf16"`` (FrontendConfig.extrema_dtype) runs the six separable
    reduce_window passes on a bfloat16 copy — the pass is pure HBM
    bandwidth (measured 6.8 ms of the 29 ms accuracy-config detect at
    (5, 1920, 2560) f32), and the extremum test compares the SAME
    truncated copy against its own window max/min, so truncation only
    reorders near-exact ties — which the contrast threshold (~30x the bf16
    resolution at threshold magnitude) filters anyway."""
    dogc = dog.astype(jnp.bfloat16) if dtype == "bf16" else dog
    neigh_max = _sep_window(dogc, -jnp.inf, jax.lax.max)
    neigh_min = _sep_window(dogc, jnp.inf, jax.lax.min)
    # a strict extremum equals the window max (or min); ties suppressed by
    # requiring it also exceed the second value is skipped — DoG ties are
    # measure-zero on real images
    is_max = dogc >= neigh_max
    is_min = dogc <= neigh_min
    return jnp.logical_or(is_max, is_min)[1:-1]


def _edge_response_ok(layer: Array, edge_threshold: float) -> Array:
    """Lowe's 2x2 Hessian test: tr^2/det < (r+1)^2/r (H, W) -> bool."""
    dxx = (
        jnp.roll(layer, -1, axis=1) - 2.0 * layer + jnp.roll(layer, 1, axis=1)
    )
    dyy = (
        jnp.roll(layer, -1, axis=0) - 2.0 * layer + jnp.roll(layer, 1, axis=0)
    )
    dxy = 0.25 * (
        jnp.roll(jnp.roll(layer, -1, 0), -1, 1)
        - jnp.roll(jnp.roll(layer, -1, 0), 1, 1)
        - jnp.roll(jnp.roll(layer, 1, 0), -1, 1)
        + jnp.roll(jnp.roll(layer, 1, 0), 1, 1)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_threshold
    return jnp.logical_and(det > 0, tr * tr * r < (r + 1.0) ** 2 * det)


def _subpixel_offset_3d(
    flat: Array,
    obase: Array,
    h: Array,
    w: Array,
    hw: Array,
    s_layers: int,
    s_idx: Array,
    yy: Array,
    xx: Array,
) -> tuple[Array, Array, Array, Array, Array, Array]:
    """Full 3-D (x, y, scale) quadratic refinement at selected candidates.

    Lowe's interpolation (the part the cv2-SIFT oracle has and a 2-D-only
    fit lacks): gather the 3x3x3 DoG neighbourhood of each candidate, build
    the gradient and FULL Hessian (including the dxy/dxs/dys cross terms),
    and take one Newton step ``delta = -H^-1 g``. The scale offset feeds the
    orientation/descriptor support radius, which is where most of the
    match-precision win comes from. Offsets are clipped to +-0.5 (candidates
    further off-centre than half a cell belong to a neighbouring extremum);
    a degenerate Hessian falls back to a zero offset.

    Lowe iterates: when a component of the Newton step exceeds 0.5 the true
    extremum belongs to a neighbouring sample, so the integer position is
    relocated and the fit repeated (two relocation rounds here, then a final
    fit whose offsets are clipped to +-0.5). ``dog``: (S+2, H, W); ``s_idx``
    in [0, S) indexes layer ``1 + s_idx`` (always has both scale
    neighbours); ``yy``/``xx`` are >= ``border`` from the image edge by
    construction.

    Runs ONCE on the global top-k winners over a FLAT concatenation of
    every octave's DoG stack (``flat``, with per-keypoint octave row offset
    ``obase`` and dims ``h``/``w``/``hw``): refining the 4x larger
    per-octave candidate sets before the merge did identical work on
    losers, and the 27 neighbourhood taps of each fit are ONE (n, 27)
    gather — 27 separate 1024-row gathers are dispatch-latency bound
    (~0.2 ms each, ~58 ms of the whole detect stage measured).

    Returns (dx, dy, ds, moved_x, moved_y, moved_s): fractional offsets
    relative to the (possibly relocated) integer position plus the integer
    relocation itself.
    """
    border = 2  # relocation only needs derivative support, not descriptor's
    import numpy as _np

    # static (3, 27) multipliers; per-keypoint flat offsets are
    # ds*hw_k + dy*w_k + dx (octave dims vary per keypoint)
    trip = _np.array(
        [
            (ds, dy, dx)
            for ds in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ],
        _np.int32,
    ).T
    dss = jnp.asarray(trip[0])[None, :]
    dys = jnp.asarray(trip[1])[None, :]
    dxs = jnp.asarray(trip[2])[None, :]
    offs = dss * hw[:, None] + dys * w[:, None] + dxs  # (n, 27)

    def fit(s_i, y_i, x_i):
        base = obase + (1 + s_i) * hw + y_i * w + x_i
        vals = flat[base[:, None] + offs]  # (n, 27)

        def tap(ds, dy, dx):
            return vals[:, (ds + 1) * 9 + (dy + 1) * 3 + (dx + 1)]

        c = tap(0, 0, 0)
        gx = 0.5 * (tap(0, 0, 1) - tap(0, 0, -1))
        gy = 0.5 * (tap(0, 1, 0) - tap(0, -1, 0))
        gs = 0.5 * (tap(1, 0, 0) - tap(-1, 0, 0))
        hxx = tap(0, 0, 1) - 2 * c + tap(0, 0, -1)
        hyy = tap(0, 1, 0) - 2 * c + tap(0, -1, 0)
        hss = tap(1, 0, 0) - 2 * c + tap(-1, 0, 0)
        hxy = 0.25 * (tap(0, 1, 1) - tap(0, 1, -1) - tap(0, -1, 1) + tap(0, -1, -1))
        hxs = 0.25 * (tap(1, 0, 1) - tap(1, 0, -1) - tap(-1, 0, 1) + tap(-1, 0, -1))
        hys = 0.25 * (tap(1, 1, 0) - tap(1, -1, 0) - tap(-1, 1, 0) + tap(-1, -1, 0))

        g = jnp.stack([gx, gy, gs], axis=-1)  # (n, 3)
        H = jnp.stack(
            [
                jnp.stack([hxx, hxy, hxs], axis=-1),
                jnp.stack([hxy, hyy, hys], axis=-1),
                jnp.stack([hxs, hys, hss], axis=-1),
            ],
            axis=-2,
        )  # (n, 3, 3)
        # closed-form adjugate inverse: jnp.linalg.solve on (n, 3, 3) is a
        # batched LU that lowers poorly on TPU (small-matrix linalg is
        # loop-bound); the elementwise cofactor inverse is pure VPU math.
        # Tiny Tikhonov keeps flat neighbourhoods finite; non-finite
        # results fall back to zero offset.
        from structure_from_motion_tpu.ops.linalg import inv3x3

        eye = jnp.eye(3, dtype=flat.dtype) * 1e-12
        delta = -jnp.einsum("nij,nj->ni", inv3x3(H + eye), g)
        return jnp.where(jnp.isfinite(delta), delta, 0.0)

    s_i, y_i, x_i = s_idx, yy, xx
    for _ in range(2):  # relocation rounds
        delta = fit(s_i, y_i, x_i)
        move = jnp.round(jnp.clip(delta, -1.0, 1.0)).astype(jnp.int32)
        x_i = jnp.clip(x_i + move[..., 0], border, w - 1 - border)
        y_i = jnp.clip(y_i + move[..., 1], border, h - 1 - border)
        s_i = jnp.clip(s_i + move[..., 2], 0, s_layers - 1)
    delta = jnp.clip(fit(s_i, y_i, x_i), -0.5, 0.5)
    return (
        delta[..., 0],
        delta[..., 1],
        delta[..., 2],
        x_i - xx,
        y_i - yy,
        s_i - s_idx,
    )


def _bilinear_sample(img: Array, x: Array, y: Array) -> Array:
    """Bilinear sample of (H, W) image at float coords; zero outside."""
    h, w = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yy, xx):
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        v = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(inb, v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _top_k_responses(resp: Array, k: int, cfg: FrontendConfig):
    """Per-octave candidate selection over a flattened response map.

    ``lax.top_k`` fully sorts the multi-million-entry map and is the
    default (``cfg.topk="exact"``); ``"approx"`` opts into
    ``approx_max_k`` (~6 ms faster per octave on TPU but quality-lossy —
    see below), any other value falls through to exact.
    """
    mode = cfg.topk
    if mode == "approx":
        # opt-in: the PartialReduce bins by INDEX, i.e. spatially — two
        # strong keypoints colliding in one bin lose one (measured -14%
        # tracked map points on upenn at recall 0.95, still quality-lossy
        # at 0.98), so this stays off the default path
        return jax.lax.approx_max_k(resp, k, recall_target=0.98)
    return jax.lax.top_k(resp, k)


def _octave_candidates(gauss: Array, cfg: FrontendConfig, per_octave_k: int):
    """One octave: (S+3, H, W) gaussian stack -> fixed-size candidate set.

    Returns (dog, xx, yy, scale_idx, response, valid): INTEGER candidate
    positions (the 3-D subpixel fit runs once, after the cross-octave
    merge, on the global winners only — it is gather-bound and refining
    per-octave losers was measured dead work) plus the octave's DoG stack
    for that later fit.
    """
    dog = gauss[1:] - gauss[:-1]  # (S+2, H, W)
    s_layers = dog.shape[0] - 2
    h, w = dog.shape[1], dog.shape[2]

    border = 8
    use_pallas = (
        cfg.extrema_impl != "xla"
        and w % 128 == 0
        and h % 8 == 0
        and (cfg.extrema_impl == "pallas" or jax.default_backend() == "tpu")
    )
    if use_pallas:
        # one fused pass: extrema + contrast + edge + border -> masked |dog|
        from structure_from_motion_tpu.ops.features_pallas import (
            pallas_candidate_response,
        )

        resp3 = pallas_candidate_response(
            dog,
            cfg.contrast_threshold,
            cfg.edge_threshold,
            border=border,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        extrema = _local_extrema(dog, cfg.extrema_dtype)  # (S, H, W)
        contrast_ok = jnp.abs(dog[1:-1]) > cfg.contrast_threshold
        edge_ok = jnp.stack(
            [
                _edge_response_ok(dog[1 + s], cfg.edge_threshold)
                for s in range(s_layers)
            ]
        )
        # keep away from borders (descriptor support)
        bm = (
            jnp.zeros((h, w), dtype=bool)
            .at[border:-border, border:-border]
            .set(True)
        )
        valid = extrema & contrast_ok & edge_ok & bm[None]
        resp3 = jnp.where(valid, jnp.abs(dog[1:-1]), 0.0)  # (S, h, w)
    B = cfg.topk_block
    if B > 1 and h % B == 0 and w % B == 0:
        # block-local max first: the strongest candidate per (layer, BxB
        # block), so the top-k sorts ~B^2x fewer entries (the full-map sort
        # dominated detect: 7.3 ms at 1280x960, 42.9 ms on the 2x first
        # octave). Two single-axis reductions — a (..., B, B) transpose
        # would be a cross-lane relayout, reducing one contiguous axis at
        # a time never is.
        hb, wb = h // B, w // B
        r4 = resp3.reshape(s_layers, h, wb, B)
        ax1 = jnp.argmax(r4, axis=3).astype(jnp.int32)  # (S, h, wb)
        mx1 = jnp.max(r4, axis=3)
        r5 = mx1.reshape(s_layers, hb, B, wb)
        ax2 = jnp.argmax(r5, axis=2).astype(jnp.int32)  # (S, hb, wb)
        mx2 = jnp.max(r5, axis=2)
        cand = mx2.reshape(-1)
        k = min(per_octave_k, cand.shape[0])
        top_resp, ci = _top_k_responses(cand, k, cfg)
        s_idx = ci // (hb * wb)
        remb = ci % (hb * wb)
        yb, xb = remb // wb, remb % wb
        yy = yb * B + ax2[s_idx, yb, xb]
        xx = xb * B + ax1[s_idx, yy, xb]
    else:
        resp = resp3.reshape(-1)
        k = min(per_octave_k, resp.shape[0])
        top_resp, top_idx = _top_k_responses(resp, k, cfg)
        s_idx = top_idx // (h * w)
        rem = top_idx % (h * w)
        yy = rem // w
        xx = rem % w
    ok = top_resp > 0.0
    if k < per_octave_k:
        pad = per_octave_k - k
        xx = jnp.pad(xx, (0, pad))
        yy = jnp.pad(yy, (0, pad))
        s_idx = jnp.pad(s_idx, (0, pad))
        top_resp = jnp.pad(top_resp, (0, pad))
        ok = jnp.pad(ok, (0, pad))
    return dog, xx, yy, s_idx, top_resp, ok


def _bilinear_sample_flat(
    flat: Array, base: Array, s: Array, x: Array, y: Array, h: Array,
    w: Array, hw: Array,
) -> Array:
    """Bilinear sample of a FLAT concatenated pyramid.

    ``flat``: concatenation of every octave's (S+3, H_o, W_o) stack along a
    flattened leading axis (no zero padding — a padded (O, S+3, H0, W0)
    pyramid costs 4x the memory and OOMs under vmap at batch 8 on a 16 GB
    chip). May carry a trailing channel axis (rows of C values share one
    gather row — pyramid gathers are row-latency-bound on TPU, so pairing
    gx/gy into C=2 rows halves the gather cost). Per keypoint: ``base`` =
    flat row offset of its octave, ``s`` level index, ``h``/``w``/``hw``
    its octave dims. One gather per tap; zero outside the octave image.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    start = (base + s * hw)[:, None]  # (K, 1)
    chan = flat.ndim == 2

    def tap(yy, xx):
        inb = (yy >= 0) & (yy < h[:, None]) & (xx >= 0) & (xx < w[:, None])
        idx = start + jnp.clip(yy, 0, h[:, None] - 1) * w[:, None] + jnp.clip(
            xx, 0, w[:, None] - 1
        )
        if chan:
            return jnp.where(inb[..., None], flat[idx], 0.0)
        return jnp.where(inb, flat[idx], 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx
    if chan:
        w00, w01, w10, w11 = (
            w00[..., None], w01[..., None], w10[..., None], w11[..., None]
        )
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


class _FlatPyramid(NamedTuple):
    """Per-octave gaussian stacks flattened into one gradient buffer so
    every read over selected keypoints is a single gather — the per-level
    masked gather loop this replaces dominated the whole detect stage
    (measured ~7x on TPU at 1024 keypoints). gx/gy are PACKED into wider
    rows: pyramid gathers are row-latency-bound on this chip (~70k rows/ms
    regardless of row width), so one wide gather costs half of two narrow
    ones. Two layouts (``FrontendConfig.grad_pack``):

    * ``"pair"`` (rows, 4): row i = (gx, gy) of pixels i and i+1 — both
      x-taps of a bilinear sample in one row; 2 gathers per sample set.
    * ``"quad"`` (rows, 8): row i = (gx, gy) of the full 2x2 quad
      (i, i+1, i+w, i+w+1) — ALL FOUR taps in one row; 1 gather per
      sample set, half the rows of "pair" for 2x the bytes (gathers are
      row-latency-bound, so rows are the price that matters)."""

    g4: Array  # (total_rows, 4|8) packed (gx, gy) taps (see docstring)
    base: Array  # (n,) flat row offset of each keypoint's octave
    h: Array  # (n,) octave image height
    w: Array  # (n,) octave image width
    hw: Array  # (n,) h * w


def _flat_gradients(
    gauss_octs: list, pack: str = "pair", dtype: str = "f32"
) -> Array:
    """Packed (gx, gy) of every octave stack — the keypoint-independent
    part of :func:`_flat_pyramid`, built ONCE per frame even when keypoint
    selections change downstream (the orientation pass and the
    post-duplication descriptor pass select different octave rows;
    rebuilding the whole-pyramid gradient buffer for each was the single
    biggest slice of the detect stage).

    One-sided differences at the image edges (jnp.gradient), NOT
    jnp.roll: rolled central differences wrap around and difference
    pixels from the OPPOSITE edge — orientation/descriptor supports of
    border-8 keypoints reach rows/cols 0 and H-1/W-1, where a
    cross-image gradient corrupts the dominant orientation.

    ``pack="pair"`` (rows, 4): row i = (gx_i, gy_i, gx_{i+1}, gy_{i+1}) —
    both x-taps of a bilinear sample live in ONE row, so sampling needs 2
    gathers (the two y-taps) instead of 4. ``pack="quad"`` (rows, 8)
    additionally packs the NEXT IMAGE ROW's pair (pixels i+w, i+w+1), so
    all four taps of a bilinear sample live in one row and sampling is ONE
    gather. Pyramid gathers are row-latency bound on TPU (~70-80k rows/ms
    regardless of row width; traced at ~3.3 ms per 262k-row gather, the
    dominant detect slice), so each halving of the row count buys more
    than the 2x buffer bytes it costs. Quad rows are built per octave with
    zero padding at each level's bottom/right edge — those slots are never
    selected (the sampler clips gather coords to (h-2, w-2) and masks taps
    outside the image), so their value is irrelevant.

    ``dtype`` (FrontendConfig.grad_dtype): the BUILD is HBM-bandwidth-bound
    (it streams the whole pyramid several times) while the downstream
    gathers are row-latency-bound — storing bfloat16 halves the build
    traffic for a ~0.4% relative gradient error that the 36-bin orientation
    histogram and the normalised/clipped descriptor cannot see (quality
    medians unchanged on the upenn gates; samplers upcast to f32 after the
    gather)."""
    dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    if pack == "chunk64":
        # plain per-pixel (gx, gy) rows reshaped into 64-pixel chunks:
        # (N/64, 64, 2). Serves the axis-aligned shared sample grid
        # (``_bilinear_sample_chunked``), whose per-grid-row samples span
        # <= 60 contiguous pixels of one image row — 4 chunk-gathers per
        # (keypoint, grid row) replace ~2 G single-row gathers, and the
        # build streams half the bytes of the quad pack (4 B/pixel vs 16).
        outs = []
        for g in gauss_octs:
            g = g.astype(dt)
            outs.append(
                jnp.stack(
                    [
                        jnp.gradient(g, axis=2).reshape(-1),
                        jnp.gradient(g, axis=1).reshape(-1),
                    ],
                    axis=-1,
                )
            )
        g2 = jnp.concatenate(outs)
        pad = (-g2.shape[0]) % 64 + 64  # spare tail chunk for c0 + 1
        g2 = jnp.concatenate([g2, jnp.zeros((pad, 2), g2.dtype)])
        # 64-px chunks at 64-px stride; the sampler gathers rows c0 and
        # c0+1 per (keypoint, grid row, y-tap). An overlapping 128-px-row
        # variant (one gather) was measured SLOWER (13.4 vs 7.3 ms tail):
        # the TPU gather is row-transaction bound only up to ~256 B rows.
        return g2.reshape(-1, 64, 2)
    if pack == "quad":
        outs = []
        for g in gauss_octs:  # (L, H, W)
            # difference in the STORAGE dtype: with bf16 the whole build
            # (gradient, stack, shifted pads, concat) streams half the
            # bytes — the input truncation adds the same ~0.4% relative
            # error the output rounding already carried, and the build is
            # the pixel-count-bound part of the detect tail (9.6 ms of the
            # 29 ms accuracy config before this)
            g = g.astype(dt)
            g2 = jnp.stack(
                [jnp.gradient(g, axis=2), jnp.gradient(g, axis=1)], axis=-1
            )  # (L, H, W, 2)
            zc = ((0, 0), (0, 0), (0, 1), (0, 0))
            zr = ((0, 0), (0, 1), (0, 0), (0, 0))
            right = jnp.pad(g2[:, :, 1:], zc)
            down = jnp.pad(g2[:, 1:], zr)
            downright = jnp.pad(g2[:, 1:, 1:], (zr[0], zr[1], zc[2], zc[3]))
            g8 = jnp.concatenate([g2, right, down, downright], axis=-1)
            outs.append(g8.reshape(-1, 8))
        return jnp.concatenate(outs)
    g2 = jnp.concatenate(
        [
            jnp.stack(
                [
                    jnp.gradient(g.astype(dt), axis=2).reshape(-1),
                    jnp.gradient(g.astype(dt), axis=1).reshape(-1),
                ],
                axis=-1,
            )
            for g in gauss_octs
        ]
    )
    nxt = jnp.concatenate([g2[1:], jnp.zeros((1, 2), g2.dtype)])
    return jnp.concatenate([g2, nxt], axis=1)  # (rows, 4)


def _flat_pyramid(
    gauss_octs: list,
    oct_idx: Array,
    g4: Array | None = None,
    pack: str = "pair",
    dtype: str = "f32",
) -> _FlatPyramid:
    import numpy as _np

    if g4 is None:
        g4 = _flat_gradients(gauss_octs, pack, dtype)
    sizes = [g.shape[1] * g.shape[2] for g in gauss_octs]  # H_o * W_o (static)
    bases = _np.cumsum([0] + [g.size for g in gauss_octs])[:-1]
    return _FlatPyramid(
        g4=g4,
        base=jnp.asarray(bases, jnp.int32)[oct_idx],
        h=jnp.asarray([g.shape[1] for g in gauss_octs], jnp.int32)[oct_idx],
        w=jnp.asarray([g.shape[2] for g in gauss_octs], jnp.int32)[oct_idx],
        hw=jnp.asarray(sizes, jnp.int32)[oct_idx],
    )


def _bilinear_sample_quad(
    pyr: _FlatPyramid, s: Array, sx: Array, sy: Array
) -> Array:
    """Bilinear (gx, gy) sampling from the QUAD-packed gradient buffer:
    ONE gather per sample set — row (yg, xg) of ``pyr.g4`` carries all
    four taps of the 2x2 bilinear quad. Gather coords clip to
    (h-2, w-2); which half/row of the packed quad serves each tap is a
    select on (x0 == xg, y0 == yg), and taps outside the image mask to
    zero — same semantics as :func:`_bilinear_sample_flat` (parity-tested
    in test_features.py)."""
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    h = pyr.h[:, None]
    w = pyr.w[:, None]
    start = (pyr.base + s * pyr.hw)[:, None]
    xg = jnp.clip(x0i, 0, w - 2)
    yg = jnp.clip(y0i, 0, h - 2)
    v = pyr.g4[start + yg * w + xg].astype(jnp.float32)  # (n, T, 8)
    q00, q01 = v[..., 0:2], v[..., 2:4]
    q10, q11 = v[..., 4:6], v[..., 6:8]
    selx = (x0i == xg)[..., None]
    sely = (y0i == yg)[..., None]
    # packed rows serving taps y0 (a) and y0+1 (b), each at (xg, xg+1)
    a_lo = jnp.where(sely, q00, q10)
    a_hi = jnp.where(sely, q01, q11)
    b_lo = jnp.where(sely, q10, q00)
    b_hi = jnp.where(sely, q11, q01)
    inx0 = ((x0i >= 0) & (x0i < w))[..., None]
    inx1 = ((x0i + 1 >= 0) & (x0i + 1 < w))[..., None]
    iny0 = ((y0i >= 0) & (y0i < h))[..., None]
    iny1 = ((y0i + 1 >= 0) & (y0i + 1 < h))[..., None]
    v00 = jnp.where(selx, a_lo, a_hi) * (inx0 & iny0)
    v01 = jnp.where(selx, a_hi, a_lo) * (inx1 & iny0)
    v10 = jnp.where(selx, b_lo, b_hi) * (inx0 & iny1)
    v11 = jnp.where(selx, b_hi, b_lo) * (inx1 & iny1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _bilinear_sample_paired(
    pyr: _FlatPyramid, s: Array, sx: Array, sy: Array
) -> Array:
    """Bilinear (gx, gy) sampling from the packed flat gradient buffer.

    Dispatches on the pack width: (rows, 8) quad buffers take the
    one-gather path (:func:`_bilinear_sample_quad`); (rows, 4) paired
    buffers use 2 gathers (one per y-tap) instead of 4 — row i of
    ``pyr.g4`` carries both x-taps (pixels i and i+1). Same math and
    zero-outside-image semantics as :func:`_bilinear_sample_flat` on the
    unpaired buffer (parity-tested in test_features.py); pyramid gathers
    are row-latency bound on TPU, so halving the row count halves the
    dominant cost of the orientation/descriptor passes."""
    if pyr.g4.shape[-1] == 8:
        return _bilinear_sample_quad(pyr, s, sx, sy)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    h = pyr.h[:, None]
    w = pyr.w[:, None]
    start = (pyr.base + s * pyr.hw)[:, None]
    # gather column xg = clip(x0, 0, w-2): that row holds valid pixels
    # (xg, xg+1) of the SAME image row; select which half serves each tap
    # (x0 = -1 takes the low half for tap 0; x0 = w-1 takes the high half)
    xg = jnp.clip(x0i, 0, w - 2)

    # ONE gather for both y-taps: each gather op carries ~0.5-0.8 ms fixed
    # cost on top of its ~100k rows/ms stream (traced), so batching the
    # (n, T) index sets into (n, 2T) buys a full op overhead per pass
    T = sx.shape[1]
    yy = jnp.concatenate([y0i, y0i + 1], axis=1)  # (n, 2T)
    iny = (yy >= 0) & (yy < h)
    xg2 = jnp.concatenate([xg, xg], axis=1)
    idx = start + jnp.clip(yy, 0, h - 1) * w + xg2
    v = pyr.g4[idx].astype(jnp.float32)  # (n, 2T, 4)
    lo, hi = v[..., 0:2], v[..., 2:4]
    x0i2 = jnp.concatenate([x0i, x0i], axis=1)
    in0 = (iny & (x0i2 >= 0) & (x0i2 < w))[..., None]
    in1 = (iny & (x0i2 + 1 >= 0) & (x0i2 + 1 < w))[..., None]
    sel = (x0i2 == xg2)[..., None]
    v0 = jnp.where(sel, lo, hi) * in0
    v1 = jnp.where(sel, hi, lo) * in1
    v00, v10 = v0[:, :T], v0[:, T:]
    v01, v11 = v1[:, :T], v1[:, T:]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _hist_peaks(mag_w: Array, ang: Array) -> tuple[Array, Array, Array]:
    """36-bin weighted orientation histogram -> (angle1, angle2, has2):
    the two best circularly-separated local maxima, parabola-refined, with
    ``has2`` = secondary clears 0.8x the primary (Lowe's multi-peak rule).
    Shared by the rotated-grid and shared-sample orientation paths."""
    hist_bins = 36
    b = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * hist_bins).astype(jnp.int32) % hist_bins
    onehot = jax.nn.one_hot(b, hist_bins, dtype=jnp.float32)  # (n, K, 36)
    hist = jnp.einsum("nk,nkb->nb", mag_w, onehot)
    hist = (jnp.roll(hist, 1, axis=1) + hist + jnp.roll(hist, -1, axis=1)) / 3.0

    left = jnp.roll(hist, 1, axis=1)
    right = jnp.roll(hist, -1, axis=1)

    def peak_angle(p):
        l = jnp.take_along_axis(left, p[:, None], 1)[:, 0]
        r = jnp.take_along_axis(right, p[:, None], 1)[:, 0]
        v = jnp.take_along_axis(hist, p[:, None], 1)[:, 0]
        denom = l - 2 * v + r
        off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (l - r) / denom, 0.0)
        off = jnp.clip(off, -0.5, 0.5)
        return (
            (p.astype(jnp.float32) + 0.5 + off) / hist_bins * 2 * jnp.pi - jnp.pi
        )

    peak1 = jnp.argmax(hist, axis=1)
    v1 = jnp.max(hist, axis=1)
    # secondary: best circular local maximum that is not (a neighbour of)
    # the primary bin
    is_local_max = (hist >= left) & (hist >= right)
    bins = jnp.arange(hist_bins)[None, :]
    d = jnp.abs(bins - peak1[:, None])
    near1 = jnp.minimum(d, hist_bins - d) <= 1
    cand = jnp.where(is_local_max & ~near1, hist, -1.0)
    peak2 = jnp.argmax(cand, axis=1)
    v2 = jnp.max(cand, axis=1)
    has2 = v2 >= 0.8 * v1
    return peak_angle(peak1), peak_angle(peak2), has2


def _orientation_peaks(
    pyr: _FlatPyramid, s_lvl: Array, x: Array, y: Array, sig: Array
) -> tuple[Array, Array, Array]:
    """Dominant orientations from a 36-bin gradient histogram.

    Lowe keeps EVERY local peak within 80% of the maximum as a separate
    keypoint (~15% of points get a second orientation; dropping them was
    measurably costing cross-view matches). Static shapes cap this at two:
    returns (angle1, angle2, has2) where ``angle2`` is the best secondary
    local maximum and ``has2`` whether it clears 0.8 * peak. Both peak
    positions are refined by parabolic interpolation of the histogram.
    """
    G = 16
    lin = (jnp.arange(G, dtype=jnp.float32) - (G - 1) / 2.0) / ((G - 1) / 2.0)
    gyy, gxx = jnp.meshgrid(lin, lin, indexing="ij")  # [-1, 1]
    rad = 4.5 * sig  # (n,)
    sx = x[:, None] + rad[:, None] * gxx.reshape(-1)[None, :]  # (n, G*G)
    sy = y[:, None] + rad[:, None] * gyy.reshape(-1)[None, :]

    g = _bilinear_sample_paired(pyr, s_lvl, sx, sy)
    gxs, gys = g[..., 0], g[..., 1]
    mag = jnp.sqrt(gxs**2 + gys**2)
    ang = jnp.arctan2(gys, gxs)  # [-pi, pi]
    # Gaussian window sigma = 2.25 sigma_kp (wider than Lowe's 1.5 sigma:
    # with only a 16x16 sample grid the narrow window starves the histogram
    # — measured +0.15 px reprojection on upenn)
    wgt = jnp.exp(
        -(gxx.reshape(-1)[None, :] ** 2 + gyy.reshape(-1)[None, :] ** 2)
        / (2 * 0.5**2)
    )
    return _hist_peaks(mag * wgt, ang)


# bilinear spatial cell weights of the 16x16 descriptor grid: sample row i
# sits at cell coordinate (i + 0.5)/4 - 0.5 and contributes linearly to its
# two nearest cell rows (Lowe's trilinear binning; a hard 4x4 assignment
# makes descriptor entries jump when a gradient crosses a cell border).
# Static (256, 16) matrix, computed once at trace time.
def _spatial_weights(D: int) -> jnp.ndarray:
    import numpy as _np

    pos = (_np.arange(D) + 0.5) / (D / 4) - 0.5  # cell coords
    wrow = _np.maximum(0.0, 1.0 - _np.abs(pos[:, None] - _np.arange(4)[None, :]))
    spatial = _np.einsum("ya,xb->yxab", wrow, wrow).reshape(D * D, 16)
    return jnp.asarray(spatial, jnp.float32)


def _descriptors_for(
    pyr: _FlatPyramid,
    s_lvl: Array,
    x: Array,
    y: Array,
    sig: Array,
    angle: Array,
    valid: Array,
) -> Array:
    """128-d SIFT-style descriptor on a rotated 16x16 grid: 4x4 spatial
    cells (bilinear-weighted) x 8 orientation bins (linear-weighted),
    Gaussian-windowed, L2 -> clip 0.2 -> re-L2 normalised."""
    n = x.shape[0]
    D = 16
    step = 0.75  # sample spacing in units of sigma
    dlin = (jnp.arange(D, dtype=jnp.float32) - (D - 1) / 2.0) * step
    dyy_g, dxx_g = jnp.meshgrid(dlin, dlin, indexing="ij")
    gridx = dxx_g.reshape(-1)[None, :] * sig[:, None]  # (n, 256)
    gridy = dyy_g.reshape(-1)[None, :] * sig[:, None]
    ca, sa = jnp.cos(angle)[:, None], jnp.sin(angle)[:, None]
    rx = x[:, None] + ca * gridx - sa * gridy
    ry = y[:, None] + sa * gridx + ca * gridy
    g = _bilinear_sample_paired(pyr, s_lvl, rx, ry)
    gxd, gyd = g[..., 0], g[..., 1]
    magd = jnp.sqrt(gxd**2 + gyd**2)
    angd = jnp.arctan2(gyd, gxd) - angle[:, None]

    spatial = _spatial_weights(D)  # (256, 16) bilinear cell weights

    ob = (angd + 2 * jnp.pi) % (2 * jnp.pi) / (2 * jnp.pi) * 8.0
    b0 = jnp.floor(ob).astype(jnp.int32) % 8
    frac = ob - jnp.floor(ob)
    w_desc = magd * jnp.exp(
        -(dxx_g.reshape(-1)[None, :] ** 2 + dyy_g.reshape(-1)[None, :] ** 2)
        / (2 * (0.5 * D * step) ** 2)
    )
    oh0 = jax.nn.one_hot(b0, 8, dtype=jnp.float32) * (1 - frac)[..., None]
    oh1 = jax.nn.one_hot((b0 + 1) % 8, 8, dtype=jnp.float32) * frac[..., None]
    orient = oh0 + oh1  # (n, 256, 8)
    desc = jnp.einsum("nkb,kc,nk->ncb", orient, spatial, w_desc)
    desc = desc.reshape(n, 128)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-9)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-9)
    desc = desc * 512.0
    return jnp.where(valid[:, None], desc, 0.0)


def _bilinear_sample_chunked(
    pyr: _FlatPyramid, s: Array, sx: Array, sy: Array, G: int
) -> Array:
    """Bilinear (gx, gy) sampling of an AXIS-ALIGNED G x G grid from the
    64-pixel-chunked plain gradient buffer (``grad_pack="chunk64"``).

    The shared sample grid is unrotated, so all G samples of one grid row
    share a single sy (one y0) and their x positions span <= ~60
    contiguous pixels of one image row — which is at most TWO 64-pixel
    chunks of the flat buffer regardless of alignment (row-crossing chunks
    are harmless: taps are flat-index adjacent, and flat indexing is exact
    everywhere). Gather rows per keypoint: G grid rows x 2 y-taps x 2
    chunks = 4G, vs 2 G^2 single-pixel rows for the generic sampler —
    ~4.5x fewer row transactions on the row-latency-bound pyramid gather
    (measured 10.0 ms -> ~2-3 ms at 1024 keypoints, G=18, 2x octave).
    Zero outside the octave image, f32 output — same semantics as
    :func:`_bilinear_sample_flat` (parity-tested)."""
    n, K = sx.shape
    g2c = pyr.g4  # (Nc, 64, 2)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0).reshape(n, G, G)
    fy = (sy - y0).reshape(n, G, G)
    x0i = x0.astype(jnp.int32).reshape(n, G, G)
    y0l = y0.astype(jnp.int32).reshape(n, G, G)[:, :, 0]  # (n, G): one sy/row
    h = pyr.h[:, None]  # (n, 1)
    w = pyr.w[:, None]
    start = (pyr.base + s * pyr.hw)[:, None]  # (n, 1)

    ys = jnp.stack([y0l, y0l + 1], axis=-1)  # (n, G, 2) the two y-taps
    yin = (ys >= 0) & (ys < h[..., None])
    ycl = jnp.clip(ys, 0, h[..., None] - 1)
    # anchor chunk: flat index of the row's FIRST sample's clipped x0
    xg = jnp.clip(x0i, 0, w[..., None] - 2)  # (n, G, G) monotone per row
    f0 = start[..., None] + ycl * w[..., None] + xg[:, :, :1]  # (n, G, 2)
    c0 = f0 // 64
    # gather both chunks for every (kp, grid row, y-tap): (n, G, 2, 2, 64, 2)
    chunks = g2c[jnp.stack([c0, c0 + 1], axis=-1)]
    strip = chunks.reshape(n, G, 2, 128, 2)

    # In-strip extraction + bilinear combine as ONE fused weighted-one-hot
    # contraction per channel. take_along_axis over the 128-strip axis
    # lowers to a ~20 ms gather at these shapes (measured ~1.4 ms as an
    # iota-compare einsum), and any einsum whose OUTPUT minor dim is the
    # 2-channel axis gets lane-padded 2 -> 128 (hundreds of MB of physical
    # traffic). So: build W[n,g,t,k,c] = bilinear_weight * [c == off] for
    # both x-taps folded together, contract the 128-lane strip axis per
    # channel, and the output (n, G, G) keeps a sane layout end to end.
    def offs(px):  # (n, G, G) pixel x -> strip offsets + validity
        pin = (px >= 0) & (px < w[..., None])
        pcl = jnp.clip(px, 0, w[..., None] - 1)
        f = (
            start[..., None, None]
            + ycl[:, :, :, None] * w[..., None, None]
            + pcl[:, :, None, :]
        )  # (n, G, 2, G)
        off = (f - c0[..., None] * 64).astype(jnp.int32)
        return off, pin[:, :, None, :] & yin[..., None]

    off0, in0 = offs(x0i)
    off1, in1 = offs(x0i + 1)
    lane = jnp.arange(128, dtype=jnp.int32)
    fxt = fx[:, :, None, :]  # (n, G, 1, G) broadcast over y-taps
    fyt = jnp.stack([1.0 - fy[:, :, 0], fy[:, :, 0]], axis=2)[
        :, :, :, None
    ]  # (n, G, 2, 1): weight of y-tap t (fy constant per grid row)
    wt0 = jnp.where(in0, (1.0 - fxt) * fyt, 0.0)
    wt1 = jnp.where(in1, fxt * fyt, 0.0)
    W = (
        wt0[..., None] * (off0[..., None] == lane)
        + wt1[..., None] * (off1[..., None] == lane)
    ).astype(strip.dtype)  # (n, G, 2, G, 128)
    outs = [
        jnp.einsum("ngtkc,ngtc->ngk", W, strip[..., d]).astype(jnp.float32)
        for d in range(2)
    ]
    return jnp.stack(outs, axis=-1).reshape(n, K, 2)


def _sample_shared_grid(
    pyr: _FlatPyramid, s_lvl: Array, x: Array, y: Array, sig: Array,
    G: int, step: float,
):
    """ONE unrotated G x G sample grid (offsets in sigma units) serving
    BOTH the orientation histogram and the descriptor
    (``FrontendConfig.sampling="shared"``).

    This is cv2-SIFT's actual structure: it walks an UNROTATED pixel
    window around the keypoint and rotates each sample's OFFSET into the
    descriptor frame when binning — only our sampling is a fixed
    sigma-scaled grid instead of every pixel. The rotated-grid path
    (``"rotated"``) gathers two separate 256-sample sets per keypoint
    (orientation + per-orientation descriptor); sharing one pass cuts the
    gather rows ~40% and makes second-orientation duplicates gather-FREE
    (their descriptor reuses the same samples under a different angle).
    Pyramid gathers are the dominant detect-tail cost (row-latency-bound,
    11.7 ms of the 31 ms accuracy-config detect)."""
    lin = (np.arange(G, dtype=np.float32) - (G - 1) / 2.0) * step
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    dxs = jnp.asarray(gx.reshape(-1))  # (K,) sigma units
    dys = jnp.asarray(gy.reshape(-1))
    sx = x[:, None] + sig[:, None] * dxs[None, :]
    sy = y[:, None] + sig[:, None] * dys[None, :]
    if pyr.g4.ndim == 3:  # chunk64 layout
        g = _bilinear_sample_chunked(pyr, s_lvl, sx, sy, G)
    else:
        g = _bilinear_sample_paired(pyr, s_lvl, sx, sy)  # (n, K, 2)
    return g, dxs, dys


def _orientation_from_samples(
    g: Array, dxs: Array, dys: Array
) -> tuple[Array, Array, Array]:
    """Orientation peaks from the shared sample grid: same 36-bin
    parabola-refined histogram as :func:`_orientation_peaks`, with the
    2.25-sigma Gaussian window expressed in the grid's sigma units."""
    gxs, gys = g[..., 0], g[..., 1]
    mag = jnp.sqrt(gxs**2 + gys**2)
    ang = jnp.arctan2(gys, gxs)
    wgt = jnp.exp(-(dxs**2 + dys**2)[None, :] / (2 * 2.25**2))
    return _hist_peaks(mag * wgt, ang)


def _descriptors_from_samples(
    g: Array, dxs: Array, dys: Array, angle: Array, valid: Array
) -> Array:
    """128-d descriptor from the shared unrotated samples: each sample's
    sigma-unit offset is rotated INTO the descriptor frame (u, v), its
    4x4 spatial cell weights computed from the rotated coordinates
    (dynamic per keypoint — the rotated-grid path's static (256, 16)
    matrix becomes two (n, K, 4) hat-weight tensors), gradient angles
    shifted by -angle, then the same trilinear binning / Gaussian window /
    L2-clip-L2 normalisation as :func:`_descriptors_for`. Samples whose
    rotated coordinate falls outside the 4x4 cell span get zero spatial
    weight — exactly cv2-SIFT's in-window test."""
    n = g.shape[0]
    gxd, gyd = g[..., 0], g[..., 1]
    magd = jnp.sqrt(gxd**2 + gyd**2)
    angd = jnp.arctan2(gyd, gxd) - angle[:, None]
    ca, sa = jnp.cos(angle)[:, None], jnp.sin(angle)[:, None]
    # descriptor-frame coordinates in CELL units: descriptor sample
    # spacing is 0.75 sigma and a cell spans 4 samples = 3 sigma; the
    # rotated-grid path's cell coordinate for offset d is d/(3 sigma)+1.5
    u = (ca * dxs[None, :] + sa * dys[None, :]) / 3.0 + 1.5
    v = (-sa * dxs[None, :] + ca * dys[None, :]) / 3.0 + 1.5
    cells = jnp.arange(4, dtype=jnp.float32)
    wu = jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - cells))  # (n,K,4)
    wv = jnp.maximum(0.0, 1.0 - jnp.abs(v[..., None] - cells))
    # Gaussian window over the (rotation-invariant) radius, sigma = half
    # the descriptor support (0.5 * 16 * 0.75 sigma) — matches the rotated
    # path's w_desc
    w = magd * jnp.exp(-(dxs**2 + dys**2)[None, :] / (2 * 6.0**2))

    ob = (angd + 2 * jnp.pi) % (2 * jnp.pi) / (2 * jnp.pi) * 8.0
    b0 = jnp.floor(ob).astype(jnp.int32) % 8
    frac = ob - jnp.floor(ob)
    oh0 = jax.nn.one_hot(b0, 8, dtype=jnp.float32) * (1 - frac)[..., None]
    oh1 = jax.nn.one_hot((b0 + 1) % 8, 8, dtype=jnp.float32) * frac[..., None]
    orient = oh0 + oh1  # (n, K, 8)
    desc = jnp.einsum("nkv,nku,nkb,nk->nvub", wv, wu, orient, w)
    desc = desc.reshape(n, 128)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-9)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-9)
    desc = desc * 512.0
    return jnp.where(valid[:, None], desc, 0.0)


# ---------------------------------------------------------------------------
# Harris + rotated-BRIEF: the binary-descriptor family (the reference's "orb"
# detector option, view_processor.py:128-137). Descriptors are +-1 float
# codes so Hamming distance is one MXU matmul: ham = (D - a.b) / 2.
# ---------------------------------------------------------------------------


def _harris_response(img: Array, k: float = 0.04, sigma: float = 1.5, impl: str = "matmul") -> Array:
    """Harris corner response map of a (H, W) image."""
    ix = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    iy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    ixx = _blur(ix * ix, sigma, impl)
    iyy = _blur(iy * iy, sigma, impl)
    ixy = _blur(ix * iy, sigma, impl)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    return det - k * tr * tr


def _octave_harris(img: Array, cfg: FrontendConfig, per_octave_k: int):
    """Harris corners of one octave image: NMS + border mask + top-k.

    Returns (x, y, response, valid), octave pixel coords.
    """
    h, w = img.shape
    resp = _harris_response(img, impl=cfg.blur_impl)
    # 5x5 NMS: a 3x3 window lets corners cluster on strong texture, which
    # starves the rest of the image of the fixed keypoint budget and thins
    # the PnP consensus (measured on upenn) — wider suppression spreads
    # detections spatially
    nms = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (5, 5), (1, 1), "SAME"
    )
    border = 20  # BRIEF patch support
    bm = jnp.zeros((h, w), dtype=bool).at[border:-border, border:-border].set(True)
    # positive response = corner (negative = edge); top-k does the rest —
    # an absolute threshold would be content/scale dependent
    is_peak = (resp >= nms) & (resp > 0.0) & bm
    flat = jnp.where(is_peak, resp, 0.0).reshape(-1)
    k = min(per_octave_k, flat.shape[0])
    top_resp, top_idx = _top_k_responses(flat, k, cfg)
    yy = (top_idx // w).astype(jnp.float32)
    xx = (top_idx % w).astype(jnp.float32)
    ok = top_resp > 0.0
    if k < per_octave_k:
        pad = per_octave_k - k
        xx = jnp.pad(xx, (0, pad))
        yy = jnp.pad(yy, (0, pad))
        top_resp = jnp.pad(top_resp, (0, pad))
        ok = jnp.pad(ok, (0, pad))
    return xx, yy, top_resp, ok


def _intensity_centroid_angle(img: Array, x: Array, y: Array, radius: float = 7.0) -> Array:
    """ORB's orientation: arctan2 of the patch intensity centroid moments."""
    G = 15
    lin = jnp.arange(G, dtype=jnp.float32) - (G - 1) / 2.0
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    # circular mask like ORB's
    circ = ((gx**2 + gy**2) <= ((G - 1) / 2.0) ** 2).astype(jnp.float32)
    sx = x[:, None] + (gx.reshape(-1) * (2 * radius / (G - 1)))[None, :]
    sy = y[:, None] + (gy.reshape(-1) * (2 * radius / (G - 1)))[None, :]
    vals = _bilinear_sample(img, sx, sy) * circ.reshape(-1)[None, :]
    m10 = jnp.sum(vals * gx.reshape(-1)[None, :], axis=1)
    m01 = jnp.sum(vals * gy.reshape(-1)[None, :], axis=1)
    return jnp.arctan2(m01, m10)


def _brief_pattern(n_bits: int, patch: float, seed: int = 7):
    """Static rBRIEF test pattern: ``n_bits`` point pairs ~ N(0, (patch/5)^2),
    clipped to the patch. Computed with numpy at trace time (static consts)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    pts = rng.normal(scale=patch / 5.0, size=(n_bits, 4)).astype(np.float32)
    pts = np.clip(pts, -patch / 2.0, patch / 2.0)
    return jnp.asarray(pts)  # (n_bits, 4) = (px, py, qx, qy)


def _brief_describe(
    img: Array, x: Array, y: Array, angle: Array, valid: Array, n_bits: int,
    patch: float = 31.0,
) -> Array:
    """Steered-BRIEF +-1 codes: bit_i = sign(I(R p_i) - I(R q_i)).

    The steering angle is quantised to 12-degree increments (ORB's 30-
    degree lookup tables, finer): small orientation noise then leaves the
    sampled pattern EXACTLY unchanged instead of flipping borderline bits,
    which measurably tightens cross-view Hamming distances."""
    pat = _brief_pattern(n_bits, patch)
    step = jnp.pi / 15.0
    angle = jnp.round(angle / step) * step
    ca, sa = jnp.cos(angle)[:, None], jnp.sin(angle)[:, None]
    px = ca * pat[None, :, 0] - sa * pat[None, :, 1] + x[:, None]
    py = sa * pat[None, :, 0] + ca * pat[None, :, 1] + y[:, None]
    qx = ca * pat[None, :, 2] - sa * pat[None, :, 3] + x[:, None]
    qy = sa * pat[None, :, 2] + ca * pat[None, :, 3] + y[:, None]
    ip = _bilinear_sample(img, px, py)
    iq = _bilinear_sample(img, qx, qy)
    bits = jnp.where(ip > iq, 1.0, -1.0)
    return jnp.where(valid[:, None], bits, 0.0)


def _detect_harris_brief(img: Array, cfg: FrontendConfig):
    """Harris + steered-BRIEF over a dyadic pyramid; global top-k merge."""
    per_octave_k = cfg.max_keypoints
    all_x, all_y, all_resp, all_ok, all_angle, all_desc = [], [], [], [], [], []
    level = _blur(img, 1.0, cfg.blur_impl)
    for o in range(cfg.num_octaves):
        x, y, resp, ok = _octave_harris(level, cfg, per_octave_k)
        angle = _intensity_centroid_angle(level, x, y)
        # BRIEF compares single samples, so it needs a smoother image than
        # detection does (classic BRIEF: sigma ~2 pre-blur; ORB: 5x5 box) —
        # comparing on the detection level flips bits on pixel noise
        desc_img = _blur(level, 2.0, cfg.blur_impl)
        desc = _brief_describe(desc_img, x, y, angle, ok, cfg.descriptor_dim)
        scale_fr = 2.0**o
        all_x.append(x * scale_fr)
        all_y.append(y * scale_fr)
        all_resp.append(resp)
        all_ok.append(ok)
        all_angle.append(angle)
        all_desc.append(desc)
        level = _blur(_downsample2(level, cfg.blur_impl), 1.0, cfg.blur_impl)

    x = jnp.concatenate(all_x)
    y = jnp.concatenate(all_y)
    resp = jnp.concatenate(all_resp)
    ok = jnp.concatenate(all_ok)
    angle = jnp.concatenate(all_angle)
    desc = jnp.concatenate(all_desc, axis=0)
    score = jnp.where(ok, resp, -1.0)
    top_score, top_idx = jax.lax.top_k(score, cfg.max_keypoints)
    kps = Keypoints(
        xy=jnp.stack([x[top_idx], y[top_idx]], axis=1),
        scale=jnp.ones((cfg.max_keypoints,), jnp.float32),
        angle=angle[top_idx],
        response=resp[top_idx],
        mask=top_score > 0.0,
    )
    return kps, desc[top_idx]


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_and_describe(img: Array, cfg: FrontendConfig):
    """(H, W) float image -> (Keypoints, (max_keypoints, D) descriptors).

    ``cfg.detector`` picks the family — the TPU analogue of the reference's
    detector factory (``view_processor.py:128-137``):

    * ``"dog"``: DoG scale-space extrema + SIFT-like 128-d float descriptor.
    * ``"harris"``: Harris corners + steered-BRIEF +-1 binary codes
      (match with ``MatcherConfig.metric="hamming"``) — the ORB analogue.

    The whole frontend is one jitted program: pyramid, extrema/corners,
    per-octave top-k, orientation, descriptors, global top-k merge.
    """
    if cfg.detector == "harris":
        img = img.astype(jnp.float32)
        img = img / jnp.maximum(jnp.max(img), 1e-6)
        return _detect_harris_brief(img, cfg)
    if cfg.detector != "dog":
        raise ValueError(f"unknown detector {cfg.detector!r}")
    img = img.astype(jnp.float32)
    img = img / jnp.maximum(jnp.max(img), 1e-6)

    S = cfg.scales_per_octave
    n_levels = S + 3
    k_per_level = 2.0 ** (1.0 / S)
    sigmas = [cfg.sigma0 * (k_per_level**i) for i in range(n_levels)]

    # -- phase 1: cheap candidate detection per octave ----------------------
    # (extrema maps + top-k on responses; NO descriptor work yet — the
    # expensive gather-based description runs only for the global winners,
    # a 4x saving at num_octaves=4)
    per_octave_k = cfg.max_keypoints
    H0, W0 = img.shape
    all_x, all_y, all_sidx, all_resp, all_ok = [], [], [], [], []
    gauss_octs, dog_octs = [], []

    # relative sigmas of levels 1..n-1 w.r.t. level 0 (Gaussian semigroup)
    rel_sigmas = [
        math.sqrt(max(sigmas[i] ** 2 - sigmas[0] ** 2, 1e-6))
        for i in range(1, n_levels)
    ]
    if cfg.upsample_first_octave:
        # cv2-SIFT's octave -1: 2x bilinear upsample (the input is assumed
        # to carry sigma = 0.5 of blur, so the doubled image carries 1.0 and
        # the incremental blur to sigma0 is sqrt(sigma0^2 - 1))
        img = jax.image.resize(img, (H0 * 2, W0 * 2), "linear")
        base = _blur(
            img, math.sqrt(max(cfg.sigma0**2 - 1.0, 0.01)), cfg.blur_impl,
            cfg.blur_precision,
        )
    else:
        base = _blur(img, cfg.sigma0, cfg.blur_impl, cfg.blur_precision)
    for o in range(cfg.num_octaves):
        gauss = _blur_levels(
            base, rel_sigmas, cfg.blur_impl, cfg.blur_precision
        )  # (S+3, H_o, W_o)
        gauss_octs.append(gauss)

        dog, x, y, s_idx, resp, ok = _octave_candidates(gauss, cfg, per_octave_k)
        dog_octs.append(dog)
        all_x.append(x)
        all_y.append(y)
        all_sidx.append(s_idx)
        all_resp.append(resp)
        all_ok.append(ok)
        # next octave: downsample the level with sigma = 2 sigma0
        base = _downsample2(gauss[S], cfg.blur_impl)

    xi = jnp.concatenate(all_x)  # octave-local integer coords
    yi = jnp.concatenate(all_y)
    s_idx = jnp.concatenate(all_sidx)
    resp = jnp.concatenate(all_resp)
    ok = jnp.concatenate(all_ok)
    oct_idx = jnp.concatenate(
        [jnp.full((per_octave_k,), o, jnp.int32) for o in range(cfg.num_octaves)]
    )

    # global top-k merge across octaves (on responses only)
    score = jnp.where(ok, resp, -1.0)
    top_score, top_idx = jax.lax.top_k(score, cfg.max_keypoints)
    xi, yi = xi[top_idx], yi[top_idx]
    s_idx, oct_sel = s_idx[top_idx], oct_idx[top_idx]
    resp_sel = resp[top_idx]
    mask = top_score > 0.0

    # 3-D (x, y, sigma) subpixel fit ONCE, for the merged winners only,
    # over a flat concatenation of the per-octave DoG stacks
    import numpy as _np

    dog_flat = jnp.concatenate([d.reshape(-1) for d in dog_octs])
    dsizes = [d.shape[1] * d.shape[2] for d in dog_octs]
    dbases = _np.cumsum([0] + [d.size for d in dog_octs])[:-1]
    ob = jnp.asarray(dbases, jnp.int32)[oct_sel]
    oh = jnp.asarray([d.shape[1] for d in dog_octs], jnp.int32)[oct_sel]
    ow = jnp.asarray([d.shape[2] for d in dog_octs], jnp.int32)[oct_sel]
    ohw = jnp.asarray(dsizes, jnp.int32)[oct_sel]
    ox, oy, soff_sel, mx, my, ms = _subpixel_offset_3d(
        dog_flat, ob, oh, ow, ohw, S, s_idx, yi, xi
    )
    s_idx = s_idx + ms
    x = (xi + mx).astype(jnp.float32) + ox
    y = (yi + my).astype(jnp.float32) + oy

    # interpolated scale: fractional level from the 3-D subpixel fit; the
    # gradient level used for sampling is the nearest integer level. The
    # relocation step can drive s_idx to -1 (an extremum sliding below the
    # stack) — clamp BEFORE the sigma lookup: jnp negative indexing wraps,
    # and sigmas[-1] would silently hand the finest keypoints the COARSEST
    # sigma (an 8x descriptor support). The clamp also caps the static
    # patch size of the sampling kernel below.
    s_idx = jnp.clip(s_idx, 0, n_levels - 1)
    sig = jnp.asarray(sigmas, jnp.float32)[s_idx] * jnp.power(
        jnp.asarray(k_per_level, jnp.float32), soff_sel
    )
    # s_idx <= S-1 and |soff| <= 0.5 bound s_lvl by S; the clip makes that
    # bound structural — the gradient buffer only materialises levels
    # [0, S] (see phase 2a below), and an index past it would silently
    # read the next octave's rows
    s_lvl = jnp.clip(
        jnp.round(s_idx.astype(jnp.float32) + soff_sel).astype(jnp.int32),
        0,
        S,
    )

    # -- phase 2a: orientation peaks for the winners (one histogram pass) ---
    # shared by orientation + descriptors. Levels above S are never sampled
    # (s_lvl = clip(round(s_idx + soff)) with s_idx <= S-1, |soff| <= 0.5),
    # so the gradient buffer keeps only levels [0, S] of each (S+3)-level
    # stack — a third less bandwidth in the build, which streams the whole
    # pyramid several times and dominates the tail after quad packing.
    grad_octs = [g[: S + 1] for g in gauss_octs]
    shared = cfg.sampling == "shared"
    if shared:
        # axis-aligned grid -> chunked buffer + strip extraction; guard the
        # sampler's two-chunks-per-grid-row invariant (span + bilinear tap
        # must fit a 128-px strip window starting in the anchor chunk)
        sig_max = sigmas[S] * k_per_level**0.5
        assert (cfg.shared_grid - 1) * cfg.shared_grid_step * sig_max + 2 <= 64, (
            "shared grid span exceeds the 64-px chunk invariant"
        )
        pack = "chunk64"
    else:
        pack = cfg.grad_pack
    g4 = _flat_gradients(grad_octs, pack, cfg.grad_dtype)
    pyr = _flat_pyramid(grad_octs, oct_sel, g4)
    if shared:
        g_smp, dxs, dys = _sample_shared_grid(
            pyr, s_lvl, x, y, sig, cfg.shared_grid, cfg.shared_grid_step
        )
        angle1, angle2, has2 = _orientation_from_samples(g_smp, dxs, dys)
    else:
        angle1, angle2, has2 = _orientation_peaks(pyr, s_lvl, x, y, sig)

    # duplicate keypoints with a secondary orientation (Lowe's multi-peak
    # rule) and re-rank: a strong keypoint's second orientation displaces
    # the weakest single-orientation detection, keeping capacity static.
    # top_k is stable, so at equal response the primary wins the slot.
    def dup(a):
        return jnp.concatenate([a, a])

    x2, y2, sig2, slvl2 = dup(x), dup(y), dup(sig), dup(s_lvl)
    oct2, resp2 = dup(oct_sel), dup(resp_sel)
    ang_all = jnp.concatenate([angle1, angle2])
    val_all = jnp.concatenate([mask, jnp.logical_and(mask, has2)])
    score2 = jnp.where(val_all, resp2, -1.0)
    top2, idx2 = jax.lax.top_k(score2, cfg.max_keypoints)
    x, y, sig, s_lvl = x2[idx2], y2[idx2], sig2[idx2], slvl2[idx2]
    oct_sel, resp_sel = oct2[idx2], resp2[idx2]
    angle = ang_all[idx2]
    mask = top2 > 0.0

    # -- phase 2b: descriptors for the final winners only -------------------
    if shared:
        # the winners' samples already exist — descriptors re-bin the dup'd
        # sample rows under each winner's angle, no further pyramid gathers
        desc = _descriptors_from_samples(
            jnp.concatenate([g_smp, g_smp])[idx2], dxs, dys, angle, mask
        )
    else:
        # octaves flattened into one 1-D pyramid buffer so every sample is
        # ONE gather instead of a per-level masked loop
        pyr = _flat_pyramid(grad_octs, oct_sel, g4)
        desc = _descriptors_for(pyr, s_lvl, x, y, sig, angle, mask)

    # octave -> full-resolution pixels (octave 0 is the 2x-doubled image
    # when upsample_first_octave, hence the 0.5 factor)
    scale_fr = jnp.exp2(oct_sel.astype(jnp.float32)) * (
        0.5 if cfg.upsample_first_octave else 1.0
    )
    kps = Keypoints(
        xy=jnp.stack([x * scale_fr, y * scale_fr], axis=1),
        scale=sig * scale_fr,
        angle=angle,
        response=resp_sel,
        mask=mask,
    )
    return kps, desc
