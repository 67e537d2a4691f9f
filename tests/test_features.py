"""Frontend tests: the native DoG detector + descriptor must produce
matchable, geometrically consistent features on the real upenn pair.

The oracle is functional quality (F-RANSAC inlier count on its own matches,
in the same ballpark as cv2 SIFT), not keypoint-for-keypoint equality
(SURVEY.md section 7: the frontend is a re-design, not a port).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from structure_from_motion_tpu.config import FrontendConfig, MatcherConfig, RansacConfig
from structure_from_motion_tpu.io import load_image_grayscale
from structure_from_motion_tpu.ops.epipolar import find_fundamental
from structure_from_motion_tpu.ops.features import detect_and_describe
from structure_from_motion_tpu.ops.matching import match_descriptors


@pytest.fixture(scope="module")
def upenn_pair_half(reference_dataset_path):
    d = os.path.join(reference_dataset_path, "upenn")
    i1 = load_image_grayscale(os.path.join(d, "image0000001.bmp"))[::2, ::2]
    i2 = load_image_grayscale(os.path.join(d, "image0000002.bmp"))[::2, ::2]
    return i1, i2


CFG = FrontendConfig(max_keypoints=512, num_octaves=3, upsample_first_octave=False)


def test_detector_basic_properties(upenn_pair_half):
    img, _ = upenn_pair_half
    kps, desc = detect_and_describe(jnp.asarray(img), CFG)
    assert kps.xy.shape == (512, 2)
    assert desc.shape == (512, 128)
    n_valid = int(kps.mask.sum())
    assert n_valid > 300, n_valid
    xy = np.asarray(kps.xy)[np.asarray(kps.mask)]
    h, w = img.shape
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < w).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < h).all()
    # descriptors of valid kps are unit-ish (512 x normalised, clipped)
    d = np.asarray(desc)[np.asarray(kps.mask)]
    norms = np.linalg.norm(d, axis=1)
    assert (norms > 100).all() and (norms < 1000).all()
    # responses sorted descending by the top-k merge
    resp = np.asarray(kps.response)[np.asarray(kps.mask)]
    assert (np.diff(resp) <= 1e-6).all()


def test_pair_matching_geometric_quality(upenn_pair_half):
    i1, i2 = upenn_pair_half
    kp1, d1 = detect_and_describe(jnp.asarray(i1), CFG)
    kp2, d2 = detect_and_describe(jnp.asarray(i2), CFG)
    res = match_descriptors(d1, d2, kp1.mask, kp2.mask, MatcherConfig(ratio=0.8))
    n_matches = int(res.valid.sum())
    assert n_matches > 60, n_matches

    sel = res.valid
    ref = jnp.where(sel[:, None], kp1.xy, 0.0)
    que = jnp.where(sel[:, None], kp2.xy[jnp.where(sel, res.target, 0)], 0.0)
    F = find_fundamental(
        jax.random.key(0), ref, que, sel,
        RansacConfig(inlier_threshold=2.0, iteration=512),
    )
    n_inl = int(F.num_inliers)
    # the majority of ratio-test matches must be geometrically consistent
    assert n_inl > 0.5 * n_matches, (n_inl, n_matches)
    assert n_inl > 40


def test_detector_deterministic(upenn_pair_half):
    img, _ = upenn_pair_half
    kp_a, d_a = detect_and_describe(jnp.asarray(img), CFG)
    kp_b, d_b = detect_and_describe(jnp.asarray(img), CFG)
    np.testing.assert_array_equal(np.asarray(kp_a.xy), np.asarray(kp_b.xy))
    np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))


def test_blank_image_yields_no_keypoints():
    blank = jnp.zeros((256, 256), dtype=jnp.float32)
    kps, desc = detect_and_describe(blank, CFG)
    assert int(kps.mask.sum()) == 0
    assert bool(jnp.isfinite(desc).all())


def test_harris_brief_hamming_pipeline(upenn_pair_half):
    """The binary-descriptor family (reference's ORB branch,
    view_processor.py:128-137 + Hamming BFMatcher key_tracker.py:82-85):
    Harris corners + steered-BRIEF +-1 codes must produce geometrically
    consistent Hamming matches on the real pair."""
    i1, i2 = upenn_pair_half
    cfg = FrontendConfig(
        detector="harris", max_keypoints=512, descriptor_dim=256, num_octaves=3
    )
    k1, d1 = detect_and_describe(jnp.asarray(i1), cfg)
    k2, d2 = detect_and_describe(jnp.asarray(i2), cfg)
    assert int(k1.mask.sum()) > 300
    assert d1.shape == (512, 256)
    vals = np.unique(np.asarray(d1)[np.asarray(k1.mask)])
    assert set(vals).issubset({-1.0, 1.0})

    res = match_descriptors(
        d1, d2, k1.mask, k2.mask, MatcherConfig(ratio=0.85, metric="hamming")
    )
    n_matches = int(res.valid.sum())
    assert n_matches > 60, n_matches
    # geometric quality: F-RANSAC on the matches keeps a solid majority
    tgt = np.maximum(np.asarray(res.target), 0)
    que_xy = jnp.asarray(np.asarray(k2.xy)[tgt])
    F = find_fundamental(
        jax.random.key(0), k1.xy, que_xy, res.valid,
        RansacConfig(inlier_threshold=2.0, iteration=256),
    )
    assert int(F.num_inliers) > 0.5 * n_matches, (int(F.num_inliers), n_matches)


def test_hamming_distance_matches_bit_count():
    rng = np.random.default_rng(0)
    a = np.where(rng.random((16, 64)) > 0.5, 1.0, -1.0).astype(np.float32)
    b = np.where(rng.random((16, 64)) > 0.5, 1.0, -1.0).astype(np.float32)
    from structure_from_motion_tpu.ops.matching import hamming_distances

    ham = np.asarray(
        hamming_distances(
            jnp.asarray(a), jnp.asarray(b),
            jnp.ones(16, bool), jnp.ones(16, bool),
        )
    )
    brute = (a[:, None, :] != b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(ham, brute)


def test_scale_interpolation_is_fractional(upenn_pair_half):
    """The 3-D subpixel fit interpolates sigma BETWEEN pyramid levels —
    scales must not collapse onto the discrete level grid (the 2-D-only
    refinement this replaced had exactly num_octaves * S distinct values)."""
    img, _ = upenn_pair_half
    kps, _ = detect_and_describe(jnp.asarray(img), CFG)
    sc = np.asarray(kps.scale)[np.asarray(kps.mask)]
    n_discrete = CFG.num_octaves * (CFG.scales_per_octave + 3)
    assert len(np.unique(np.round(sc, 4))) > 3 * n_discrete


def test_multiple_orientation_duplicates(upenn_pair_half):
    """Lowe's multi-peak rule: some keypoints must appear twice at the same
    location/scale with different orientations (~15 percent on real images)."""
    img, _ = upenn_pair_half
    kps, _ = detect_and_describe(jnp.asarray(img), CFG)
    m = np.asarray(kps.mask)
    xy = np.asarray(kps.xy)[m]
    ang = np.asarray(kps.angle)[m]
    d_xy = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
    d_ang = np.abs(ang[:, None] - ang[None, :])
    dup = (d_xy < 1e-4) & (d_ang > 0.1)
    n_dup = int(dup.any(axis=1).sum())
    assert n_dup > 10, n_dup


def test_upsampled_first_octave_coordinates(upenn_pair_half):
    """upsample_first_octave detects on a 2x image but must report
    full-resolution pixel coordinates: in-bounds, and a healthy fraction of
    the strong plain-config keypoints re-detected within 2 px."""
    img, _ = upenn_pair_half
    cfg_up = FrontendConfig(
        max_keypoints=256, num_octaves=3, upsample_first_octave=True
    )
    kps_u, desc_u = detect_and_describe(jnp.asarray(img), cfg_up)
    m_u = np.asarray(kps_u.mask)
    xy_u = np.asarray(kps_u.xy)[m_u]
    h, w = img.shape
    assert m_u.sum() > 150
    assert (xy_u[:, 0] >= 0).all() and (xy_u[:, 0] < w).all()
    assert (xy_u[:, 1] >= 0).all() and (xy_u[:, 1] < h).all()

    kps_p, _ = detect_and_describe(
        jnp.asarray(img),
        FrontendConfig(max_keypoints=256, num_octaves=3, upsample_first_octave=False),
    )
    xy_p = np.asarray(kps_p.xy)[np.asarray(kps_p.mask)]
    d = np.sqrt(((xy_u[:, None] - xy_p[None]) ** 2).sum(-1)).min(axis=1)
    frac = float((d < 2.0).mean())
    # most of the fixed budget legitimately moves to finer-scale detections
    # that only exist on the doubled image; a miscalibrated coordinate map
    # would send overlap to ~0 (keypoints land between the plain set)
    assert frac > 0.15, frac


def test_paired_sampler_matches_unpaired_reference():
    """_bilinear_sample_paired (2 gathers over the paired (rows, 4) buffer
    — the TPU product path) must reproduce _bilinear_sample_flat (4 gathers
    over (rows, 2)) exactly, including samples outside the image and taps
    straddling the borders."""
    import numpy as np

    from structure_from_motion_tpu.ops import features as F

    rng = np.random.default_rng(0)
    h, w, L = 96, 112, 3
    g2 = jnp.asarray(rng.normal(size=(L * h * w, 2)).astype(np.float32))
    g4 = jnp.concatenate(
        [g2, jnp.concatenate([g2[1:], jnp.zeros((1, 2))])], axis=1
    )
    n, T = 32, 128
    pyr = F._FlatPyramid(
        g4=g4,
        base=jnp.zeros((n,), jnp.int32),
        h=jnp.full((n,), h, jnp.int32),
        w=jnp.full((n,), w, jnp.int32),
        hw=jnp.full((n,), h * w, jnp.int32),
    )
    s = jnp.asarray(rng.integers(0, L, n), jnp.int32)
    x = jnp.asarray(rng.uniform(8, w - 8, n), jnp.float32)
    sx = x[:, None] + jnp.asarray(rng.uniform(-30, 30, (n, T)), jnp.float32)
    sy = jnp.asarray(rng.uniform(8, h - 8, n), jnp.float32)[:, None] + jnp.asarray(
        rng.uniform(-30, 30, (n, T)), jnp.float32
    )
    # deterministic border cases: fractional taps at x = -1.5..w-0.5
    sx = sx.at[:, :4].set(
        jnp.asarray([-1.5, -0.5, w - 1.5, w - 0.5], jnp.float32)[None, :]
    )
    ref = F._bilinear_sample_flat(g2, pyr.base, s, sx, sy, pyr.h, pyr.w, pyr.hw)
    got = F._bilinear_sample_paired(pyr, s, sx, sy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_quad_sampler_matches_unpaired_reference():
    """_bilinear_sample_quad (ONE gather over the quad-packed (rows, 8)
    buffer — the default TPU product path, FrontendConfig.grad_pack="quad")
    must reproduce _bilinear_sample_flat exactly, including samples outside
    the image and taps straddling all four borders."""
    import numpy as np

    from structure_from_motion_tpu.ops import features as F

    rng = np.random.default_rng(1)
    h, w, L = 96, 112, 3
    g3 = jnp.asarray(rng.normal(size=(L, h, w)).astype(np.float32))
    # quad buffer built exactly like _flat_gradients(pack="quad") but from
    # a raw per-pixel (gx, gy) field so the flat reference can share it
    gx = jnp.gradient(g3, axis=2)
    gy = jnp.gradient(g3, axis=1)
    g2img = jnp.stack([gx, gy], axis=-1)  # (L, h, w, 2)
    g2 = g2img.reshape(-1, 2)
    g8 = F._flat_gradients([g3], "quad")
    n, T = 32, 128
    pyr = F._FlatPyramid(
        g4=g8,
        base=jnp.zeros((n,), jnp.int32),
        h=jnp.full((n,), h, jnp.int32),
        w=jnp.full((n,), w, jnp.int32),
        hw=jnp.full((n,), h * w, jnp.int32),
    )
    s = jnp.asarray(rng.integers(0, L, n), jnp.int32)
    x = jnp.asarray(rng.uniform(8, w - 8, n), jnp.float32)
    sx = x[:, None] + jnp.asarray(rng.uniform(-30, 30, (n, T)), jnp.float32)
    sy = jnp.asarray(rng.uniform(8, h - 8, n), jnp.float32)[:, None] + jnp.asarray(
        rng.uniform(-30, 30, (n, T)), jnp.float32
    )
    # deterministic border cases on both axes: fractional taps straddling
    # x = -1.5..w-0.5 crossed with y = -1.5..h-0.5
    bx = jnp.asarray([-1.5, -0.5, w - 1.5, w - 0.5], jnp.float32)
    by = jnp.asarray([-1.5, -0.5, h - 1.5, h - 0.5], jnp.float32)
    sx = sx.at[:, :16].set(jnp.tile(bx, 4)[None, :])
    sy = sy.at[:, :16].set(jnp.repeat(by, 4)[None, :])
    ref = F._bilinear_sample_flat(g2, pyr.base, s, sx, sy, pyr.h, pyr.w, pyr.hw)
    got = F._bilinear_sample_paired(pyr, s, sx, sy)  # dispatches on width 8
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_chunked_sampler_matches_unpaired_reference():
    """_bilinear_sample_chunked (4 chunk-gathers per grid row over the
    chunk64 buffer — the shared-sampling product path) must reproduce
    _bilinear_sample_flat exactly on an axis-aligned grid, including grid
    rows straddling every border and chunk boundaries mid-row."""
    import numpy as np

    from structure_from_motion_tpu.ops import features as F

    rng = np.random.default_rng(2)
    h, w, L = 96, 100, 3  # w NOT a 64-multiple: chunks cross image rows
    g3 = jnp.asarray(rng.normal(size=(L, h, w)).astype(np.float32))
    gx = jnp.gradient(g3, axis=2)
    gy = jnp.gradient(g3, axis=1)
    g2 = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
    g2c = F._flat_gradients([g3], "chunk64")
    assert g2c.ndim == 3 and g2c.shape[1:] == (64, 2)
    n, G = 48, 18
    step = 0.95
    mkpyr = lambda buf: F._FlatPyramid(  # noqa: E731
        g4=buf,
        base=jnp.zeros((n,), jnp.int32),
        h=jnp.full((n,), h, jnp.int32),
        w=jnp.full((n,), w, jnp.int32),
        hw=jnp.full((n,), h * w, jnp.int32),
    )
    s = jnp.asarray(rng.integers(0, L, n), jnp.int32)
    # centers including ones whose grid straddles each border
    x = jnp.asarray(rng.uniform(2, w - 2, n), jnp.float32)
    y = jnp.asarray(rng.uniform(2, h - 2, n), jnp.float32)
    sig = jnp.asarray(rng.uniform(1.2, 3.5, n), jnp.float32)
    got, dxs, dys = F._sample_shared_grid(mkpyr(g2c), s, x, y, sig, G, step)
    sx = x[:, None] + sig[:, None] * dxs[None, :]
    sy = y[:, None] + sig[:, None] * dys[None, :]
    pyr = mkpyr(g2)
    ref = F._bilinear_sample_flat(g2, pyr.base, s, sx, sy, pyr.h, pyr.w, pyr.hw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pallas_candidate_response_matches_xla():
    """The fused Pallas candidate kernel (extrema + contrast + edge +
    border in one pass) must reproduce the XLA separable-window path's
    masked response map exactly in f32, including all border rows/cols and
    both extremum polarities."""
    import numpy as np

    from structure_from_motion_tpu.config import FrontendConfig
    from structure_from_motion_tpu.ops import features as F
    from structure_from_motion_tpu.ops.features_pallas import (
        pallas_candidate_response,
    )

    rng = np.random.default_rng(3)
    S2, H, W = 5, 64, 128
    dog = jnp.asarray(rng.normal(size=(S2, H, W)).astype(np.float32) * 0.05)
    cfg = FrontendConfig(extrema_dtype="f32")
    border = 8

    ext = F._local_extrema(dog, "f32")
    cok = jnp.abs(dog[1:-1]) > cfg.contrast_threshold
    eok = jnp.stack(
        [
            F._edge_response_ok(dog[1 + s], cfg.edge_threshold)
            for s in range(S2 - 2)
        ]
    )
    bm = jnp.zeros((H, W), bool).at[border:-border, border:-border].set(True)
    ref = jnp.where(ext & cok & eok & bm[None], jnp.abs(dog[1:-1]), 0.0)

    got = pallas_candidate_response(
        dog, cfg.contrast_threshold, cfg.edge_threshold, border=border,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_pallas_blur_matches_band_matmul():
    """The Pallas separable stencil blur must reproduce the zero-padded
    'SAME' correlation (the band-matmul path's exact semantics) to f32
    sum-order tolerance, including the borders (zeroed halo blocks)."""
    import numpy as np

    from structure_from_motion_tpu.ops import features as F
    from structure_from_motion_tpu.ops.blur_pallas import pallas_blur_levels

    rng = np.random.default_rng(4)
    H, W = 64, 256
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    ks = [F._gaussian_kernel1d(s) for s in (1.2, 2.5, 4.8)]
    got = pallas_blur_levels(img, ks, interpret=True)
    for k, g in zip(ks, got):
        r = (len(k) - 1) // 2
        kj = jnp.asarray(k)
        ref_h = jax.lax.conv_general_dilated(
            img[None, None], kj.reshape(1, 1, 1, -1), (1, 1), [(0, 0), (r, r)]
        )
        ref = jax.lax.conv_general_dilated(
            ref_h, kj.reshape(1, 1, -1, 1), (1, 1), [(r, r), (0, 0)]
        )[0, 0]
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref), atol=2e-5)
