"""Matching tests: parity with cv2.BFMatcher knn+ratio on real SIFT
descriptors, masking behavior, and the Pallas fused kernel (interpret mode)."""

import os

import cv2
import numpy as np
import jax.numpy as jnp

from structure_from_motion_tpu.config import MatcherConfig
from structure_from_motion_tpu.io import load_image_grayscale
from structure_from_motion_tpu.ops.matching import (
    match_descriptors,
    pallas_match_top2,
    squared_distances,
)


def sift_descriptors(reference_dataset_path, name, n=512):
    img = load_image_grayscale(
        os.path.join(reference_dataset_path, "upenn", name)
    ).astype(np.uint8)
    sift = cv2.SIFT_create(nfeatures=n)
    kps, desc = sift.detectAndCompute(img, None)
    return kps, desc[:n].astype(np.float32)


def test_matches_agree_with_bfmatcher(reference_dataset_path):
    _, d1 = sift_descriptors(reference_dataset_path, "image0000001.bmp")
    _, d2 = sift_descriptors(reference_dataset_path, "image0000002.bmp")
    n1, n2 = len(d1), len(d2)

    cfg = MatcherConfig(ratio=0.7, cross_check=False)
    res = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2),
        jnp.ones(n1, dtype=bool), jnp.ones(n2, dtype=bool), cfg,
    )

    bf = cv2.BFMatcher(cv2.NORM_L2)
    knn = bf.knnMatch(d1, d2, k=2)
    cv_pairs = {}
    for m, n in knn:
        if m.distance < 0.7 * n.distance:
            # same trainIdx dedup the reference applies
            if m.trainIdx not in cv_pairs or m.distance < cv_pairs[m.trainIdx][1]:
                cv_pairs[m.trainIdx] = (m.queryIdx, m.distance)
    cv_set = {(qi, ti) for ti, (qi, _) in cv_pairs.items()}

    ours = {
        (i, int(t))
        for i, (t, v) in enumerate(zip(np.asarray(res.target), np.asarray(res.valid)))
        if v
    }
    # overlap must be high (tiny diffs possible from float order / ties)
    inter = len(ours & cv_set)
    assert inter > 0.95 * max(len(cv_set), 1), (len(ours), len(cv_set), inter)
    assert abs(len(ours) - len(cv_set)) < 0.05 * max(len(cv_set), 1)


def test_masking_and_dedup():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(8, 16)).astype(np.float32)
    # que: two clusters -> ref rows 0 and 1 both closest to que 0
    ref = np.vstack([base[0], base[0] + 0.01, base[2:]]).astype(np.float32)
    que = base.copy()
    mr = np.ones(len(ref), dtype=bool)
    mq = np.ones(len(que), dtype=bool)
    cfg = MatcherConfig(ratio=0.95, cross_check=False)
    res = match_descriptors(jnp.asarray(ref), jnp.asarray(que), jnp.asarray(mr), jnp.asarray(mq), cfg)
    t, v = np.asarray(res.target), np.asarray(res.valid)
    # que 0 claimed at most once
    assert (t[v] == 0).sum() <= 1
    # masked ref rows can never match
    mr2 = mr.copy()
    mr2[0] = False
    res2 = match_descriptors(jnp.asarray(ref), jnp.asarray(que), jnp.asarray(mr2), jnp.asarray(mq), cfg)
    assert not np.asarray(res2.valid)[0]
    # masked que columns never matched
    mq2 = mq.copy()
    mq2[0] = False
    res3 = match_descriptors(jnp.asarray(ref), jnp.asarray(que), jnp.asarray(mr), jnp.asarray(mq2), cfg)
    assert not (np.asarray(res3.target)[np.asarray(res3.valid)] == 0).any()


def test_cross_check_mutual_only():
    rng = np.random.default_rng(1)
    ref = rng.normal(size=(32, 8)).astype(np.float32)
    que = np.vstack([ref[:16] + 0.01 * rng.normal(size=(16, 8)), rng.normal(size=(16, 8))]).astype(np.float32)
    cfg = MatcherConfig(ratio=0.99, cross_check=True)
    res = match_descriptors(
        jnp.asarray(ref), jnp.asarray(que),
        jnp.ones(32, dtype=bool), jnp.ones(32, dtype=bool), cfg,
    )
    t, v = np.asarray(res.target), np.asarray(res.valid)
    # every accepted match must be mutual nearest
    d2 = np.asarray(
        squared_distances(jnp.asarray(ref), jnp.asarray(que), jnp.ones(32, bool), jnp.ones(32, bool))
    )
    for i in np.where(v)[0]:
        assert d2[:, t[i]].argmin() == i


def test_pallas_kernel_matches_xla(reference_dataset_path):
    _, d1 = sift_descriptors(reference_dataset_path, "image0000001.bmp", n=256)
    _, d2 = sift_descriptors(reference_dataset_path, "image0000002.bmp", n=256)
    d1 = np.vstack([d1, np.zeros((256 - len(d1) % 256 if len(d1) % 256 else 0, 128), np.float32)])[:256]
    d2 = np.vstack([d2, np.zeros((256 - len(d2) % 256 if len(d2) % 256 else 0, 128), np.float32)])[:256]
    mq = np.ones(256, dtype=bool)
    mq[200:] = False

    d1j, d2j = jnp.asarray(d1), jnp.asarray(d2)
    ds = np.asarray(squared_distances(d1j, d2j, jnp.ones(256, bool), jnp.asarray(mq)))
    want_j = ds.argmin(axis=1)
    want_d1 = ds.min(axis=1)
    part = np.partition(ds, 1, axis=1)
    want_d2 = part[:, 1]

    got_d1, got_d2, got_j = pallas_match_top2(d1j, d2j, jnp.asarray(mq), interpret=True)
    np.testing.assert_allclose(np.asarray(got_d1), want_d1, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got_d2), want_d2, rtol=1e-4, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(got_j), want_j)
