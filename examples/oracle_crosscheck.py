"""Pure-OpenCV oracle cross-check on the upenn pair 1-2.

The analogue of the reference's ``debug_dojo.py``: run the SAME two-view
problem through (a) OpenCV end-to-end and (b) this framework, and print both
poses side by side. Documents the coordinate conventions:

* OpenCV ``recoverPose`` returns world->cam (R, t) of view 2 with view 1 at
  identity; our pipeline returns cam-to-world R and center C = -R^T t...
  i.e. ours = (R_cv^T, -R_cv^T t_cv).
* Both normalise the baseline, so |C| = 1 on each side.

Usage: python examples/oracle_crosscheck.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from structure_from_motion_tpu.config import PipelineConfig
    from structure_from_motion_tpu.io import load_image_grayscale, upenn_intrinsics
    from structure_from_motion_tpu.models import two_view_reconstruction

    d = "/root/reference/test_dataset/upenn"
    K = upenn_intrinsics()
    img1 = load_image_grayscale(os.path.join(d, "image0000001.bmp")).astype(np.uint8)
    img2 = load_image_grayscale(os.path.join(d, "image0000002.bmp")).astype(np.uint8)

    # shared frontend: cv2 SIFT + FLANN ratio matches (like debug_dojo.py)
    sift = cv2.SIFT_create()
    k1, d1 = sift.detectAndCompute(img1, None)
    k2, d2 = sift.detectAndCompute(img2, None)
    flann = cv2.FlannBasedMatcher({"algorithm": 1, "trees": 5}, {"checks": 50})
    knn = flann.knnMatch(d1, d2, k=2)
    good = [m for m, n in knn if m.distance < 0.7 * n.distance]
    p1 = np.float64([k1[m.queryIdx].pt for m in good])
    p2 = np.float64([k2[m.trainIdx].pt for m in good])
    print(f"matches: {len(good)}")

    # --- OpenCV path ------------------------------------------------------
    E_cv, inl = cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC, threshold=2.0)
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, p1, p2, K, mask=inl.copy())
    C_cv = (-R_cv.T @ t_cv).ravel()
    print("\nOpenCV  (converted to cam-to-world):")
    print("R:\n", np.round(R_cv.T, 4))
    print("C:", np.round(C_cv / np.linalg.norm(C_cv), 4))

    # --- our path ---------------------------------------------------------
    cfg = PipelineConfig()
    n = len(p1)
    res = two_view_reconstruction(
        jax.random.key(0),
        jnp.asarray(p1),
        jnp.asarray(p2),
        jnp.ones(n, dtype=bool),
        jnp.asarray(K),
        cfg,
    )
    print("\nstructure_from_motion_tpu:")
    print("R:\n", np.round(np.asarray(res.R), 4))
    print("C:", np.round(np.asarray(res.C), 4))
    print(
        f"valid points: {int(np.asarray(res.point_valid).sum())}/{n}, "
        f"mean reprojection {float(res.reprojection_px):.3f} px"
    )

    # agreement
    dR = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(res.R).T @ R_cv.T) - 1) / 2, -1, 1))
    )
    dC = np.linalg.norm(np.asarray(res.C) - C_cv / np.linalg.norm(C_cv))
    dC_flip = np.linalg.norm(np.asarray(res.C) + C_cv / np.linalg.norm(C_cv))
    print(f"\nagreement: rotation diff {dR:.3f} deg, center diff {min(dC, dC_flip):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
