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


def cv2_trajectory(imgs, K, max_kp: int = 1024, ratio: float = 0.75):
    """Full-trajectory OpenCV oracle: an unbiased mini incremental SfM built
    purely from cv2 solvers (SIFT -> BF ratio match -> findEssentialMat +
    recoverPose bootstrap -> solvePnPRansac localization ->
    triangulatePoints mapping), the chain the reference's ``debug_dojo.py``
    cross-checks one pair of.

    This is the SECOND accuracy anchor next to the reference's golden
    ``view_pose.pkl`` (which is the output of the reference's own imperfect
    solver — e.g. its essential-decomposition center bug, see
    ``campose_processor.py:69-70``): a trajectory produced by solvers with
    none of those bugs. Returns (locs (N,3), rots (N,3,3)) cam-to-world.
    """
    sift = cv2.SIFT_create(nfeatures=max_kp)
    feats = [sift.detectAndCompute(im.astype(np.uint8), None) for im in imgs]
    bf = cv2.BFMatcher(cv2.NORM_L2)

    def match(i, j):
        knn = bf.knnMatch(feats[i][1], feats[j][1], k=2)
        good = [m for m, n in knn if m.distance < ratio * n.distance]
        return good

    Rs = [np.eye(3)]  # cam-to-world
    Cs = [np.zeros(3)]
    # map: 3-D points keyed by (frame, keypoint index)
    kp_to_point: dict = {}
    points: list = []

    def proj(i):
        Rcw = Rs[i]
        return K @ np.hstack([Rcw.T, (-Rcw.T @ Cs[i]).reshape(3, 1)])

    # ---- bootstrap from pair (0, 1) -------------------------------------
    good = match(0, 1)
    p0 = np.float64([feats[0][0][m.queryIdx].pt for m in good])
    p1 = np.float64([feats[1][0][m.trainIdx].pt for m in good])
    E, inl = cv2.findEssentialMat(p0, p1, K, method=cv2.RANSAC, threshold=2.0)
    _, R10, t10, pose_mask = cv2.recoverPose(E, p0, p1, K, mask=inl.copy())
    Rs.append(R10.T)
    Cs.append((-R10.T @ t10).ravel())
    X = cv2.triangulatePoints(proj(0), proj(1), p0.T, p1.T)
    X = (X[:3] / X[3:]).T
    for k, m in enumerate(good):
        if pose_mask[k]:
            points.append(X[k])
            pid = len(points) - 1
            kp_to_point[(0, m.queryIdx)] = pid
            kp_to_point[(1, m.trainIdx)] = pid

    # ---- localize + extend map frame by frame ---------------------------
    for i in range(2, len(imgs)):
        # 2D-3D pairs through matches to ALL prior frames
        obj, img_pts, new_matches = [], [], []
        seen_pids = set()
        for j in range(i):
            for m in match(j, i):
                pid = kp_to_point.get((j, m.queryIdx))
                if pid is not None:
                    if pid not in seen_pids:
                        seen_pids.add(pid)
                        obj.append(points[pid])
                        img_pts.append(feats[i][0][m.trainIdx].pt)
                        kp_to_point.setdefault((i, m.trainIdx), pid)
                elif j == i - 1:
                    new_matches.append(m)
        obj = np.float64(obj)
        img_pts = np.float64(img_pts)
        ok, rvec, tvec, inliers = cv2.solvePnPRansac(
            obj, img_pts, K, None, reprojectionError=8.0, flags=cv2.SOLVEPNP_ITERATIVE
        )
        assert ok, f"cv2 PnP failed at frame {i}"
        Rwc, _ = cv2.Rodrigues(rvec)
        Rs.append(Rwc.T)
        Cs.append((-Rwc.T @ tvec).ravel())

        # triangulate brand-new matches against the previous frame
        if new_matches:
            q = np.float64([feats[i - 1][0][m.queryIdx].pt for m in new_matches])
            r = np.float64([feats[i][0][m.trainIdx].pt for m in new_matches])
            Xn = cv2.triangulatePoints(proj(i - 1), proj(i), q.T, r.T)
            Xn = (Xn[:3] / Xn[3:]).T
            for k, m in enumerate(new_matches):
                # cheirality + reprojection gate
                for v in (i - 1, i):
                    Pv = proj(v)
                    ph = Pv @ np.append(Xn[k], 1.0)
                    if ph[2] <= 0:
                        break
                else:
                    points.append(Xn[k])
                    pid = len(points) - 1
                    kp_to_point[(i - 1, m.queryIdx)] = pid
                    kp_to_point[(i, m.trainIdx)] = pid
    return np.stack(Cs), np.stack(Rs)


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

    # --- full-trajectory oracle vs the reference's golden -----------------
    import pickle

    from structure_from_motion_tpu.utils.metrics import absolute_trajectory_error

    imgs = [
        load_image_grayscale(os.path.join(d, f"image{i:07d}.bmp"))
        for i in range(1, 7)
    ]
    locs, rots = cv2_trajectory(imgs, K)
    with open(os.path.join(d, "results", "view_pose.pkl"), "rb") as fh:
        g_locs, _ = pickle.load(fh)
    span = np.linalg.norm(g_locs.max(0) - g_locs.min(0))
    ate = absolute_trajectory_error(locs, g_locs)
    print("\n6-frame cv2-oracle trajectory (cam centers):\n", np.round(locs, 3))
    print(
        f"ATE(cv2 oracle, reference golden) = {ate:.4f} "
        f"({100 * ate / span:.2f}% of span) — the golden carries this much "
        "bias from the reference's own solver"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
