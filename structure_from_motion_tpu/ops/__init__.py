"""Batched, jittable compute kernels for every SfM stage.

Each module replaces a reference "processor" with pure functions over
fixed-shape arrays (leading axes batch/vmap/shard):

    linalg.py         batched nullspaces, closed-form small inverses
    ransac.py         hypothesis-batch RANSAC machinery
    epipolar.py       Hartley-normalised 8-point + RANSAC, E from F
    campose.py        E -> 4 pose candidates, cheirality disambiguation
    triangulation.py  batched DLT + Gauss-Newton/LM refinement
    pnp.py            batched 6-point DLT RANSAC + LM pose refinement
    features.py       on-device detector/descriptor frontend
    matching.py       MXU descriptor matching (+ Pallas kernel)
    ba.py             Schur-complement bundle-adjustment step
"""
