"""structure_from_motion_tpu — a TPU-native Structure-from-Motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``willSapgreen/structure-from-motion`` pipeline (NumPy/OpenCV incremental SfM):

    images -> feature detection -> matching/tracking -> two-view geometry
           -> pose estimation (PnP) -> triangulation -> bundle adjustment

Everything on the compute path is pure, batched, jittable JAX over
fixed-shape arrays with validity masks; the point/observation axis is the
primary vmap *and* shard axis. Multi-device scaling uses
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives (see
``structure_from_motion_tpu.parallel``).

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):

    utils/      geometry primitives, rotations/quaternions, configs, metrics
    ops/        batched kernels: epipolar, pose, PnP, triangulation, features,
                matching, bundle adjustment
    models/     track tables + the incremental SfM pipeline (flagship model)
    parallel/   device meshes and the sharded Schur-complement BA
    io/         datasets, image decoding, feature caches
"""

__version__ = "0.1.0"

from structure_from_motion_tpu.config import (  # noqa: F401
    BAConfig,
    FrontendConfig,
    LMConfig,
    MatcherConfig,
    PipelineConfig,
    RansacConfig,
)
