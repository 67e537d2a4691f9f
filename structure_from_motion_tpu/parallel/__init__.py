"""Device meshes and the sharded Schur-complement bundle adjustment.

The reference has no distributed backend at all (SURVEY.md section 2:
single-threaded NumPy). This package is the greenfield scaling layer:
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives over ICI/DCN.
"""

from structure_from_motion_tpu.parallel.mesh import make_mesh, make_mesh_2d  # noqa: F401
from structure_from_motion_tpu.parallel.ba_sharded import (  # noqa: F401
    partition_observations,
    sharded_bundle_adjustment,
)
