"""Device meshes and the sharded Schur-complement bundle adjustment.

The reference has no distributed backend at all (SURVEY.md section 2:
single-threaded NumPy). This package is the greenfield scaling layer:
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives over ICI/DCN.
"""

from structure_from_motion_tpu.parallel.mesh import make_mesh, make_mesh_2d  # noqa: F401
from structure_from_motion_tpu.parallel.ba_sharded import (  # noqa: F401
    deinterleave_points,
    interleave_points,
    partition_observations,
    sharded_bundle_adjustment,
)
from structure_from_motion_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    process_topology,
    shutdown_distributed,
)
