"""Geometry primitives, rotation kits, metrics, and small host utilities."""

from structure_from_motion_tpu.utils.rotations import (  # noqa: F401
    quat_normalize,
    quat_to_rotation,
    rotation_to_quat,
    rotation_is_valid,
    so3_exp,
    so3_hat,
)
from structure_from_motion_tpu.utils.geometry import (  # noqa: F401
    camera_projection,
    camera_extrinsic,
    compose_K,
    from_homogeneous,
    project_points,
    to_homogeneous,
    transform_world_to_camera,
)
