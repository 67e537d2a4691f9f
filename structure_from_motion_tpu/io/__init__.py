"""Dataset loading, image decoding, and feature caches."""

from structure_from_motion_tpu.io.datasets import (  # noqa: F401
    load_image_grayscale,
    load_points_txt,
    upenn_intrinsics,
)
