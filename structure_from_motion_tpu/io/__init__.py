"""Dataset loading, image decoding, feature caches, and model export."""

from structure_from_motion_tpu.io.colmap import (  # noqa: F401
    export_colmap_text,
    read_colmap_text,
)
from structure_from_motion_tpu.io.datasets import (  # noqa: F401
    load_image_grayscale,
    load_points_txt,
    upenn_intrinsics,
)
from structure_from_motion_tpu.io.synthetic import (  # noqa: F401
    synthetic_scene_sequence,
)
from structure_from_motion_tpu.io.tum import (  # noqa: F401
    export_tum_trajectory,
    load_tum_trajectory,
)
