"""SfM pipeline models: track state + the incremental reconstruction engine."""

from structure_from_motion_tpu.models.tracks import SfMState, init_state  # noqa: F401
from structure_from_motion_tpu.models.incremental import IncrementalSfM  # noqa: F401
from structure_from_motion_tpu.models.two_view import two_view_reconstruction  # noqa: F401
from structure_from_motion_tpu.models.batched import BatchedIncrementalSfM  # noqa: F401
