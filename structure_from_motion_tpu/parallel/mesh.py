"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_name: str = "shard") -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` devices.

    The point/observation axis of bundle adjustment shards along this axis;
    cameras stay replicated. On a pod slice the flat device order follows
    the ICI torus, so neighbouring shards exchange over ICI links.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis_name,))
