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


def make_mesh_2d(
    n_hosts: int,
    chips_per_host: int,
    axis_names: tuple[str, str] = ("host", "chip"),
) -> Mesh:
    """A (hosts, chips) 2-D mesh — the multi-host BA layout
    (BASELINE.json north star; SURVEY.md section 5 "Distributed
    communication backend").

    Point/observation shards span both axes; collectives within a host row
    ride ICI, across rows DCN. Uses ``jax.experimental.mesh_utils`` when the
    topology is a real slice so the host axis maps onto the physical
    process boundaries; falls back to a flat reshape for virtual devices.
    """
    total = n_hosts * chips_per_host
    devs = jax.devices()
    if total > len(devs):
        raise ValueError(f"requested {total} devices, have {len(devs)}")
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(
            (n_hosts, chips_per_host), devices=devs[:total]
        )
    except Exception:
        arr = np.array(devs[:total]).reshape(n_hosts, chips_per_host)
    return Mesh(arr, axis_names)
