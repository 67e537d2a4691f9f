"""Multi-host runtime initialisation.

The reference has no distributed communication backend at all (SURVEY.md
section 5: no NCCL/MPI/Gloo anywhere). On TPU the equivalent layer is
``jax.distributed``: every host process connects to one coordinator, after
which ``jax.devices()`` spans the whole slice and the ``Mesh`` built by
``parallel.mesh.make_mesh_2d(n_hosts, chips_per_host)`` lays point/
observation shards so that collectives ride ICI within a host and DCN
across hosts.

Single-process runs (tests, the single-chip bench, the virtual CPU mesh)
skip initialisation entirely — every entry point here is a safe no-op in
that case, so the same pipeline code runs unchanged from one chip to a pod.
"""

from __future__ import annotations

import os


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Connect this host to the JAX distributed runtime.

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``); on Cloud TPU pods ``jax.distributed.initialize``
    auto-discovers everything from the TPU metadata, so calling this with no
    arguments is always correct. Returns True when a multi-process runtime
    was (or already is) initialised, False for a plain single-process run.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    already = getattr(
        getattr(jax.distributed, "global_state", None), "client", None
    )
    if already is not None:
        return True

    # ``jax.distributed.initialize`` must run BEFORE anything touches the
    # XLA backend — including ``jax.default_backend()`` — so pod detection
    # here is environment-only: multi-worker TPU runtimes export
    # TPU_WORKER_HOSTNAMES as a comma-separated list with one entry PER
    # worker, so >1 entry means a pod (a single-host TPU VM lists just
    # itself and needs no distributed runtime).
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_tpu_pod = len([w for w in workers.split(",") if w.strip()]) > 1
    if coordinator_address is None and not on_tpu_pod:
        return False  # single process: nothing to initialise

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def shutdown_distributed() -> None:
    """Tear down the distributed runtime (no-op if never initialised)."""
    import jax

    try:
        jax.distributed.shutdown()
    except Exception:
        pass


def process_topology() -> tuple[int, int]:
    """(num_hosts, local_devices_per_host) of the current runtime — the
    natural arguments for ``parallel.mesh.make_mesh_2d``."""
    import jax

    return jax.process_count(), jax.local_device_count()
