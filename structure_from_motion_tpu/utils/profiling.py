"""Tracing / profiling helpers (SURVEY.md section 5: the reference has only
``print`` + a BA_DEBUG flag; the TPU equivalents are jax.profiler traces and
block_until_ready-bracketed timers)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any

import jax

logger = logging.getLogger("structure_from_motion_tpu")


def device_fence() -> None:
    """Drain the device queue with a real device->host readback.

    On the tunnelled TPU backend ``jax.block_until_ready`` returns before
    execution finishes (measured: it reads ~0 ms around real work), so the
    only honest barrier is a scalar fetch — the device executes in order, so
    fetching a fresh trivial computation waits for everything enqueued
    before it.
    """
    float(jax.numpy.zeros(()) + 0.0)


@contextlib.contextmanager
def device_timer(name: str, results: dict | None = None):
    """Wall-time a device computation honestly: a fetch-bounded fence before
    and after the body (NOT ``block_until_ready`` — see :func:`device_fence`)."""
    device_fence()
    t0 = time.perf_counter()
    holder: list[Any] = []
    yield holder
    device_fence()
    dt = time.perf_counter() - t0
    logger.info("%s: %.4fs", name, dt)
    if results is not None:
        results[name] = dt


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nan_guard(tree, label: str = "") -> bool:
    """Return True and log if any leaf holds non-finite values — the
    array-world replacement for the reference's ValueError raises
    (``utils.py:43-51``, ``epipolar_processor.py:88-91``)."""
    import jax.numpy as jnp

    bad = False
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                logger.error("non-finite values in %s%s", label, jax.tree_util.keystr(path))
                bad = True
    return bad
