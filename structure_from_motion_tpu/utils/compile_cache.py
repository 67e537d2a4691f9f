"""Persistent XLA compilation cache.

The whole-trajectory global BA compiles a 20-iteration LM scan over a
problem-shaped program: ~50 s of single-CPU host time that repeats on
every process for identical shapes (measured in GLOBALBA_PROFILE_r04 —
compile was 6x the on-chip execute). JAX ships a persistent on-disk cache
keyed by the serialized HLO + compile options; enabling it makes every
re-run (same padded shapes — the pad_multiple quantisation in
``models/global_ba.build_global_problem`` exists partly for this) pay
execute time only. Safe to share across processes; keyed by backend, so
CPU-mesh tests and TPU runs never collide.

Reference analogue: none — the reference recomputes everything per run
(``ba_processor.py`` has no persistence at all); this is the TPU-native
cost being amortised the TPU-native way.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_compile_cache(path: str | None = None) -> None:
    """Idempotently point jax at an on-disk compilation cache.

    Called from every engine/solver entry point; set
    ``SFM_TPU_NO_COMPILE_CACHE=1`` to opt out (e.g. benchmarking cold
    compiles), or ``SFM_TPU_COMPILE_CACHE=<dir>`` to relocate it.
    """
    global _enabled
    if _enabled or os.environ.get("SFM_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    if path is None and jax.config.jax_compilation_cache_dir:
        # A cache directory is already configured (e.g. an explicit
        # serve.enable_compilation_cache(dir) call, or the user set
        # JAX_COMPILATION_CACHE_DIR). Never clobber it with the default —
        # just record that the cache is live so later calls stay no-ops.
        _enabled = True
        return

    cache_dir = (
        path
        or os.environ.get("SFM_TPU_COMPILE_CACHE")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "structure_from_motion_tpu", "xla"
        )
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # only persist compiles worth the disk round trip
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _reset_cache_singleton()
    except Exception:  # pragma: no cover - older jax without these flags
        return
    _enabled = True


def _reset_cache_singleton() -> None:
    """The persistent-cache backend is a process singleton created at first
    use; config updates after that point are silently ignored unless it is
    reset (jax keeps the first directory). Needed whenever the cache is
    redirected mid-process (serve.enable_compilation_cache after an engine
    already enabled the default location)."""
    try:  # pragma: no cover - private jax API, best effort
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:
        pass
