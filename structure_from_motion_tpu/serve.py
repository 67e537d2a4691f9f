"""AOT export / serving runtime for the reconstruction pipeline.

Production deployments should not pay Python tracing at process start, and
a serving binary should run a *pinned* program, not whatever the current
source tree traces to. Because the whole pipeline is fixed-shape by design
(every program's avals are fully determined by ``PipelineConfig``), the
fused frame programs are exactly the artifact ``jax.export`` wants: this
module serialises an engine's jitted programs (frame step for both
frontends, keyframe assessment, eviction, reprojection metric, final BA)
plus its config into one ``.npz`` artifact, and loads them back into a
drop-in engine that never re-traces the geometry stack.

What each piece buys (measured semantics, not marketing):

* ``export_engine`` / ``load_engine``: kills TRACING at load (the Python
  geometry stack is never re-entered; ops are baked StableHLO with
  jax.export's versioning guarantees). XLA still compiles the StableHLO on
  first call per process — pair with the persistent compilation cache
  (``enable_compilation_cache``) so that compile is a disk hit too.
* ``enable_compilation_cache``: caches XLA executables on disk keyed by
  HLO; the second process start of the same program costs milliseconds.
  The CLI exposes it as ``--compile-cache DIR``.

Exports are platform-pinned (an artifact exported on TPU embeds the TPU
lowering, including the Pallas matcher custom calls; export on the target
platform). The reference has no deployment story at all — its "runtime"
is re-running the Python script (``README.md:26-28``).
"""

from __future__ import annotations

import io
import json
import os

import numpy as np

from structure_from_motion_tpu.config import PipelineConfig

_FORMAT_VERSION = 1


def enable_compilation_cache(cache_dir: str) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Safe to call before any compile; subsequent process starts reuse the
    cached executables (the cold-start compile of the fused frame program
    is tens of seconds on a tunnelled TPU; a cache hit is milliseconds).
    """
    import jax

    from structure_from_motion_tpu.utils.compile_cache import (
        _reset_cache_singleton,
    )

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything, including programs that compile quickly — the
    # pipeline dispatches many small jitted helpers around the main step
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # the engines may already have pointed the process-wide cache at the
    # default location (utils/compile_cache); redirecting requires a reset
    _reset_cache_singleton()
    # Mark the process-wide cache as configured so a later engine /
    # solve_global call does not overwrite this directory with the default
    # (and reset min_compile_time back to 1.0 s).
    from structure_from_motion_tpu.utils import compile_cache as _cc

    _cc._enabled = True


_serialization_registered = False


def _register_serialization() -> None:
    """Register the state NamedTuple with jax.export's pytree serializer
    (idempotent; needed on both the export and the load side)."""
    global _serialization_registered
    if _serialization_registered:
        return
    from jax import export as jexport

    from structure_from_motion_tpu.models.tracks import EvictionRecord, SfMState

    jexport.register_namedtuple_serialization(
        SfMState, serialized_name="structure_from_motion_tpu.SfMState"
    )
    jexport.register_namedtuple_serialization(
        EvictionRecord,
        serialized_name="structure_from_motion_tpu.EvictionRecord",
    )
    _serialization_registered = True


def _example_args(engine):
    """Representative (fixed-shape) arguments for each exported program."""
    import jax
    import jax.numpy as jnp

    cfg = engine.config
    cap = cfg.capacity
    st = engine.state
    dtype = st.kp_xy.dtype
    v = jnp.asarray(0)
    key = jax.random.fold_in(engine._key, 0)
    xy = jnp.zeros((cap.max_keypoints, 2), dtype)
    desc = jnp.zeros((cap.max_keypoints, cfg.frontend.descriptor_dim), dtype)
    valid = jnp.zeros((cap.max_keypoints,), bool)
    # exported programs are shape- AND dtype-pinned: serve uint8 camera
    # frames with engine.image_dtype = np.uint8 (4x cheaper host->device
    # transfer; the frontend normalises on device either way)
    img = jnp.zeros(engine.image_shape, getattr(engine, "image_dtype", jnp.float32))
    return {
        "frame_step": (st, v, key, xy, desc, valid),
        "frame_step_native": (st, v, key, img),
        "assess": (st, v, xy, desc, valid),
        "assess_native": (st, v, img),
        "evict": (st,),
        "reproj": (st,),
        "finalize": (st,),
    }


def export_engine(engine, path: str, programs=None) -> dict:
    """Serialise ``engine``'s jitted programs + config to ``path``.

    ``engine``: an :class:`~structure_from_motion_tpu.models.IncrementalSfM`
    whose ``image_shape`` attribute is set (native frontend exports need the
    input image shape; set ``engine.image_shape = (H, W)``).
    ``programs``: subset of program names to export (default: everything
    applicable to the engine's frontend/config). Returns
    ``{name: serialized_size_bytes}``.
    """
    import functools

    import jax
    from jax import export as jexport

    from structure_from_motion_tpu.models import incremental as I

    _register_serialization()

    cfg = engine.config
    native = engine.frontend == "native"
    if native and not hasattr(engine, "image_shape"):
        raise ValueError(
            "set engine.image_shape = (H, W) before export_engine (the "
            "native frame program is shape-specialised to its input image)"
        )
    if not hasattr(engine, "image_shape"):
        engine.image_shape = (1, 1)

    import dataclasses

    fin_cfg = dataclasses.replace(
        cfg, ba=dataclasses.replace(cfg.ba, iterations=10)
    )
    fns = {
        "frame_step": functools.partial(I._frame_step, config=cfg),
        "frame_step_native": functools.partial(I._frame_step_native, config=cfg),
        "assess": functools.partial(I._assess_frame, config=cfg),
        "assess_native": functools.partial(I._assess_frame_native, config=cfg),
        "evict": I.tracks.evict_oldest_view,
        "reproj": I.pipeline_reprojection_error,
        "finalize": functools.partial(I._ba_stage, config=fin_cfg),
    }
    if programs is None:
        programs = ["frame_step", "evict", "reproj", "finalize"]
        if native:
            programs.append("frame_step_native")
        if cfg.keyframe_min_flow_px > 0:
            programs.append("assess")
            if native:
                programs.append("assess_native")

    if not programs:
        raise ValueError("programs must name at least one program to export")
    examples = _example_args(engine)
    blobs, sizes, platforms = {}, {}, None
    for name in programs:
        exp = jexport.export(jax.jit(fns[name]))(*examples[name])
        blob = exp.serialize()
        blobs[name] = np.frombuffer(blob, np.uint8)
        sizes[name] = len(blob)
        platforms = list(exp.platforms)

    meta = {
        "format_version": _FORMAT_VERSION,
        "config": json.loads(cfg.to_json()),
        "frontend": engine.frontend,
        "image_shape": list(engine.image_shape),
        "image_dtype": np.dtype(
            getattr(engine, "image_dtype", np.float32)
        ).name,
        "programs": sorted(blobs),
        "platforms": platforms,
    }
    buf = io.BytesIO()
    np.savez_compressed(
        buf,
        __meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
        __K=np.asarray(engine.state.K),
        **{f"prog_{k}": v for k, v in blobs.items()},
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return sizes


class ServedSfM:
    """Drop-in engine backed by a serialized artifact: same feeding API as
    :class:`IncrementalSfM` (``process_image`` / ``process_features`` /
    ``poses`` / ``map_points`` / ``reprojection_error`` / ``finalize``),
    but every device program is a deserialized ``jax.export`` call — the
    geometry stack is never re-traced."""

    def __init__(self, path: str, seed: int = 0):
        from jax import export as jexport

        from structure_from_motion_tpu.models.incremental import IncrementalSfM

        _register_serialization()

        with np.load(path) as data:
            meta = json.loads(bytes(data["__meta"]).decode())
            if meta["format_version"] != _FORMAT_VERSION:
                raise ValueError(
                    f"artifact format {meta['format_version']} != "
                    f"{_FORMAT_VERSION}"
                )
            K = data["__K"]
            self._exports = {
                name: jexport.deserialize(bytes(data[f"prog_{name}"]))
                for name in meta["programs"]
            }
        cfg = PipelineConfig.from_json(json.dumps(meta["config"]))
        self.platforms = meta["platforms"]

        # host-side orchestration (window policy, archive, keyframe
        # bookkeeping) is reused from the live engine; only the device
        # programs are swapped for the exported ones
        inner = IncrementalSfM(
            cfg, K, frontend=meta["frontend"], seed=seed,
            collect_metrics=False,
        )
        inner.image_shape = tuple(meta["image_shape"])
        inner.image_dtype = np.dtype(meta.get("image_dtype", "float32"))
        e = self._exports
        inner._jit_frame_step = e["frame_step"].call
        inner._jit_reproj = e["reproj"].call
        inner._jit_evict = e["evict"].call
        if "frame_step_native" in e:
            inner._jit_frame_step_native = e["frame_step_native"].call
        if "assess" in e:
            inner._jit_assess = e["assess"].call
        if "assess_native" in e:
            inner._jit_assess_native = e["assess_native"].call
        self._finalize_call = e["finalize"].call
        # commit the initial state to the device NOW: exported calls lower
        # through jit(call_exported), whose cache keys on argument
        # SHARDINGS — the first frame would otherwise see uncommitted host
        # arrays (UnspecifiedValue) and the second frame the committed
        # device outputs (SingleDeviceSharding), compiling the identical
        # module TWICE (measured: served cold start paid 2 x ~120 s;
        # root-caused via JAX_LOG_COMPILES, SERVE_DIAG_r05.json)
        import jax

        # an explicit device COMMITS the arrays; device_put with no device
        # keeps them uncommitted and the double compile remains
        inner.state = jax.device_put(inner.state, jax.devices()[0])
        self._inner = inner

    # -- feeding / results: delegate to the inner engine -------------------
    def __getattr__(self, name):
        return getattr(self._inner, name)

    def finalize(self, iterations: int = 10):
        if iterations != 10:
            raise ValueError(
                "the exported finalize program is baked at 10 iterations"
            )
        self._inner.state, costs, _, _, _ = self._finalize_call(self._inner.state)
        return np.asarray(costs)


def load_engine(path: str, seed: int = 0) -> ServedSfM:
    """Load an :func:`export_engine` artifact into a served engine."""
    return ServedSfM(path, seed=seed)
