"""Why does compiling the DESERIALIZED artifact cost ~2x the live path?

SERVE_r02.json measured: live trace+compile of the serve programs = 187 s,
but loading the jax.export artifact and compiling its StableHLO = 366 s on
the same chip. This script isolates WHERE the 2x appears for one program
(the finalize BA stage at production shapes) by timing each pipeline stage
separately and diffing the module text XLA actually receives:

    A. trace+lower          jax.jit(fn).lower(args)          (tracing cost)
    B. compile(live)        A.compile()                      (XLA, live module)
    C. export(fn)(args)     jax.export wrapping (no serialize round trip)
    D. compile(C.call)      first call of the un-serialized export
    E. serialize+deserialize+compile   the full artifact path serve.py uses

plus op histograms of the live lowered text vs the deserialized module
text — if the round trip denormalizes the program (e.g. VHLO upgrade
expands composites, drops mhlo attributes, or loses donation/layout
hints), the histogram diff names the ops responsible.

Writes SERVE_DIAG_r05.json. Run on the real TPU (no args).
"""

from __future__ import annotations

import collections
import functools
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _op_histogram(mlir_text: str) -> dict:
    ops = re.findall(r"= \"?([a-z_]+\.[a-zA-Z_0-9]+)", mlir_text)
    return dict(collections.Counter(ops))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from structure_from_motion_tpu import serve as S
    from structure_from_motion_tpu.config import (
        CapacityConfig,
        FrontendConfig,
        PipelineConfig,
    )
    from structure_from_motion_tpu.io import upenn_intrinsics
    from structure_from_motion_tpu.models import IncrementalSfM, incremental as I

    cfg = PipelineConfig(
        frontend=FrontendConfig(max_keypoints=1024, upsample_first_octave=False),
        capacity=CapacityConfig(
            max_views=8, max_keypoints=1024, max_points=8192,
            max_observations=32768,
        ),
    )
    engine = IncrementalSfM(cfg, upenn_intrinsics(), frontend="native")
    engine.image_shape = (960, 1280)
    st = engine.state
    import dataclasses

    fin_cfg = dataclasses.replace(
        cfg, ba=dataclasses.replace(cfg.ba, iterations=10)
    )
    if os.environ.get("SERVE_DIAG_PROGRAM", "finalize") == "frame_step_native":
        # the DOMINANT cold-start compile: the fused per-frame program
        # (detect -> match -> lax.switch(bootstrap/localize) -> metrics)
        args = S._example_args(engine)["frame_step_native"]
        fn = functools.partial(I._frame_step_native, config=cfg)
        prog_name = "frame_step_native (fused per-frame program)"
    else:
        args = (st,)
        fn = functools.partial(I._ba_stage, config=fin_cfg)
        prog_name = "finalize (_ba_stage, 10 LM iterations)"
    jfn = jax.jit(fn)

    out = {"program": prog_name, "backend": jax.default_backend()}

    t0 = time.perf_counter()
    lowered = jfn.lower(*args)
    out["A_trace_lower_s"] = round(time.perf_counter() - t0, 2)
    live_text = lowered.as_text()

    t0 = time.perf_counter()
    compiled = lowered.compile()
    out["B_compile_live_s"] = round(time.perf_counter() - t0, 2)
    del compiled

    S._register_serialization()
    from jax import export as jexport

    t0 = time.perf_counter()
    exported = jexport.export(jfn)(*args)
    out["C_export_wrap_s"] = round(time.perf_counter() - t0, 2)
    exported_text = exported.mlir_module()

    t0 = time.perf_counter()
    r = exported.call(*args)
    jax.block_until_ready(r)
    out["D_compile_unserialized_export_s"] = round(time.perf_counter() - t0, 2)
    del r

    t0 = time.perf_counter()
    blob = exported.serialize()
    out["E1_serialize_s"] = round(time.perf_counter() - t0, 2)
    out["E1_blob_kb"] = len(blob) // 1024
    t0 = time.perf_counter()
    reloaded = jexport.deserialize(blob)
    out["E2_deserialize_s"] = round(time.perf_counter() - t0, 2)
    reloaded_text = reloaded.mlir_module()
    t0 = time.perf_counter()
    r = reloaded.call(*args)
    jax.block_until_ready(r)
    out["E3_compile_deserialized_s"] = round(time.perf_counter() - t0, 2)

    h_live = _op_histogram(live_text)
    h_exp = _op_histogram(exported_text)
    h_re = _op_histogram(reloaded_text)
    def diff(a, b):
        keys = set(a) | set(b)
        return {
            k: [a.get(k, 0), b.get(k, 0)]
            for k in sorted(keys)
            if a.get(k, 0) != b.get(k, 0)
        }

    out["op_count_live"] = sum(h_live.values())
    out["op_count_exported"] = sum(h_exp.values())
    out["op_count_deserialized"] = sum(h_re.values())
    out["ops_changed_live_vs_exported"] = diff(h_live, h_exp)
    out["ops_changed_exported_vs_deserialized"] = diff(h_exp, h_re)
    out["module_kb"] = {
        "live": len(live_text) // 1024,
        "exported": len(exported_text) // 1024,
        "deserialized": len(reloaded_text) // 1024,
    }

    suffix = "_frame" if os.environ.get("SERVE_DIAG_PROGRAM") == "frame_step_native" else ""
    path = os.path.join(os.path.dirname(__file__), "..", f"SERVE_DIAG{suffix}_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"-> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
