"""Checkpoint / resume for the reconstruction state.

The reference's only persistence is pickled per-image keypoint caches
(``view_processor.py:81-98``) and golden-result pickles. Here the ENTIRE
on-device reconstruction (track tables, map, observations, poses) is one
pytree, so checkpointing is a single savez/orbax round trip — resume
mid-sequence is exact.
"""

from __future__ import annotations

import os

import numpy as np

from structure_from_motion_tpu.models.tracks import SfMState


def save_state(
    path: str,
    state: SfMState,
    frame: int,
    archive=None,
    keyframes: tuple | None = None,
) -> None:
    """Write the full pipeline state to one ``.npz`` file.

    ``archive``: optional sequence of ``(C (3,), q (4,))`` pose pairs evicted
    by sliding-window mode (``IncrementalSfM._archive``). Without it a resume
    in slide mode would silently forget every pre-eviction camera pose.

    ``keyframes``: optional ``(keyframe_indices, next_input_index)`` from the
    keyframe-selection gate, so a resumed run keeps the exact accepted-input
    bookkeeping (input-file <-> view alignment).
    """
    from structure_from_motion_tpu.models.tracks import EvictionRecord

    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields}
    arrays["__frame"] = np.asarray(frame)
    if archive:
        for f in EvictionRecord._fields:
            # host stack: record leaves are host-cached (async-copied at
            # eviction, models/incremental._begin_frame) or numpy already
            arrays[f"__archive_{f}"] = np.stack(
                [np.asarray(getattr(r, f)) for r in archive]
            )
    if keyframes is not None:
        indices, next_input = keyframes
        arrays["__keyframe_indices"] = np.asarray(indices, np.int64)
        arrays["__next_input_index"] = np.asarray(next_input)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)


def load_state(path: str) -> tuple[SfMState, int, list, tuple]:
    """Load a state written by :func:`save_state`.

    Returns ``(state, frame, archive, keyframes)`` where ``archive`` is a
    list of host-numpy :class:`EvictionRecord` rows (empty when no poses
    were archived) and ``keyframes`` is ``(keyframe_indices, next_input_index)``
    (defaults to identity bookkeeping, ``(range(frame), frame)``, for
    checkpoints written before keyframe selection existed or with it off).
    """
    import jax.numpy as jnp

    with np.load(path) as data:
        frame = int(data["__frame"])
        # scalar int32 counters added to the schema after a checkpoint was
        # written (e.g. dropped_points/dropped_obs) default to zero so old
        # checkpoints stay loadable
        fields = {
            f: (
                jnp.asarray(data[f])
                if f in data
                else jnp.asarray(0, jnp.int32)
            )
            for f in SfMState._fields
        }
        if fields["K"].ndim == 2:
            # pre-per-view-intrinsics checkpoint: one shared (3, 3) K;
            # broadcast to the (V, 3, 3) schema
            V = fields["kp_xy"].shape[0]
            fields["K"] = jnp.broadcast_to(fields["K"], (V, 3, 3))
        # pre-pt_gid checkpoint: synthesise fresh (unique, stable-from-here)
        # global ids for the live points; the old archive carries no
        # observations anyway, so cross-eviction identity is unrecoverable
        if "pt_gid" not in data:
            M = fields["points"].shape[0]
            fields["pt_gid"] = jnp.where(
                fields["pt_valid"], jnp.arange(M, dtype=jnp.int32), -1
            )
            fields["next_gid"] = jnp.asarray(M, jnp.int32)
        archive = []
        if "__archive_C" in data:
            from structure_from_motion_tpu.models.tracks import EvictionRecord

            # archive records stay HOST numpy: every consumer reads them
            # host-side, and per-record device puts/slices each cost one
            # tunnel round trip (minutes over a 500-view archive)
            stacked = {
                f: np.asarray(data[f"__archive_{f}"])
                for f in EvictionRecord._fields
                if f"__archive_{f}" in data
            }
            n = stacked["C"].shape[0]
            Kk = fields["kp_xy"].shape[1]
            dt = stacked["C"].dtype

            def rec_field(f, i, empty_shape, fill):
                if f in stacked:
                    return stacked[f][i]
                return np.full(empty_shape, fill, dt) if fill == 0.0 else (
                    np.full(empty_shape, fill, np.int32)
                )

            archive = [
                EvictionRecord(
                    C=stacked["C"][i],
                    q=stacked["q"][i],
                    K=rec_field("K", i, (3, 3), 0.0),
                    gid=rec_field("gid", i, (Kk,), -1),
                    uv=rec_field("uv", i, (Kk, 2), 0.0),
                    X=rec_field("X", i, (Kk, 3), 0.0),
                    valid=stacked["valid"][i]
                    if "valid" in stacked
                    else np.zeros((Kk,), bool),
                )
                for i in range(n)
            ]
        if "__keyframe_indices" in data:
            keyframes = (
                [int(i) for i in data["__keyframe_indices"]],
                int(data["__next_input_index"]),
            )
        else:
            keyframes = (list(range(frame)), frame)
    return SfMState(**fields), frame, archive, keyframes


def save_features_cache(path: str, xy, desc, valid) -> None:
    """Per-image feature cache (the reference's ``write_keys`` concept,
    ``view_processor.py:81-98``, without pickle's fragility)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(
            f, xy=np.asarray(xy), desc=np.asarray(desc), valid=np.asarray(valid)
        )
    os.replace(tmp, path)


def load_features_cache(path: str):
    with np.load(path) as d:
        return d["xy"], d["desc"], d["valid"]
