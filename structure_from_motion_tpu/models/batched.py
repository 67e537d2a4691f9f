"""Batched incremental SfM: reconstruct B sequences concurrently.

``vmap`` of the whole fused frame step over a leading sequence axis: B
reconstructions advance in lockstep with one dispatch per frame index.

What batching actually buys (measured on a v5e, 2026-08-17): a SINGLE
sequence at production shapes (1024 keypoints, full-resolution pyramid)
already keeps the chip ~60% busy — detect at B=8 costs 5.0x B=1, the
geometry stack 5.2x — so the aggregate throughput gain at B=8 is ~1.5x,
NOT Bx. The honest use cases are therefore (a) amortising host round-trip
latency over many SMALL sequences/windows, (b) multi-camera rigs wanting
lockstep convenience, and (c) squeezing the last ~50% of device utilisation
in offline mapping. For raw per-sequence speed, run sequences one at a
time.

Sliding-window mode (``config.window_mode="slide"``) is supported: past the
window every lane evicts its oldest view in lockstep (one vmapped eviction
dispatch) and the evicted poses are archived per sequence, exactly like the
single-sequence engine.

Per-lane RNG matches the single-sequence engine: lane ``b`` constructed
with seed ``s_b`` draws the same ``fold_in(key(s_b), frame)`` keys as
``IncrementalSfM(..., seed=s_b)``, so a batched run is reproducible
against B separate single runs (the determinism-across-batching analogue
of the sharding parity tests).

No reference analogue (the reference is strictly single-sequence,
``ba_processor.py:43-270``); this is a deliberate capability extension.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from structure_from_motion_tpu.config import PipelineConfig
from structure_from_motion_tpu.models import tracks
from structure_from_motion_tpu.models.incremental import (
    _frame_step,
    _frame_step_native,
)
from structure_from_motion_tpu.utils.rotations import quat_to_rotation


@functools.partial(jax.jit, static_argnames=("config",))
def _batched_frame_step_native(states, v, keys, imgs, config):
    return jax.vmap(
        lambda s, k, im: _frame_step_native(s, v, k, im, config=config)
    )(states, keys, imgs)


@functools.partial(jax.jit, static_argnames=("config",))
def _batched_frame_step(states, v, keys, xy, desc, valid, config):
    return jax.vmap(
        lambda s, k, x, d, m: _frame_step(s, v, k, x, d, m, config=config)
    )(states, keys, xy, desc, valid)


_evict_batched = jax.jit(jax.vmap(tracks.evict_oldest_view))


class BatchedIncrementalSfM:
    """B independent reconstructions advanced in lockstep (one dispatch per
    frame index for the whole batch)."""

    def __init__(
        self,
        config: PipelineConfig,
        K,
        batch: int,
        frontend: str = "native",
        seed=0,
    ):
        if config.frontend.max_keypoints != config.capacity.max_keypoints:
            raise ValueError("frontend.max_keypoints must equal capacity.max_keypoints")
        if config.ba_num_shards > 1:
            raise NotImplementedError(
                "BatchedIncrementalSfM does not support ba_num_shards > 1 "
                "(a vmapped shard_map would nest batch and mesh axes); use "
                "the single-sequence IncrementalSfM for distributed BA"
            )
        if config.keyframe_min_flow_px > 0:
            raise NotImplementedError(
                "keyframe selection is per-lane data-dependent (lanes would "
                "admit different frames and fall out of lockstep); use the "
                "single-sequence IncrementalSfM for keyframed video"
            )
        if config.ba_bucketing or config.localize_bucketing:
            # under vmap a lax.switch lowers to "execute every branch and
            # select", so the adaptive buckets would COST instead of save;
            # run the batch at full capacity
            config = dataclasses.replace(
                config, ba_bucketing=False, localize_bucketing=False
            )
        self.config = config
        self.batch = batch
        self.frontend = frontend
        # K: (3,3) shared, (B,3,3) per-lane, or (B,V,3,3) per-lane-per-view
        # (the state schema stores per-view intrinsics)
        K = np.asarray(K)
        V = config.capacity.max_views
        if K.ndim == 2:
            K = np.broadcast_to(K, (batch, V, 3, 3))
        elif K.ndim == 3:
            K = np.broadcast_to(K[:, None], (batch, V, 3, 3))
        single = tracks.init_state(
            config.capacity, np.zeros((3, 3)), desc_dim=config.frontend.descriptor_dim
        )
        self.states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), single
        )._replace(K=jnp.asarray(K, single.K.dtype))
        # one base PRNG key per lane; lane b with seed s_b draws exactly the
        # keys IncrementalSfM(seed=s_b) would (fold_in per frame)
        seeds = (
            np.arange(seed, seed + batch)
            if np.ndim(seed) == 0
            else np.asarray(seed)
        )
        if seeds.shape != (batch,):
            raise ValueError(f"need one seed per lane; got {seeds.shape}")
        self._base_keys = jax.vmap(jax.random.key)(jnp.asarray(seeds))
        self._frame = 0
        self._window = min(config.capacity.max_views, config.window_size)
        # archived (evicted) poses per frame: list of ((B,3) C, (B,4) q)
        self._archive: list = []

    def _begin_frame(self, v: int):
        """Window policy (mirrors ``IncrementalSfM._begin_frame``): the
        device slot for frame v, or None to skip ("stop" mode past the
        window). In "slide" mode every lane evicts its oldest view in one
        vmapped dispatch and the evicted poses are archived."""
        if v < self._window:
            return v
        if self.config.window_mode != "slide":
            return None
        self.states, ev_C, ev_q = _evict_batched(self.states)
        self._archive.append((ev_C, ev_q))
        return self._window - 1

    def _frame_keys(self, v: int):
        return jax.vmap(jax.random.fold_in, in_axes=(0, None))(
            self._base_keys, v
        )

    def process_images(self, imgs) -> dict:
        """``imgs``: (B, H, W) — frame ``t`` of every sequence."""
        if self.frontend != "native":
            raise RuntimeError("process_images requires the native frontend")
        v = self._frame
        slot = self._begin_frame(v)
        if slot is None:
            return {"skipped": True, "frame": v}
        self.states, info = _batched_frame_step_native(
            self.states, jnp.asarray(slot), self._frame_keys(v),
            jnp.asarray(imgs), config=self.config,
        )
        self._frame = v + 1
        info["frame"] = v
        return info

    def process_features(self, xy, desc, valid) -> dict:
        """(B, K, 2), (B, K, D), (B, K) feature batches for frame ``t``."""
        v = self._frame
        slot = self._begin_frame(v)
        if slot is None:
            return {"skipped": True, "frame": v}
        dtype = self.states.kp_xy.dtype
        self.states, info = _batched_frame_step(
            self.states,
            jnp.asarray(slot),
            self._frame_keys(v),
            jnp.asarray(xy, dtype),
            jnp.asarray(desc, dtype),
            jnp.asarray(valid, bool),
            config=self.config,
        )
        self._frame = v + 1
        info["frame"] = v
        return info

    # -- results -----------------------------------------------------------
    def poses(self):
        """(locs (B,F,3), rots (B,F,3,3)) for ALL processed frames
        (archived evicted poses + the live window)."""
        n = min(self._frame, self._window)
        C = np.asarray(self.states.cam_C)[:, :n]
        R = np.asarray(quat_to_rotation(self.states.cam_q[:, :n]))
        if self._archive:
            Ca = np.stack([np.asarray(c) for c, _ in self._archive], axis=1)
            qa = jnp.stack([q for _, q in self._archive], axis=1)  # (B, A, 4)
            Ra = np.asarray(quat_to_rotation(qa))
            C = np.concatenate([Ca, C], axis=1)
            R = np.concatenate([Ra, R], axis=1)
        return C, R

    def map_points(self, b: int):
        X = np.asarray(self.states.points[b])
        return X[np.asarray(self.states.pt_valid[b])]
