"""Batched incremental SfM: reconstruct B sequences concurrently.

``vmap`` of the whole fused frame step over a leading sequence axis: B
reconstructions advance in lockstep with one dispatch per frame index.

Capacity-adaptive bucketing WORKS under batching: a per-lane ``lax.switch``
would lower to execute-every-branch under ``vmap``, so instead the frame
branch and the bucket levels are hoisted OUT of the vmap —
``_batched_step_impl`` picks ONE shared bucket from the MAX live count
across lanes (a cross-lane reduction is an unbatched scalar, so the switch
stays a real switch) and each branch vmaps the per-lane work at that
bucket. Lanes advance in lockstep through the same frame index, so their
live counts track each other and the shared bucket stays tight.

What batching actually buys (measured on a v5e): a SINGLE sequence at
production shapes already keeps the chip busy — detect at B=8 costs ~5x
B=1 — so aggregate throughput gain at B=8 is well below Bx. The honest
use cases are (a) amortising host round-trip latency over many SMALL
sequences/windows, (b) multi-camera rigs wanting lockstep convenience,
and (c) squeezing the last fraction of device utilisation in offline
mapping. For raw per-sequence speed, run sequences one at a time.

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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from structure_from_motion_tpu.config import PipelineConfig
from structure_from_motion_tpu.models import tracks
from structure_from_motion_tpu.models.incremental import (
    _ba_bucket_index,
    _ba_ladder,
    _ba_stage,
    _bootstrap_stage,
    _bucket_index,
    _bucket_ladder,
    _localize_bucket_counts,
    _localize_stage,
    _match_stage,
    _zero_info,
    pipeline_reprojection_error,
)
from structure_from_motion_tpu.ops.features import detect_and_describe
from structure_from_motion_tpu.utils.rotations import quat_to_rotation


def _batched_step_impl(states, v, keys, xy, desc, valid, config):
    """One device program for a whole batched frame.

    Mirrors ``incremental._frame_step`` stage for stage, but hoists every
    ``lax.switch`` predicate OUT of the vmap: under ``vmap`` a switch on a
    per-lane (batched) predicate lowers to "execute every branch and
    select", so the capacity-adaptive buckets would cost instead of save.
    Here the frame branch (``min(v, 2)`` — the same for all lanes by
    construction) and the bucket levels (computed from the MAX live count
    across lanes, a cross-lane reduction = unbatched scalar) select real
    branches, and each branch vmaps the per-lane work at ONE shared bucket.
    A lane below the shared bucket just pads — exactly what the
    single-sequence engine does within a bucket level.
    """
    B = valid.shape[0]

    def ingest(s, k, x, d, m):
        if any(config.distortion):
            from structure_from_motion_tpu.ops.distortion import (
                undistort_pixels,
            )

            x = undistort_pixels(x, s.K[v], config.distortion)
        s = tracks.set_view_features(s, v, x, d, m)
        k_match, k_stage = jax.random.split(k)
        s = _match_stage(s, v, k_match, config=config)
        return s, k_stage

    states, k_stage = jax.vmap(ingest)(states, keys, xy, desc, valid)

    def binfo(sts):
        zi = _zero_info(jax.tree_util.tree_map(lambda a: a[0], sts), config)
        return jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), zi
        )

    def frame0(sts, ks):
        dtype = sts.cam_C.dtype

        def pin(s):
            return tracks.set_camera(
                s, 0, jnp.zeros(3, dtype), jnp.asarray([1.0, 0, 0, 0], dtype)
            )

        return jax.vmap(pin)(sts), binfo(sts)

    def frame1(sts, ks):
        sts, si = jax.vmap(
            lambda s, k: _bootstrap_stage(s, k, config=config)
        )(sts, ks)
        info = binfo(sts)
        info.update(
            matches=si["matches"].astype(jnp.int32),
            f_inliers=si["f_inliers"].astype(jnp.int32),
            cheirality_counts=si["cheirality_counts"].astype(jnp.int32),
            new_points=si["new_points"].astype(jnp.int32),
        )
        return sts, info

    def frame_n(sts, ks):
        V, Kk = sts.tri_index.shape[1:]
        ladder = (
            _bucket_ladder(V * Kk, floor=2048)
            if config.localize_bucketing
            else [V * Kk]
        )
        if len(ladder) > 1:
            pnp_cnt, tri_ub = jax.vmap(
                _localize_bucket_counts, in_axes=(0, None)
            )(sts, v)
            lvl = jnp.minimum(
                _bucket_index(jnp.max(pnp_cnt), ladder),
                _bucket_index(jnp.max(tri_ub), ladder),
            )

            def mk_loc(L):
                def branch(ss, kk):
                    return jax.vmap(
                        lambda s, k: _localize_stage(
                            s, v, k, config=config, bucket_level=L
                        )
                    )(ss, kk)

                return branch

            sts, si = jax.lax.switch(
                lvl, [mk_loc(L) for L in range(len(ladder))], sts, ks
            )
        else:
            sts, si = jax.vmap(
                lambda s, k: _localize_stage(s, v, k, config=config)
            )(sts, ks)

        if config.ba_bucketing:
            ba_ladder = _ba_ladder(
                sts.points.shape[1], sts.obs_cam.shape[1]
            )
            idx = _ba_bucket_index(
                ba_ladder, jnp.max(sts.num_points), jnp.max(sts.num_obs)
            )

            def mk_ba(L):
                def branch(ss):
                    return jax.vmap(
                        lambda s: _ba_stage(s, config=config, bucket_level=L)
                    )(ss)

                return branch

            sts, costs, ba_dropped, pruned_o, pruned_p = jax.lax.switch(
                idx, [mk_ba(L) for L in range(len(ba_ladder))], sts
            )
        else:
            sts, costs, ba_dropped, pruned_o, pruned_p = jax.vmap(
                lambda s: _ba_stage(s, config=config)
            )(sts)

        info = binfo(sts)
        info.update(
            matches=si["matches"].astype(jnp.int32),
            pnp_candidates=si["pnp_candidates"].astype(jnp.int32),
            pnp_inliers=si["pnp_inliers"].astype(jnp.int32),
            new_points=si["new_points"].astype(jnp.int32),
            ba_costs=costs,
            ba_dropped_obs=ba_dropped,
            pruned_obs=pruned_o,
            pruned_points=pruned_p,
        )
        return sts, info

    states, info = jax.lax.switch(
        jnp.minimum(v, 2), [frame0, frame1, frame_n], states, k_stage
    )
    info["reprojection_px"] = jax.vmap(pipeline_reprojection_error)(states)
    info["dropped_points"] = states.dropped_points
    info["dropped_obs"] = states.dropped_obs
    return states, info


@functools.partial(jax.jit, static_argnames=("config",))
def _batched_frame_step_native(states, v, keys, imgs, config):
    def detect(im):
        kps, d = detect_and_describe(im, config.frontend)
        return kps.xy, d, kps.mask

    xy, desc, valid = jax.vmap(detect)(imgs)
    return _batched_step_impl(states, v, keys, xy, desc, valid, config)


@functools.partial(jax.jit, static_argnames=("config",))
def _batched_frame_step(states, v, keys, xy, desc, valid, config):
    return _batched_step_impl(states, v, keys, xy, desc, valid, config)


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
        self.states, rec = _evict_batched(self.states)
        self._archive.append((rec.C, rec.q))
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
