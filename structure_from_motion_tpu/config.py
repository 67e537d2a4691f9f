"""Configuration tree for the TPU SfM pipeline.

The reference scatters configuration over constructor scalars and a
``RansacConfig`` that auto-raises its iteration count and seeds the *global*
``random`` module (reference ``utils.py:129-174``). Here the whole pipeline is
configured by one JSON-serialisable dataclass tree; randomness is threaded
explicitly through ``jax.random`` keys; iteration counts are static Python
ints so every kernel compiles to a fixed trace.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Any


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Batched-hypothesis RANSAC configuration.

    Mirrors the *semantics* of the reference ``RansacConfig``
    (``utils.py:129-174``): if the user-supplied ``iteration`` is lower than
    the statistically required count
    ``log(1 - subset_confidence) / log(1 - sample_confidence ** sample_num)``
    it is raised to that count. Unlike the reference (a sequential Python
    loop over hypotheses), the TPU implementation evaluates *all* hypotheses
    as one batch: ``iteration`` becomes the hypothesis-batch size.
    """

    inlier_threshold: float = 1e-3
    subset_confidence: float = 0.99
    sample_confidence: float = 0.75
    sample_num: int = 8
    iteration: int = 300
    seed: int = 0
    # > 0: rank hypotheses on a random subset of this many valid
    # correspondences instead of all of them (the (hypotheses x points)
    # scoring matrix is the RANSAC bandwidth cost); the winner is always
    # re-scored exactly on the full set. Subsampling only perturbs
    # near-tie hypothesis ranking — consensus argmax is robust to it.
    score_subset: int = 0

    def required_iterations(self) -> int:
        denom = math.log(1.0 - self.sample_confidence**self.sample_num)
        if denom >= 0.0:
            return self.iteration
        return int(math.ceil(math.log(1.0 - self.subset_confidence) / denom))

    @property
    def num_hypotheses(self) -> int:
        """Static hypothesis-batch size (>= statistically required count)."""
        return max(self.iteration, self.required_iterations())


@dataclasses.dataclass(frozen=True)
class LMConfig:
    """Levenberg-Marquardt settings for the nonlinear refiners.

    The reference defines-but-never-uses an ``LMConfig`` (``utils.py:109-125``)
    and instead hardcodes fixed-damping, fixed-iteration loops. We make the
    config real: ``damping`` is the (fixed) lambda added to the normal
    equations, ``iterations`` the static unrolled/scanned step count.
    ``adaptive`` switches on classic lambda up/down adaptation (an intentional
    improvement over the reference; off by default for behavioural parity).
    """

    damping: float = 5.0
    iterations: int = 100
    adaptive: bool = False
    damping_up: float = 2.0
    damping_down: float = 0.5


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """TPU-native feature detection/description settings.

    Replaces the reference's OpenCV SIFT/ORB frontend
    (``view_processor.py:103-137``) with an on-device DoG detector +
    gradient-histogram descriptor. ``max_keypoints`` fixes the per-view key
    capacity so all downstream shapes are static.
    """

    detector: str = "dog"  # "dog" | "harris" | "oracle_sift" (tests only)
    max_keypoints: int = 2048
    num_octaves: int = 4
    # detect octave -1 on a 2x bilinear-upsampled image (cv2-SIFT's default
    # behaviour): fine keypoints localise to half-pixel precision at the
    # cost of one 4x-sized pyramid level. DEFAULT ON since round 4 —
    # accuracy is the default price (~1.1 px median reprojection on the
    # upenn gates vs ~1.7 px without); pass False for the throughput
    # config (bench.py reports both).
    upsample_first_octave: bool = True
    scales_per_octave: int = 3
    sigma0: float = 1.6
    contrast_threshold: float = 0.015
    edge_threshold: float = 10.0
    descriptor_dim: int = 128
    patch_size: int = 16
    # Gaussian-pyramid backend. "matmul": banded-matrix matmuls on the MXU
    # (bf16x3, ~f32-exact — measured 5.8e-8 vs a float64 oracle, ~10 ms
    # faster per frame than the conv path at 960x1280). "conv": XLA
    # separable convs on the VPU (bf16-rounded accumulation, ~2.5e-3
    # error). CPU always uses convs (dense band matrices are pure overhead
    # there). See bench notes: the two backends admit slightly different
    # keypoint top-k sets, which measurably moves single-sequence accuracy
    # metrics in either direction.
    blur_impl: str = "matmul"
    # MXU matmul precision of the pyramid blurs. "high" = bf16x3 passes
    # (1.5e-5 max error vs f64 on unit-range images); "fast" = single bf16
    # pass — ~3x less MXU time on the pyramid (the largest detect stage at
    # the 2x first octave) for ~1e-3 relative blur error, which shifts
    # near-threshold DoG candidates; quality gates arbitrate the default.
    blur_precision: str = "high"
    # per-octave candidate selection over the multi-million-entry response
    # maps. "exact" (default): lax.top_k full sort. "approx": the TPU
    # approx_max_k PartialReduce — ~6 ms/frame faster at 1024 kp, but its
    # index-binned reduction drops strong spatially-clustered keypoints
    # (measured up to -14% tracked map points / +0.2 px on upenn), so it is
    # opt-in for throughput-over-quality runs. "auto" = exact (kept so
    # configs can be forward-compatible). Cross-octave merges stay exact.
    topk: str = "exact"
    # block-local pre-reduction before the per-octave top-k: keep only the
    # strongest candidate per (scale layer, B x B pixel block). The full-map
    # top-k sort dominates detect wall time (measured 7.3 ms at 1280x960 and
    # 42.9 ms on the 2x-upsampled first octave); reducing per 8x8 block first
    # cuts the sort input ~60x and doubles as spatial non-max suppression —
    # at 1024 keypoints per 1.2M-pixel octave the per-block cap is far from
    # binding. 0 disables (bitwise round-2 behaviour).
    topk_block: int = 8
    # gradient-buffer packing for the orientation/descriptor sampling
    # gathers (row-latency-bound on TPU): "quad" packs all 4 bilinear taps
    # into one (rows, 8) row — ONE gather per sample set; "pair" packs the
    # 2 x-taps into (rows, 4) — two gathers — at half the buffer bytes
    # (use when HBM is tight, e.g. wide-batch vmap over large images).
    grad_pack: str = "quad"
    # storage dtype of that buffer. The build streams the whole pyramid
    # several times (HBM-bandwidth-bound) while the sampling gathers are
    # row-latency-bound, so "bf16" halves the dominant build cost; the
    # ~0.4% relative gradient error is invisible to the 36-bin orientation
    # histogram and the normalised/clipped descriptor (quality medians
    # unchanged on the upenn gates). "f32" restores exact round-3 numerics.
    grad_dtype: str = "bf16"
    # dtype of the separable 3x3x3 extremum window passes (pure HBM
    # bandwidth over the full DoG stack — the second-largest slice of the
    # accuracy-config detect). "bf16" halves it; the extremum test compares
    # the truncated copy against its own window max/min, so truncation only
    # reorders near-exact ties, which the contrast threshold filters.
    # "f32" restores exact numerics.
    extrema_dtype: str = "bf16"
    # candidate-response implementation. "auto": the fused Pallas kernel
    # (ops/features_pallas.py — extrema + contrast + edge + border in ONE
    # pass) on TPU for octaves with W%128==0 and H%8==0 (the largest
    # octaves, where the cost lives), XLA elsewhere; "pallas" forces the
    # kernel (interpret mode off-TPU, for tests); "xla" forces the
    # separable reduce_window path everywhere.
    extrema_impl: str = "auto"
    # orientation/descriptor sampling strategy. "rotated" (default): two
    # separate 16x16 sample passes (orientation window + per-orientation
    # rotated descriptor grid). "shared" (cv2-SIFT's structure): ONE
    # unrotated sigma-scaled grid serves both, offsets rotated into the
    # descriptor frame at binning time — ~40% fewer pyramid gather rows
    # (~1.6 ms faster accuracy-config detect) and free second-orientation
    # duplicates, and it measures quality-NEUTRAL on the upenn photo gates
    # (reprojection 1.169 vs 1.169 median over 8 seeds). It is NOT the
    # default because the 300-frame rendered-scene gate degrades (ATE
    # 1.6-1.9% rotated vs 3.5-32.7% shared across extrema dtypes): the
    # coarser 0.95-sigma unrotated sampling loses descriptor
    # discrimination on high-frequency synthetic texture. Opt in for
    # photographic throughput workloads.
    sampling: str = "rotated"
    # shared-grid geometry: G x G samples at `step` sigma spacing. 18 x
    # 0.95 spans +-8.1 sigma — covers the rotated 4x4-cell support
    # (corners at 8.5 sigma carry near-zero Gaussian weight) at a spacing
    # close to the rotated grid's 0.75 sigma.
    shared_grid: int = 18
    shared_grid_step: float = 0.95


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """Descriptor matching (reference ``key_tracker.py:82-85,254-344``).

    Brute-force matching becomes one (N, D) x (D, M) matmul on the MXU with a
    fused top-2 for the Lowe ratio test; ``cross_check`` keeps only mutual
    nearest neighbours.
    """

    ratio: float = 0.7
    cross_check: bool = False
    # distance/top-2 backend: "auto" uses the fused Pallas kernel on TPU for
    # the L2 metric when key capacities fit its tiling (ref keys: x256 or a
    # single x128 tile; que keys: x512 or a single x128 tile) and
    # cross_check is off (measured ~15% faster than the XLA matmul + top_k
    # path at 1-2k keys); "xla"/"pallas" force a path.
    impl: str = "auto"
    # "l2" for float descriptors (sift/dog), "hamming" for +-1 binary codes
    # (harris/brief) — the reference's L2-vs-Hamming BFMatcher switch
    # (key_tracker.py:82-85). Hamming is computed on the MXU as (D - a.b)/2.
    metric: str = "l2"
    use_fundamental_gate: bool = False
    # Thresholds are pixel Sampson distances (see ops/epipolar.py) — the
    # reference's 1e-2 / 1e-3 values were normalised algebraic errors.
    gate_ransac: RansacConfig = dataclasses.field(
        default_factory=lambda: RansacConfig(inlier_threshold=3.0, iteration=200)
    )


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """Bundle adjustment (reference ``ba_processor.py:274-439``).

    Schur-complement LM over [C(3), q(4)] camera blocks and XYZ point blocks.
    The reference materialises a dense ``block_diag`` of all point-block
    inverses (O((3M)^2) memory); here D stays a (M, 3, 3) batch, the reduced
    camera system is built by segment-sums over observations, and the whole
    step shards over the observation/point axis on a device mesh.
    """

    iterations: int = 3
    damping: float = 5.0  # initial lambda (the reference's fixed value)
    # Adaptive trust-region control (deliberate improvement: the reference
    # never adapts lambda and never rejects a step, ba_processor.py:376-416).
    # Each iteration evaluates the candidate cost; accepted steps shrink
    # lambda, rejected steps are discarded and grow it.
    adaptive: bool = True
    damping_down: float = 0.3
    damping_up: float = 4.0
    min_damping: float = 1e-8
    max_damping: float = 1e8
    huber_delta: float = 0.0  # 0 disables the robust loss (reference parity)
    fix_first_camera_gauge: bool = False  # reference leaves gauge free
    pcg_fallback_cameras: int = 256  # above this many cameras, solve S by PCG
    pcg_iterations: int = 64
    # residual/Jacobian/block assembly: "auto" uses the fused Pallas kernel
    # on TPU (falls back to XLA off-TPU or when the observation capacity is
    # not tile-aligned); "xla"/"pallas" force a path.
    assemble_impl: str = "auto"
    # PCG Schur matvec: "auto" fuses the per-CG x[cam] expansion and the
    # per-camera coupling reduction into Pallas one-hot MXU contractions on
    # TPU (tiered layout only, V <= 2048) — the XLA gathers they replace
    # are row-latency bound, ~6 ms/CG-iteration at whole-trajectory scale.
    # "xla" forces the gather path; "pallas" forces the kernel (interpreted
    # off-TPU, f32 — for parity tests).
    matvec_impl: str = "auto"
    # Observation layout inside the LM loop. "ell": observations are packed
    # once per BA call into a dense (points, ell_rows) table so every
    # point-axis reduction is a reshape+sum and the Schur coupling builds as
    # a one-hot MXU matmul — no scatter/segment-sum per iteration (TPU
    # scatters cost ~10 ms at 131k rows; dense sums run at HBM bandwidth).
    # "csr": the sorted observation stream + segment-sums (round-2 path).
    obs_layout: str = "ell"
    # Slots per point in the ELL table; 0 = the camera-slot count V (always
    # safe: the track table holds at most one observation per (view, point)
    # pair). Set explicitly when V is large but tracks are short — slots
    # beyond the true maximum track length only waste bandwidth, but a value
    # BELOW it silently drops the excess observations from BA unless
    # ell_tail absorbs them.
    ell_rows: int = 0
    # Hybrid-ELL spill capacity: observations beyond a point's first
    # ell_rows go into this many point-sorted CSR slots appended after the
    # ELL block (segment-summed — cheap when the tail is a small fraction
    # of the stream). Lets whole-trajectory BA keep ell_rows at the TYPICAL
    # track length even when a few revisited landmarks are observed by
    # hundreds of cameras. 0 = pure ELL (excess observations drop).
    ell_tail: int = 0
    # Camera-ELL reduction: > 0 enables a camera-major gather+reshape-sum
    # for every camera-axis reduction instead of the (O, V) one-hot matmul
    # — at hundreds of cameras the one-hot operand is ~1 GB of HBM traffic
    # PER PCG ITERATION. Must be >= the max number of observations of any
    # single camera (on its shard) or the excess silently drops; size it
    # host-side from the observation histogram. 0 = one-hot matmul.
    cam_rows: int = 0
    # Tiered ELL (obs_layout="tiered"): the observation stream arrives
    # PRE-PACKED (models/global_ba.pack_tiered) with points renumbered in
    # descending track-length order and partitioned into tiers; tier t
    # covers the next n_t points with rows_t slots each, stream offset =
    # cumulative n_t * rows_t. Every point-axis reduction is then a concat
    # of per-tier reshape-sums DIRECTLY in point order — no scatter, no
    # segment-sum, and no padding every point to the longest track (the
    # single-level hybrid's failure mode on power-law track histograms:
    # p50=2 / p95=236 / max=500 on a 500-frame revisit loop chose 106 rows
    # = 4x-padded stream PLUS an 85k-slot segment-summed tail inside the
    # CG loop). Static (hashable) tuple of (n_points, rows) pairs.
    tiers: tuple = ()


@dataclasses.dataclass(frozen=True)
class CapacityConfig:
    """Static capacities — the TPU substitute for the reference's growing
    hstack map (``triangulation_processor.py:21-28``) and ragged match lists.
    """

    max_views: int = 16
    max_keypoints: int = 2048
    max_points: int = 16384
    max_observations: int = 65536


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level config: one object wires the full incremental pipeline."""

    frontend: FrontendConfig = dataclasses.field(default_factory=FrontendConfig)
    # F-gated matching on by default (the reference main constructs its
    # KeyTracker UNgated, ba_processor.py:482-488, but gating measurably
    # stabilises PnP on feature-starved frames: upenn@1024kp goes from 28%
    # to 10% trajectory ATE)
    matcher: MatcherConfig = dataclasses.field(
        default_factory=lambda: MatcherConfig(
            ratio=0.75,
            use_fundamental_gate=True,
            gate_ransac=RansacConfig(inlier_threshold=3.0, iteration=128),
        )
    )
    # RANSAC for the fundamental matrix (reference main: 300 hypotheses; the
    # threshold here is a pixel Sampson distance, not the reference's
    # normalised algebraic 1e-3).
    fundamental_ransac: RansacConfig = dataclasses.field(
        default_factory=lambda: RansacConfig(inlier_threshold=2.0, iteration=300)
    )
    # RANSAC for PnP, pixel reprojection threshold (reference main: 8 px).
    # 1024 hypotheses (vs the reference's 300 sequential iterations): on TPU
    # the whole batch is one (H, 12, 12) SVD + one (H, N) scoring matmul, so
    # extra hypotheses are nearly free and buy robustness at low inlier
    # ratios where minimal 6-point DLT fits are noisy.
    pnp_ransac: RansacConfig = dataclasses.field(
        default_factory=lambda: RansacConfig(
            inlier_threshold=8.0, sample_num=6, iteration=1024,
            # the PnP candidate set is the whole-map union (V*K rows);
            # ranking 1024 hypotheses against a 2048-point sample scores
            # identically in consensus terms at a quarter of the
            # (hypotheses x points) bandwidth
            score_subset=2048,
        )
    )
    # LM iteration budgets: the reference runs 300/100 fixed iterations
    # (campose_processor.py:378-405, triangulation_processor.py:209-228);
    # 100/50 reaches the same upenn trajectory quality (golden e2e test) and
    # sequential scan length is pure latency on TPU.
    pnp_lm: LMConfig = dataclasses.field(
        default_factory=lambda: LMConfig(damping=5.0, iterations=100)
    )
    triangulation_lm: LMConfig = dataclasses.field(
        default_factory=lambda: LMConfig(damping=5.0, iterations=50)
    )
    # Huber delta is in normalised camera units (0.01 ~ 5.7 px at f=570);
    # robust loss on by default in the pipeline (off in raw BAConfig for
    # reference parity).
    ba: BAConfig = dataclasses.field(
        default_factory=lambda: BAConfig(huber_delta=0.01)
    )
    capacity: CapacityConfig = dataclasses.field(default_factory=CapacityConfig)
    window_size: int = 10  # reference `filter_size` (ba_processor.py:24)
    # what happens past window_size frames: "stop" = ignore them (the
    # reference's filter_size behaviour, ba_processor.py:44-46); "slide" =
    # evict the oldest view (archive its pose, drop its observations,
    # compact the map) and keep going — long-sequence mode (BASELINE.json
    # configs 4-5).
    window_mode: str = "stop"
    # map admission: max per-view reprojection error of a new point (px)
    triangulation_max_error_px: float = 8.0
    # map admission: minimum ray (parallax) angle of a new point (degrees)
    min_parallax_deg: float = 2.0
    # post-BA track management (absent in the reference: once a bad match
    # enters its map it poisons BA forever, ba_processor.py:222-261):
    # observations with reprojection error above this (or negative depth)
    # are dropped after every BA run, and points left with < 2 supporting
    # observations die. 0 disables.
    prune_max_error_px: float = 16.0
    # Keyframe selection for video input: a frame is admitted only when the
    # median optical displacement of its descriptor matches against the last
    # ACCEPTED frame is at least this many pixels (0 = off, every frame is a
    # keyframe — the reference's behaviour). Near-stationary frames carry no
    # parallax: they waste window slots, thin the triangulation baselines,
    # and in slide mode evict genuinely useful views. The flow statistic is
    # computed on device (models/incremental._assess_frame); skipping a
    # frame costs one detect+match dispatch and one scalar fetch.
    keyframe_min_flow_px: float = 0.0
    # Lens distortion coefficients (k1, k2, p1, p2[, k3]) in the OpenCV
    # Brown-Conrady convention; () = ideal pinhole (the reference's implicit
    # assumption — it has no distortion handling at all). When set, detected
    # keypoint coordinates are undistorted ON DEVICE at the feature-ingest
    # boundary (ops/distortion.py), so the whole downstream geometry stack
    # stays pinhole-exact.
    distortion: tuple = ()
    # distributed bundle adjustment: shard map points + observations over the
    # first N local devices (parallel/ba_sharded.py); cameras replicate and
    # the reduced camera system is psum-reduced once per LM iteration. 1 =
    # single-device. Requires capacity.max_points and max_observations to be
    # divisible by N. The reference has no distributed backend at all
    # (SURVEY.md section 5); this is the BASELINE.json north-star axis.
    ba_num_shards: int = 1
    # Capacity-adaptive BA bucketing: the point/observation stores are
    # prefix-packed (appends are contiguous, eviction/pruning compact), so
    # the per-frame BA can run on the smallest power-of-2 prefix bucket
    # that holds the LIVE counts instead of the full allocated capacity —
    # a lax.switch over statically-sliced variants, picked on device by
    # num_points/num_obs. Measured on the upenn config (1.8k live obs in a
    # 32k-slot store): 19 ms -> <4 ms for the 3-iteration BA. Costs one
    # extra compile per bucket. Under vmap (BatchedIncrementalSfM) the
    # bucket switch is hoisted OUT of the batch axis — one shared bucket
    # from the max live count across lanes — so bucketing works there too
    # (models/batched.py).
    ba_bucketing: bool = True
    # Same idea for the localization stage: the PnP 2D-3D candidate set and
    # the new-match triangulation candidate set live in (V*K)-sized flat
    # slabs but typically hold a few hundred live entries. With this on,
    # live candidates are packed to the front (one top_k) and the PnP
    # solve / triangulation LM run on the smallest power-of-2 bucket that
    # holds them (lax.switch). Under vmap the bucket choice is hoisted out
    # of the batch axis like ba_bucketing (models/batched.py).
    localize_bucketing: bool = True

    # -- (de)serialisation -------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "PipelineConfig":
        return _from_dict(cls, json.loads(text))


def _from_dict(klass: Any, data: Any) -> Any:
    if not dataclasses.is_dataclass(klass):
        return data
    fields = {f.name: f.type for f in dataclasses.fields(klass)}
    kwargs = {}
    for name, value in data.items():
        if name not in fields:
            continue
        ftype = {f.name: f for f in dataclasses.fields(klass)}[name].type
        target = _resolve_dataclass(ftype)
        if target:
            kwargs[name] = _from_dict(target, value)
        elif isinstance(value, list):
            # JSON has no tuples; every sequence field here is a tuple (the
            # configs must stay hashable for use as static jit arguments)
            kwargs[name] = tuple(value)
        else:
            kwargs[name] = value
    return klass(**kwargs)


def _resolve_dataclass(ftype: Any) -> Any:
    """Map a (possibly string) field annotation to a dataclass, else None."""
    known = {
        "RansacConfig": RansacConfig,
        "LMConfig": LMConfig,
        "FrontendConfig": FrontendConfig,
        "MatcherConfig": MatcherConfig,
        "BAConfig": BAConfig,
        "CapacityConfig": CapacityConfig,
        "PipelineConfig": PipelineConfig,
    }
    if isinstance(ftype, str):
        return known.get(ftype)
    if dataclasses.is_dataclass(ftype):
        return ftype
    return None
