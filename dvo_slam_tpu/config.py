"""Configuration dataclasses.

TPU-native equivalent of the reference's per-layer config structs:
  - ``DenseTracker::Config`` (reference: dvo_core/include/dvo/dense_tracking.h)
  - ``dvo_slam::Config``     (reference: dvo_slam/include/dvo_slam/config.h)

Frozen + hashable so they can be passed as static arguments to ``jax.jit``;
every numeric threshold that participates in traced computation is baked into
the compiled program (the reference rebuilds trackers on dynamic_reconfigure;
we recompile — same semantics, offline).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# ---------------------------------------------------------------------------
# Robust-weighting selectors (reference: dvo_core/include/dvo/core/
# weight_calculation.h — ScaleEstimators::enum_t / InfluenceFunctions::enum_t)
# ---------------------------------------------------------------------------
SCALE_ESTIMATORS = ("unit", "normal", "mad", "tdist")
INFLUENCE_FUNCTIONS = ("unit", "huber", "tukey", "tdist")


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Dense-tracker knobs (reference: DenseTracker::Config).

    Pyramid level indices follow the reference convention: level 0 is full
    resolution (640x480), higher = coarser. ``first_level`` is the coarsest
    level tracked, ``last_level`` the finest. Reference defaults are
    FirstLevel=3, LastLevel=1 — the full-resolution level is NOT tracked by
    default (SURVEY.md §4.4).
    """

    num_levels: int = 4
    first_level: int = 3
    last_level: int = 1

    max_iterations: int = 50
    # Convergence: stop when ||delta_xi||_2 < precision
    # (reference Config::Precision default 5e-7; we run f32 on device so use
    # a tolerance achievable in single precision — ATE parity is the
    # contract, not iteration-count parity; SURVEY.md §8.3.4).
    precision: float = 1e-6

    # Pose prior weight (reference Config::Mu). 0 = disabled.
    mu: float = 0.0

    # Seed each frame's alignment with the previous relative motion
    # (reference Config::UseInitialEstimate, constant-velocity model).
    # Consumed by the sequence/SLAM orchestrators, not by track() itself.
    use_initial_estimate: bool = True

    # Robust weighting (reference Config::UseWeighting + estimator/influence
    # selection). The default bivariate t-distribution path corresponds to
    # scale_estimator="tdist" + influence="tdist" with dof=5
    # (TDistributionScaleEstimator::DEFAULT_DOF).
    use_weighting: bool = True
    scale_estimator: str = "tdist"
    influence: str = "tdist"
    tdist_dof: float = 5.0
    # Fixed-point iterations for the bivariate scale-matrix estimate
    # (reference iterates to convergence; a fixed small count is
    # jit-friendly and converges in practice).
    tdist_scale_iters: int = 5
    # Warm-started fixed-point count: after the first IRLS iteration of a
    # level, seed the scale estimate from the previous iteration's Sigma
    # (the reference's TDistributionScaleEstimator keeps its estimate
    # across iterations too) and run only this many steps. 0 disables
    # (every iteration runs tdist_scale_iters from the moment estimate).
    tdist_scale_warm_iters: int = 0
    huber_k: float = 1.345
    tukey_b: float = 4.6851
    # Sensor-noise floor on the residual scale estimates. Without it the
    # bivariate Sigma fixed point collapses on noise-free (synthetic or
    # well-fit) data — e.g. sigma_Z -> 1e-5 m gives the depth channel a
    # precision of ~1e10, numerically drowning the intensity channel in f32
    # and locking the optimizer onto depth-degenerate directions (in-plane
    # sliding over planar scenes). 0.5 intensity levels ~ 8-bit
    # quantization; 1 mm ~ Kinect depth noise floor.
    min_intensity_sigma: float = 0.5
    min_depth_sigma: float = 1e-3

    # Point selection thresholds on the *reference* frame's gradients
    # (reference Config::IntensityDerivativeThreshold /
    # DepthDerivativeThreshold; ValidPointAndGradientThresholdPredicate).
    intensity_grad_threshold: float = 0.0
    depth_grad_threshold: float = 0.0

    # Collect fixed-shape per-iteration statistics (valid-constraint count,
    # acceptance NLL, increment norm, accept flag, per-level termination
    # reason) in TrackResult.stats — parity with the reference's
    # IterationStats/LevelStats/Stats (dvo_core/include/dvo/
    # dense_tracking.h). Negligible device cost; False drops the arrays
    # from the result pytree entirely.
    collect_stats: bool = True

    # Use the geometric (depth) residual in addition to the photometric one
    # — the bivariate path of ICRA13/IROS13. False = photometric-only
    # (BASELINE.json config #1).
    use_depth: bool = True

    # Bilinear sampling backend for the IRLS hot loop:
    #   "gather" — XLA row-gather (portable; CPU/TPU)
    #   "pallas" — fused MXU one-hot window sampler (TPU; ops/pallas/sampler)
    # The pallas path masks points whose warped row leaves a
    # (pallas_margin)-row window around each reference band — coarse
    # levels use whole-image windows, so defaults are safe for tracking
    # and validation alike.
    sampler_backend: str = "gather"
    pallas_rows_per_tile: int = 8
    # Target reference COLUMNS per sampling tile (round-4 2-D windowing).
    # Bounding each tile's column span lets the kernel contract a
    # 128-aligned ~(round128(cols + 2*margin) + 128)-lane window instead
    # of the full padded image width. MEASURED NEGATIVE at 320x240
    # (bench/micro_linearize.py, docs/performance.md): the aligned-window
    # slice + finer grid granularity cost as much as the smaller one-hot
    # saves (full iter 266 us at 0 vs 273-314 us at 40..160), so column
    # windows are DISABLED by default; the option remains for
    # full-resolution tracking (level 0: window 256 vs 768 lanes) and
    # future hardware. The largest feasible divisor of the level width
    # <= this is used; levels whose width cannot satisfy the feasibility
    # constraints fall back to full-width bands automatically
    # (ops/pallas/sampler.select_tiling).
    pallas_cols_per_tile: int = 0
    # Window margin in rows. Sampling cost scales with the window height
    # (Hw = round_up(rows_per_tile + 2*margin + 2, 8) + 8): measured
    # 640x480 odometry fps 700 / 773 / 806 / 840 at margin 16 / 8 / 4 / 3
    # (v5e). Margin 3 (Hw = 24) still leaves +-9 rows of residual-motion
    # slack per band after the mean-row centering — above fine-level
    # residuals once the coarse levels have aligned, and verified on the
    # heavy-noise accuracy harness (identical iteration counts, both ATE
    # gates pass, 22 loop edges accepted vs 15 at margin 4). Raise for
    # unusually violent motion; margin 2 starts masking real points
    # (measured ATE degradation).
    pallas_margin: int = 3
    # Self-defence against silent window masking: when more than this
    # fraction of selected points is masked by the pallas row window at
    # the finest level of a SLAM dual-alignment, the frame is re-tracked
    # with the exact gather backend (dense_tracker.track_batched_
    # escalating — used by the per-frame engine and the device scan).
    # 0 disables. Escalation costs one gather re-track on the (rare)
    # violent-motion frames only; the compiled program carries both paths.
    pallas_miss_escalate: float = 0.02
    # MXU precision of the one-hot sampling matmul: "default" (single bf16
    # pass; sampling quantization ~2^-9 relative ~ Kinect depth noise at
    # 2 m, absorbed by the Sigma estimate) or "highest" (6-pass, exact to
    # f32, ~3x slower sampling).
    pallas_precision: str = "default"

    # Image-gradient source for the Jacobian (SURVEY.md §4.2):
    #   "current"   — sample grad I2 / grad Z2 bilinearly at the warped
    #                 coords every IRLS iteration (the reference's exact
    #                 formulation: dense_tracking_impl.cpp packs current-
    #                 frame gradients into the acceleration structure).
    #   "reference" — use the reference frame's precomputed gradients at
    #                 the selected pixels, constant across the level's
    #                 iterations. Near convergence I2(x') == I1(x), so the
    #                 gradients agree to first order (the classic
    #                 LK/ESM-style approximation); the per-iteration
    #                 bilinear sample shrinks from 6+mask to I,Z+mask
    #                 channels, cutting the one-hot sampling matmul — the
    #                 dominant cost of every IRLS iteration — ~2.3x.
    #                 Equivalent on the synthetic-warp recovery tests;
    #                 passes every full-scale accuracy-harness gate with
    #                 a modest ATE cost on the heavy-noise torture run
    #                 (10.4 mm slam vs 7.1 mm exact; odometry 24.9 vs
    #                 23.3 mm) — a speed/accuracy knob, default off.
    gradient_source: str = "current"

    # Point compaction (round 4; the reference's own trick — PointSelection
    # materializes COMPACTED per-level arrays of selected points,
    # dvo_core/src/core/point_selection.cpp — whereas this rebuild's
    # default is a mask over the full grid, SURVEY.md §8.1). With a budget
    # fraction f > 0, prepare_reference compacts the selected points
    # (stable row-major order, so spatial locality survives for the pallas
    # window sampler) into a static bucket of round_up(f * N) slots per
    # level; every per-iteration cost that scales with point count — the
    # one-hot sampling matmul AND its VPU one-hot construction (the
    # measured dominant cost), the warp, the Jacobian planes, the fused
    # (6,2N)x(2N,6) contraction — shrinks by ~f. When more points pass
    # selection than the budget holds, they are decimated UNIFORMLY in
    # row-major order (monotone stable subsample — never a top-of-image
    # truncation); when fewer, the tail is padded with replicas of the
    # last point, masked unselected. 0 disables (exact reference-parity
    # masking semantics: every valid pixel contributes). Pays on real
    # data (depth holes, gradient thresholds); a no-op win on dense
    # synthetic frames only with thresholds enabled. Deviation ledger:
    # docs/fr1_desk_protocol.md (decimation when budget < selected).
    point_budget_fraction: float = 0.0
    # Flat-tile row window for the pallas sampler under compaction: the
    # assumed reference-row span of one 2048-point tile. 0 = auto
    # (ceil(2048 / (point_budget_fraction * W)) — exact when selection
    # density ~= the budget fraction; sparser selections spread over more
    # rows and lose points to window misses, which TrackStats.window_miss
    # surfaces and pallas_miss_escalate rescues). Set explicitly when the
    # selection density is known to differ from the budget.
    pallas_compact_window_rows: int = 0

    # Levenberg-Marquardt damping. 0 disables (pure Gauss-Newton with
    # error-increase rollback, the reference behaviour); >0 enables the
    # adaptive-lambda LM loop (BASELINE.json config #3).
    lm_lambda_init: float = 0.0
    lm_lambda_up: float = 4.0
    lm_lambda_down: float = 0.5
    lm_lambda_max: float = 1e4

    def __post_init__(self):
        if self.scale_estimator not in SCALE_ESTIMATORS:
            raise ValueError(f"unknown scale estimator {self.scale_estimator}")
        if self.influence not in INFLUENCE_FUNCTIONS:
            raise ValueError(f"unknown influence function {self.influence}")
        if self.sampler_backend not in ("gather", "pallas"):
            raise ValueError(f"unknown sampler backend {self.sampler_backend}")
        if self.pallas_precision not in ("default", "highest"):
            raise ValueError(
                f"unknown pallas precision {self.pallas_precision!r} "
                "(expected 'default' or 'highest')"
            )
        if self.gradient_source not in ("current", "reference"):
            raise ValueError(
                f"unknown gradient source {self.gradient_source!r} "
                "(expected 'current' or 'reference')"
            )
        if not (0.0 <= self.point_budget_fraction <= 1.0):
            raise ValueError(
                "point_budget_fraction must be in [0, 1], got "
                f"{self.point_budget_fraction}"
            )
        if not (0 <= self.last_level <= self.first_level < self.num_levels):
            raise ValueError(
                "require 0 <= last_level <= first_level < num_levels, got "
                f"{self.last_level} <= {self.first_level} < {self.num_levels}"
            )

    @property
    def tracked_levels(self) -> tuple:
        """Level indices tracked, coarse to fine."""
        return tuple(range(self.first_level, self.last_level - 1, -1))


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    """SLAM backend knobs (reference: dvo_slam::Config, dvo_slam/cfg/*.cfg).

    Padded capacities exist because the TPU pose-graph solver and the
    batched loop-closure validator run on fixed shapes (SURVEY.md §8.3.5);
    the reference grows g2o graphs dynamically.
    """

    # --- keyframe selection (entropy ratio, IROS13 §IV) ---
    # New keyframe when H(current)/H(first frame after keyframe) drops
    # below this (reference uses ~0.9).
    min_entropy_ratio: float = 0.9
    # Acceptance criterion: fraction of selected points that produced valid
    # constraints (reference Config::MinEquationSystemConstraintRatio).
    min_constraint_ratio: float = 0.2

    # --- loop closure (reference KeyframeGraph + constraints/*) ---
    # Candidate keyframes within this metric radius of the new keyframe
    # (reference Config::NewConstraintSearchRadius, default 5.0).
    new_constraint_search_radius: float = 5.0
    # Skip candidates closer than this many keyframes in graph distance
    # (reference Config::MinConstraintDistance).
    min_constraint_distance: int = 5
    # Entropy-ratio acceptance for the two validation stages (reference
    # Config::NewConstraintMinEntropyRatioCoarse / ...Fine).
    min_entropy_ratio_coarse: float = 0.6
    min_entropy_ratio_fine: float = 0.75
    # Forward-backward consistency: || log(T_fwd * T_bwd) || below this
    # (reference CrossValidationVoter).
    cross_validation_threshold: float = 0.10
    # OdometryConstraintVoter: reject a coarse-validated constraint whose
    # measured pose deviates from its graph-predicted initialization by a
    # twist norm above this (plausible-accumulated-drift bound; generous
    # because the prediction itself carries the drift loop closure fixes).
    odometry_constraint_threshold: float = 1.0
    # Batch sizing for the vmapped constraint validator: candidates are
    # padded to the power-of-two bucket of their count, floored at
    # validation_batch and split above validation_batch_max. Bigger
    # batches amortize per-iteration kernel overheads (measured v5e:
    # 6.4 / 3.9 / 3.0 ms per candidate at batch 8 / 16 / 32) at the cost
    # of one compile per bucket size.
    validation_batch: int = 8
    validation_batch_max: int = 32
    # Cap loop-closure candidates per keyframe insertion to the N nearest
    # (by metric distance) within the search radius. 0 = unbounded, the
    # reference's pure radius census — fine for exploration trajectories,
    # but on revisit-heavy paths the census grows with the map and each
    # candidate costs a validation track (+ a ~10 MB pyramid re-upload if
    # evicted). Long-running deployments should set this (bench/soak.py
    # uses 16).
    max_loop_candidates: int = 0

    # Fuse the keyframe-relative estimate with the chained frame-to-frame
    # odometry estimate by information weighting (reference LocalMap
    # keyframe + odometry measurements, dvo_slam/src/local_map.cpp).
    fuse_odometry: bool = True

    # --- windowed local-map optimization (reference LocalMap::optimize) ---
    # On keyframe switch (and at finish for the trailing window), jointly
    # refine all frame poses of the closing window with a mini pose-graph:
    # keyframe vertex + per-frame vertices, kf->frame and frame->frame
    # edges weighted by tracker information (models/local_map.py).
    local_map_optimize: bool = True
    local_map_iterations: int = 10
    # Padded vertex capacity of the mini-graph (one compile per run);
    # frames beyond it keep their closed-form fused estimates.
    local_map_capacity: int = 64

    # --- pose graph optimization (g2o replacement) ---
    optimization_iterations: int = 20
    final_optimization_iterations: int = 100
    use_robust_kernel: bool = True
    cauchy_c: float = 1.0
    # Solve buckets of at least this many vertices with the matrix-free
    # block-Jacobi CG solver instead of the dense 6Mx6M Cholesky
    # (reference analog: g2o's sparse CSparse/Cholmod backend). Measured
    # v5e (bench/graph_bench.py): dense stays FASTER up to M=1024 (711 vs
    # 1375 ms/solve — CG's small serialized matvecs are latency-bound)
    # but fails to COMPILE at M=2048 (XLA materializes a 16 GB padded
    # temp for the 12k x 12k system); CG is O(E + M) memory and solves
    # M=2048 in 5.8 s. 2048 = the scaling escape hatch for multi-hour
    # runs, not a fast path.
    graph_cg_threshold: int = 2048
    # Interleaved-solve frequency backoff (g2o-user practice at scale;
    # semantic deviation from the reference's solve-every-insertion —
    # docs/fr1_desk_protocol.md): once the ACTIVE vertex count M exceeds
    # this, the per-switch global solve runs every ceil(M / this)-th
    # switch instead of every switch — UNLESS new loop-closure edges
    # landed since the last solve (those always solve immediately; the
    # whole point of the interleaved solve is consuming loop closures).
    # Between solves the LocalMap window keeps local consistency, exactly
    # the information a skipped global solve would refine. 0 disables.
    optimization_backoff_vertices: int = 128
    # Remove loop edges whose robust weight falls below this after an
    # optimization round (reference Config::OptimizationRemoveOutliers +
    # OptimizationOutlierWeightThreshold).
    remove_outliers: bool = True
    outlier_weight_threshold: float = 0.1

    # --- padded capacities (static shapes for jit) ---
    # Initial capacities only: the graph re-pads (doubling) when full, so
    # runs are unbounded like the reference; each growth recompiles the
    # device solver once (O(log N) recompiles over a run).
    max_keyframes: int = 256
    max_edges: int = 1024
    # Keyframe pyramids resident in HBM (~10 MB each at 640x480); older
    # ones spill to host RAM and re-upload inside loop-closure validation
    # batches on candidacy.
    resident_keyframes: int = 64
    # LRU device cache for re-uploaded EVICTED validation candidates
    # (level-trimmed, ~2.4 MB each at 640x480 defaults). On revisit-heavy
    # trajectories consecutive keyframe switches propose nearly the same
    # candidate set, so without the cache every switch re-uploads the
    # same spilled pyramids (bench/soak.py measured this as the dominant
    # per-switch cost past the residency budget). 0 disables.
    validation_cache_slots: int = 48

    # --- tracker configs used by the SLAM layer ---
    # Coarse validation tracks only the coarsest levels; fine validation
    # tracks the normal range.
    coarse_first_level: int = 3
    coarse_last_level: int = 3
    # Iteration cap for the coarse validation tracker (reference validator
    # runs a dedicated DenseTracker::Config at the coarse stage).
    coarse_max_iterations: int = 25


DEFAULT_TRACKER = TrackerConfig()
DEFAULT_SLAM = SlamConfig()
