"""Dense RGB-D tracker: coarse-to-fine robust IRLS image alignment.

TPU-native equivalent of the reference's DenseTracker::match
(dvo_core/src/dense_tracking.cpp + dense_tracking_impl.cpp; SURVEY.md §3.2):
minimize the bivariate photometric+geometric error of warping the reference
frame's valid pixels into the current frame under a t-distribution, by
Gauss-Newton / Levenberg-Marquardt over se(3), coarse to fine across pyramid
levels.

Architecture differences from the reference (deliberate, TPU-first):
  * The whole match is ONE jitted function: a Python-unrolled loop over
    pyramid levels (shapes differ per level) with a lax.while_loop for the
    IRLS iterations of each level. No host round-trips inside a frame.
  * Point selection is a mask over the full pixel grid, not a compacted
    array (fixed shapes; SURVEY.md §8.1). All statistics divide by mask
    counts.
  * The per-pixel SSE kernels (computeResidualsSse + math_sse rank updates)
    become bilinear gathers + two MXU matmuls (ops/residuals.py,
    ops/least_squares.py), optionally fused into a Pallas kernel.
  * Gauss-Newton rollback (the reference's Revertable<T>) and adaptive
    Levenberg-Marquardt share one code path: lambda == 0 reproduces the
    reference's revert-and-stop behaviour, lambda > 0 retries the step
    from the last accepted linearization with increased damping.
  * An optional `axis_name` makes every reduction a psum so the identical
    tracker runs with the pixel dimension sharded across a device mesh
    (parallel/, SURVEY.md §2.5 P1/P2 replacement).

Batched tracking (the reference's TBB dual-alignment in LocalTracker and
the serial loop-closure validation in ConstraintProposalValidator) is
jax.vmap over the reference-frame/initial-pose leading axis — see
`track_batched`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.ops import least_squares, linearize as lin_ops, se3

_INF = jnp.inf


# Termination reasons, per level (reference IterationStats/LevelStats
# termination criteria in dvo_core/include/dvo/dense_tracking.h).
TERM_ITERATIONS = 0  # hit max_iterations
TERM_INCREMENT = 1  # ||delta_xi|| < precision
TERM_ERROR_INCREASED = 2  # GN rollback (reference Revertable revert+stop)
TERM_TOO_FEW_CONSTRAINTS = 3  # < 6 valid constraints


class TrackStats(NamedTuple):
    """Fixed-shape per-iteration statistics (reference Stats/LevelStats/
    IterationStats in dvo_core/include/dvo/dense_tracking.h). All arrays
    are (num_tracked_levels, max_iterations), coarse level first; entries
    at indices >= iterations[level] are zero (never executed)."""

    valid: jnp.ndarray  # valid constraint count at each evaluation
    error: jnp.ndarray  # acceptance NLL of each evaluation
    delta_norm: jnp.ndarray  # ||delta_xi|| of each solved increment
    accepted: jnp.ndarray  # bool: evaluation accepted (vs rolled back)
    termination: jnp.ndarray  # (num_tracked_levels,) int32 TERM_* codes
    # Points masked ONLY by the pallas sampler's row window at each
    # evaluation (0 on the gather path) — distinct from genuine
    # invalidity; the kernel's silent-accuracy failure mode made loud.
    window_miss: jnp.ndarray = None


class TrackResult(NamedTuple):
    """Equivalent of DenseTracker::Result (dvo_core/include/dvo/dense_tracking.h)."""

    transformation: jnp.ndarray  # (4, 4) ref-cam -> cur-cam
    information: jnp.ndarray  # (6, 6) JtWJ at convergence
    log_likelihood: jnp.ndarray  # scalar, bivariate t log-likelihood
    entropy: jnp.ndarray  # scalar, 0.5 ln((2 pi e)^6 det A^{-1})
    error: jnp.ndarray  # scalar, mean weighted squared error (finest level)
    sigma: jnp.ndarray  # (2, 2) final residual scale matrix
    valid_pixels: jnp.ndarray  # scalar, valid constraints at finest level
    valid_ratio: jnp.ndarray  # valid / selected at finest level
    iterations: jnp.ndarray  # (num_tracked_levels,) int32
    level_errors: jnp.ndarray  # (num_tracked_levels,)
    stats: Optional[TrackStats] = None  # cfg.collect_stats
    # Fraction of selected points window-masked at the finest level's
    # accepted linearization (pallas sampler only; 0 on gather) and
    # whether an orchestrator escalated this result to the gather backend
    # (track_batched_escalating).
    # Defaults are numpy scalars, NOT device arrays: a jnp.asarray here
    # would initialize the JAX backend at import time (pinning the
    # platform before callers can configure it).
    window_miss_frac: jnp.ndarray = np.float32(0.0)
    escalated: jnp.ndarray = np.bool_(False)

    def is_nan(self):
        """Reference Result::isNaN — NaN guard used by acceptance voters.

        Reduces only the matrix axes, so on a batched result (vmap leading
        dim) each row gets its own flag — a full reduction would let one
        diverged candidate poison its whole validation batch."""
        t_ok = jnp.isfinite(self.transformation).all(axis=-1).all(axis=-1)
        return ~(t_ok & jnp.isfinite(self.log_likelihood))


def pose_entropy(information):
    """Differential entropy of the pose estimate (IROS13 §IV, SURVEY.md §4.5).

    H = 0.5 * ln((2 pi e)^6 det(Sigma_xi)),  Sigma_xi = information^{-1}.
    """
    _, logdet = jnp.linalg.slogdet(information)
    two_pi_e = 2.0 * jnp.pi * jnp.e
    return 0.5 * (6.0 * jnp.log(two_pi_e) - logdet)


# Floor on the |reference entropy| denominator of entropy_ratio (nats).
_ENTROPY_DENOM_FLOOR = 1.0


def entropy_ratio(h_cur: float, h_ref: float) -> float:
    """Sign-safe entropy ratio for keyframe selection / constraint voting
    (reference TrackingResultEvaluation::ratioWithFirst,
    dvo_slam/src/tracking_result_evaluation.cpp; IROS13 §IV).

    In the real-image regime the pose information is large, H is well
    below zero, and this equals the paper's raw quotient h_cur / h_ref
    exactly. The raw quotient, however, INVERTS its meaning when
    entropies cross zero (H is a log-determinant — its sign depends on
    image scale and valid-pixel count): degradation then GROWS the
    quotient and the keyframe criterion silently stops firing. This form
    keeps "degradation => smaller ratio" for either sign and floors the
    denominator so near-zero reference entropies stay bounded.
    """
    h_cur = float(h_cur)
    h_ref = float(h_ref)
    if not (np.isfinite(h_cur) and np.isfinite(h_ref)):
        return -np.inf  # conservative: treat unknown quality as degraded
    return 1.0 - (h_cur - h_ref) / max(abs(h_ref), _ENTROPY_DENOM_FLOOR)


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _track_level(ref_data, cur_slab, K, T_init, cfg: TrackerConfig,
                 axis_name=None, cur_cmajor=None):
    """IRLS loop for one pyramid level (reference: the per-level loop in
    DenseTracker::match). Returns (T, A, b, sigma, stats dict)."""
    dtype = T_init.dtype
    use_lm = cfg.lm_lambda_init > 0.0

    def linearize(T, sigma_prev=None, warm=None):
        return lin_ops.linearize(ref_data, cur_slab, K, T, cfg,
                                 axis_name=axis_name, cur_cmajor=cur_cmajor,
                                 sigma_init=sigma_prev, sigma_warm=warm)

    def cond(carry):
        return ~carry["done"]

    def body(carry):
        # Warm-start the scale fixed point from the last ACCEPTED Sigma
        # (reference: the scale estimate persists across IRLS iterations).
        lin = linearize(carry["T_cur"], carry["sigma_best"], carry["k"] > 0)
        first = carry["k"] == 0
        accept = first | (lin.err_mean <= carry["err_best"])

        # Accepted state (reference Revertable<T>: keep best, revert else).
        T_base = jnp.where(accept, carry["T_cur"], carry["T_best"])
        A_use = jnp.where(accept, lin.A, carry["A_best"])
        b_use = jnp.where(accept, lin.b, carry["b_best"])
        err_best = jnp.where(accept, lin.err_mean, carry["err_best"])
        err_raw_best = jnp.where(accept, lin.err_raw, carry["err_raw_best"])
        sigma_best = jnp.where(accept, lin.sigma, carry["sigma_best"])
        n_valid_best = jnp.where(accept, lin.n_raw, carry["n_valid_best"])
        log1p_best = jnp.where(accept, lin.log1p_sum, carry["log1p_best"])
        wmiss_best = jnp.where(accept, lin.n_window_miss, carry["wmiss_best"])

        if use_lm:
            lam = jnp.where(
                accept,
                jnp.maximum(carry["lam"] * cfg.lm_lambda_down, 1e-12),
                jnp.minimum(carry["lam"] * cfg.lm_lambda_up, cfg.lm_lambda_max),
            )
            rejected_stop = jnp.zeros((), bool)
        else:
            lam = carry["lam"]
            # Pure GN: error increase => revert and stop (reference behaviour).
            rejected_stop = ~accept

        A_solve, b_solve = A_use, b_use
        if cfg.mu > 0.0:
            # Motion prior (reference Config::Mu): penalize deviation from
            # the level's initial estimate, A += mu I, b += mu xi_prior
            # with xi_prior = log(T_base T_init^{-1}). Applied to the SOLVE
            # operands only — the carried A_best/b_best stay the pure data
            # term, else every rejected iteration re-reads the augmented
            # carry and stacks another mu*I onto the system (the prior
            # re-enters once per rejection instead of once per solve).
            xi_prior = se3.log(T_base @ se3.inverse(T_init))
            A_solve = A_use + cfg.mu * jnp.eye(6, dtype=dtype)
            b_solve = b_use + cfg.mu * xi_prior
        delta = least_squares.solve(A_solve, b_solve, lam)
        delta = jnp.where(jnp.isfinite(delta).all(), delta, jnp.zeros_like(delta))
        T_next = se3.exp(delta) @ T_base
        delta_norm = jnp.linalg.norm(delta)

        k = carry["k"] + 1
        done = (
            rejected_stop
            | (delta_norm < cfg.precision)
            | (k >= cfg.max_iterations)
            | (n_valid_best < 6)
        )
        out = {
            "T_cur": T_next,
            "T_best": T_base,
            "err_best": err_best,
            "err_raw_best": err_raw_best,
            "A_best": A_use,
            "b_best": b_use,
            "sigma_best": sigma_best,
            "n_valid_best": n_valid_best,
            "log1p_best": log1p_best,
            "wmiss_best": wmiss_best,
            "lam": lam,
            "k": k,
            "done": done,
        }
        if cfg.collect_stats:
            i = carry["k"]
            out["it_valid"] = carry["it_valid"].at[i].set(lin.n_raw)
            out["it_error"] = carry["it_error"].at[i].set(lin.err_mean)
            out["it_delta"] = carry["it_delta"].at[i].set(delta_norm)
            out["it_accept"] = carry["it_accept"].at[i].set(accept)
            out["it_wmiss"] = carry["it_wmiss"].at[i].set(lin.n_window_miss)
            # First matching reason wins (priority mirrors the checks above).
            out["term"] = jnp.where(
                rejected_stop,
                TERM_ERROR_INCREASED,
                jnp.where(
                    n_valid_best < 6,
                    TERM_TOO_FEW_CONSTRAINTS,
                    jnp.where(
                        delta_norm < cfg.precision,
                        TERM_INCREMENT,
                        TERM_ITERATIONS,
                    ),
                ),
            ).astype(jnp.int32)
        return out

    init = {
        "T_cur": T_init,
        "T_best": T_init,
        "err_best": jnp.asarray(_INF, dtype),
        "err_raw_best": jnp.asarray(0.0, dtype),
        "A_best": jnp.eye(6, dtype=dtype),
        "b_best": jnp.zeros(6, dtype=dtype),
        "sigma_best": jnp.eye(2, dtype=dtype),
        "n_valid_best": jnp.asarray(0.0, dtype),
        "log1p_best": jnp.asarray(0.0, dtype),
        "wmiss_best": jnp.asarray(0.0, dtype),
        "lam": jnp.asarray(cfg.lm_lambda_init if use_lm else 0.0, dtype),
        "k": jnp.asarray(0, jnp.int32),
        "done": jnp.asarray(False, bool),
    }
    if cfg.collect_stats:
        init["it_valid"] = jnp.zeros(cfg.max_iterations, dtype)
        init["it_error"] = jnp.zeros(cfg.max_iterations, dtype)
        init["it_delta"] = jnp.zeros(cfg.max_iterations, dtype)
        init["it_accept"] = jnp.zeros(cfg.max_iterations, bool)
        init["it_wmiss"] = jnp.zeros(cfg.max_iterations, dtype)
        init["term"] = jnp.asarray(TERM_ITERATIONS, jnp.int32)
    out = jax.lax.while_loop(cond, body, init)
    stats = {"iterations": out["k"], "error": out["err_best"]}
    if cfg.collect_stats:
        stats["per_iter"] = (
            out["it_valid"], out["it_error"], out["it_delta"],
            out["it_accept"], out["term"], out["it_wmiss"],
        )
    A_final = out["A_best"]
    if cfg.mu > 0.0:
        # The returned information is the POSTERIOR information: data term
        # + the motion prior's mu*I, added exactly once here (the carry is
        # the pure data term — see the solve-operand note above).
        A_final = A_final + cfg.mu * jnp.eye(6, dtype=dtype)
    final = lin_ops.Linearization(
        A=A_final, b=out["b_best"], err_mean=out["err_best"],
        n_valid=jnp.maximum(out["n_valid_best"], 1.0),
        n_raw=out["n_valid_best"], sigma=out["sigma_best"],
        log1p_sum=out["log1p_best"], err_raw=out["err_raw_best"],
        n_window_miss=out["wmiss_best"],
    )
    return out["T_best"], final, stats


def track(ref_pyr, cur_pyr, Ks, T_init, cfg: TrackerConfig,
          axis_name: Optional[str] = None) -> TrackResult:
    """Align the current frame to the reference frame (DenseTracker::match).

    Args:
      ref_pyr / cur_pyr: tuples of per-level (6, H, W) slabs (finest first),
        from ops.pyramid.build_pyramid.
      Ks: tuple of per-level (4,) intrinsics (finest first).
      T_init: (4, 4) initial estimate (reference cam -> current cam).
      cfg: static TrackerConfig.
      axis_name: optional mesh axis for pixel-sharded reductions.

    Returns TrackResult with the pose, its 6x6 information matrix, the
    log-likelihood/entropy used by keyframe selection, and per-level stats.
    """
    T = T_init
    iters, errs = [], []

    levels = cfg.tracked_levels  # coarse -> fine
    level_data = {}
    for lvl in levels:
        ref_slab = ref_pyr[lvl]
        # Pixel sharding: the reference slab is row-sharded along
        # `axis_name`; shift pixel coordinates to this shard's rows. The
        # current slab stays replicated (warps cross shard boundaries).
        row_offset = (
            jax.lax.axis_index(axis_name) * ref_slab.shape[1]
            if axis_name is not None
            else 0
        )
        level_data[lvl] = lin_ops.prepare_reference(
            ref_slab, Ks[lvl], cfg, row_offset=row_offset
        )

    # Channel-block layout of the current slabs (pallas sampler input),
    # prepared once per frame per level.
    cmajors = {}
    if cfg.sampler_backend == "pallas":
        from dvo_slam_tpu.ops.pallas import sampler as pallas_sampler

        # bf16 slab storage halves the window DMA traffic and is lossless
        # at DEFAULT matmul precision (see slab_to_cmajor).
        dt = jnp.bfloat16 if cfg.pallas_precision == "default" else None
        if cfg.gradient_source == "reference":
            # Constant-reference-gradient mode samples only [I] / [I, Z]:
            # the kernel slab carries just those channels (+ the mask over
            # all of them — exactly the per-point validity requirement).
            n_smp = 2 if cfg.use_depth else 1
            for lvl in levels:
                cmajors[lvl] = pallas_sampler.slab_to_cmajor(
                    cur_pyr[lvl][:n_smp], dtype=dt
                )
        else:
            # Photometric-only mode: depth holes must not invalidate
            # points (the gather path's validity no longer checks depth
            # either).
            from dvo_slam_tpu.ops import pyramid as pyr_mod

            mc = (None if cfg.use_depth
                  else (pyr_mod.CH_I, pyr_mod.CH_IDX, pyr_mod.CH_IDY))
            for lvl in levels:
                cmajors[lvl] = pallas_sampler.slab_to_cmajor(
                    cur_pyr[lvl], dtype=dt, mask_channels=mc
                )

    fin = None
    per_iter = []
    for lvl in levels:
        T, fin, stats = _track_level(
            level_data[lvl], cur_pyr[lvl], Ks[lvl], T, cfg,
            axis_name=axis_name, cur_cmajor=cmajors.get(lvl),
        )
        iters.append(stats["iterations"])
        errs.append(stats["error"])
        if cfg.collect_stats:
            per_iter.append(stats["per_iter"])

    # Information/LogLikelihood at convergence come from the finest
    # level's last ACCEPTED linearization (T_best is that pose, so its
    # linearization is exact — no extra evaluation pass needed).
    lvl = levels[-1]
    loglik = lin_ops.tdist_loglik(fin, cfg)
    n_selected = _psum(
        level_data[lvl].selected.sum().astype(T.dtype), axis_name
    )
    information = fin.A
    entropy = pose_entropy(information)

    track_stats = None
    if cfg.collect_stats:
        track_stats = TrackStats(
            valid=jnp.stack([p[0] for p in per_iter]),
            error=jnp.stack([p[1] for p in per_iter]),
            delta_norm=jnp.stack([p[2] for p in per_iter]),
            accepted=jnp.stack([p[3] for p in per_iter]),
            termination=jnp.stack([p[4] for p in per_iter]),
            window_miss=jnp.stack([p[5] for p in per_iter]),
        )

    return TrackResult(
        transformation=T,
        information=information,
        log_likelihood=loglik,
        entropy=entropy,
        error=fin.err_mean,
        sigma=fin.sigma,
        valid_pixels=fin.n_raw,
        valid_ratio=fin.n_raw / jnp.maximum(n_selected, 1.0),
        iterations=jnp.stack(iters),
        level_errors=jnp.stack(errs),
        stats=track_stats,
        window_miss_frac=fin.n_window_miss / jnp.maximum(n_selected, 1.0),
        escalated=jnp.asarray(False),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_jit(ref_pyr, cur_pyr, Ks, T_init, cfg: TrackerConfig) -> TrackResult:
    return track(ref_pyr, cur_pyr, Ks, T_init, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_batched(ref_pyrs, cur_pyr, Ks, T_inits, cfg: TrackerConfig) -> TrackResult:
    """Batched tracking: B reference pyramids against ONE current frame.

    Replaces the reference's TBB dual alignment (LocalTracker tracks
    keyframe and previous frame in parallel, dvo_slam/src/local_tracker.cpp)
    and the serial per-candidate loop-closure validation
    (ConstraintProposalValidator): the batch is a vmap axis, XLA saturates
    the chip (SURVEY.md §2.5 P2).

    ref_pyrs: tuple of (B, 6, H, W) slabs; T_inits: (B, 4, 4).
    """
    fn = lambda ref, T0: track(ref, cur_pyr, Ks, T0, cfg)
    return jax.vmap(fn)(ref_pyrs, T_inits)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_pairs_batched(ref_pyrs, cur_pyrs, Ks, T_inits, cfg: TrackerConfig) -> TrackResult:
    """Fully batched: B reference pyramids against B current pyramids."""
    fn = lambda ref, cur, T0: track(ref, cur, Ks, T0, cfg)
    return jax.vmap(fn)(ref_pyrs, cur_pyrs, T_inits)


def track_batched_escalating(ref_pyrs, cur_pyr, Ks, T_inits,
                             cfg: TrackerConfig) -> TrackResult:
    """Batched tracking with pallas-window self-defence (traced; callers
    jit). If any row of the batch lost more than cfg.pallas_miss_escalate
    of its selected points to the sampler's row window at the finest
    level, the WHOLE batch is re-tracked with the exact gather backend
    (lax.cond around the vmap, so the predicate stays scalar and only one
    branch executes at runtime — an in-vmap cond would lower to a select
    that always pays both). The SSE reference has no such failure mode;
    this keeps violent-motion frames from silently losing accuracy while
    the pallas fast path handles the normal regime."""
    fn = lambda ref, T0: track(ref, cur_pyr, Ks, T0, cfg)
    res = jax.vmap(fn)(ref_pyrs, T_inits)
    if cfg.sampler_backend != "pallas" or cfg.pallas_miss_escalate <= 0:
        return res
    import dataclasses

    gcfg = dataclasses.replace(cfg, sampler_backend="gather")
    gfn = lambda ref, T0: track(ref, cur_pyr, Ks, T0, gcfg)

    def rerun(_):
        r = jax.vmap(gfn)(ref_pyrs, T_inits)
        return r._replace(escalated=jnp.ones_like(r.escalated))

    esc = res.window_miss_frac.max() > cfg.pallas_miss_escalate
    return jax.lax.cond(esc, rerun, lambda _: res, None)
