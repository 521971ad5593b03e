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

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.ops import interp, least_squares, residuals, robust, se3

_INF = jnp.inf


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

    def is_nan(self):
        """Reference Result::isNaN — NaN guard used by acceptance voters."""
        return ~(
            jnp.isfinite(self.transformation).all()
            & jnp.isfinite(self.log_likelihood)
        )


def pose_entropy(information):
    """Differential entropy of the pose estimate (IROS13 §IV, SURVEY.md §4.5).

    H = 0.5 * ln((2 pi e)^6 det(Sigma_xi)),  Sigma_xi = information^{-1}.
    """
    _, logdet = jnp.linalg.slogdet(information)
    two_pi_e = 2.0 * jnp.pi * jnp.e
    return 0.5 * (6.0 * jnp.log(two_pi_e) - logdet)


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _weights_and_precision(r, valid, cfg: TrackerConfig, axis_name=None):
    """IRLS weights + 2x2 precision from the configured robust model.

    Default: bivariate t-distribution fixed point (reference
    computeScale/computeWeights). Other estimators build a diagonal Sigma
    from per-channel scalar scales and apply the influence function to the
    Mahalanobis norm.
    """
    dtype = r.dtype
    if not cfg.use_weighting:
        prec = jnp.eye(2, dtype=dtype)
        w = valid.astype(dtype)
        return w, prec, robust.inv2x2(prec)

    floor = jnp.asarray([cfg.min_intensity_sigma, cfg.min_depth_sigma], dtype)
    if cfg.scale_estimator == "tdist":
        sigma, prec = robust.tdist_covariance(
            r, valid, dof=cfg.tdist_dof, iters=cfg.tdist_scale_iters,
            axis_name=axis_name, floor=floor,
        )
        w = robust.tdist_weights(r, prec, valid, dof=cfg.tdist_dof)
        return w, sigma, prec

    # Scalar per-channel scales -> diagonal Sigma (with the same noise floor).
    scale_fn = robust.SCALE_FNS[cfg.scale_estimator]
    s_i = jnp.maximum(scale_fn(r[:, 0], valid), floor[0])
    s_z = jnp.maximum(scale_fn(r[:, 1], valid), floor[1])
    sigma = jnp.diag(jnp.stack([s_i * s_i, s_z * s_z]))
    prec = robust.inv2x2(sigma)
    maha = jnp.sqrt(jnp.einsum("ni,ij,nj->n", r, prec, r))
    influence_fn = robust.INFLUENCE_FNS[cfg.influence]
    if cfg.influence == "huber":
        w = influence_fn(maha, k=cfg.huber_k)
    elif cfg.influence == "tukey":
        w = influence_fn(maha, b=cfg.tukey_b)
    elif cfg.influence == "tdist":
        w = influence_fn(maha, dof=cfg.tdist_dof)
    else:
        w = influence_fn(maha)
    return jnp.where(valid, w, 0.0), sigma, prec


def _linearize(points, i1, selected, cur_slab, K, T, cfg, axis_name=None, sampler=None):
    """Residuals -> weights -> normal equations for one candidate pose."""
    sampler = sampler or interp.bilinear
    lin = residuals.compute_residuals(points, i1, selected, cur_slab, K, T, sampler=sampler)
    r, J, valid = lin["r"], lin["J"], lin["valid"]

    if not cfg.use_depth:
        # Photometric-only (BASELINE.json config #1): zero out the depth row.
        row = jnp.array([1.0, 0.0], dtype=r.dtype)
        r = r * row
        J = J * row[None, :, None]

    w, sigma, prec = _weights_and_precision(r, valid, cfg, axis_name=axis_name)
    if not cfg.use_depth:
        # Keep the system rank-correct: precision acts on channel 0 only.
        prec = prec * jnp.array([[1.0, 0.0], [0.0, 0.0]], dtype=r.dtype)

    A, b, err = least_squares.normal_equations(r, J, w, prec)
    n_valid = valid.sum().astype(r.dtype)
    A = _psum(A, axis_name)
    b = _psum(b, axis_name)
    err = _psum(err, axis_name)
    n_valid = _psum(n_valid, axis_name)
    if cfg.use_weighting and cfg.scale_estimator == "tdist":
        # Acceptance metric: mean t-dist NLL. The weighted squared error is
        # scale-invariant under the per-iteration Sigma re-estimate and
        # carries no signal (see robust.tdist_nll_mean docstring).
        err_mean = robust.tdist_nll_mean(
            r, sigma, prec, valid, dof=cfg.tdist_dof, axis_name=axis_name
        )
    elif cfg.use_weighting:
        # Scalar-robust path: same scale-invariance issue — add the
        # log-det term of the (diagonal) Sigma estimate.
        det = sigma[0, 0] * sigma[1, 1] if cfg.use_depth else sigma[0, 0]
        err_mean = err / jnp.maximum(n_valid, 1.0) + jnp.log(jnp.maximum(det, 1e-12))
    else:
        # Unweighted: P is fixed, the weighted error is a true objective.
        err_mean = err / jnp.maximum(n_valid, 1.0)
    return {
        "A": A,
        "b": b,
        "err_mean": err_mean,
        "n_valid": n_valid,
        "sigma": sigma,
        "r": r,
        "valid": valid,
        "w": w,
    }


def _track_level(points, i1, selected, cur_slab, K, T_init, cfg: TrackerConfig,
                 axis_name=None, sampler=None):
    """IRLS loop for one pyramid level (reference: the per-level loop in
    DenseTracker::match). Returns (T, A, b, sigma, stats dict)."""
    dtype = T_init.dtype
    use_lm = cfg.lm_lambda_init > 0.0

    def linearize(T):
        return _linearize(points, i1, selected, cur_slab, K, T, cfg,
                          axis_name=axis_name, sampler=sampler)

    def cond(carry):
        return ~carry["done"]

    def body(carry):
        lin = linearize(carry["T_cur"])
        first = carry["k"] == 0
        accept = first | (lin["err_mean"] <= carry["err_best"])

        # Accepted state (reference Revertable<T>: keep best, revert else).
        T_base = jnp.where(accept, carry["T_cur"], carry["T_best"])
        A_use = jnp.where(accept, lin["A"], carry["A_best"])
        b_use = jnp.where(accept, lin["b"], carry["b_best"])
        err_best = jnp.where(accept, lin["err_mean"], carry["err_best"])
        sigma_best = jnp.where(accept, lin["sigma"], carry["sigma_best"])
        n_valid_best = jnp.where(accept, lin["n_valid"], carry["n_valid_best"])

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

        delta = least_squares.solve(A_use, b_use, lam)
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
        return {
            "T_cur": T_next,
            "T_best": T_base,
            "err_best": err_best,
            "A_best": A_use,
            "b_best": b_use,
            "sigma_best": sigma_best,
            "n_valid_best": n_valid_best,
            "lam": lam,
            "k": k,
            "done": done,
        }

    init = {
        "T_cur": T_init,
        "T_best": T_init,
        "err_best": jnp.asarray(_INF, dtype),
        "A_best": jnp.eye(6, dtype=dtype),
        "b_best": jnp.zeros(6, dtype=dtype),
        "sigma_best": jnp.eye(2, dtype=dtype),
        "n_valid_best": jnp.asarray(0.0, dtype),
        "lam": jnp.asarray(cfg.lm_lambda_init if use_lm else 0.0, dtype),
        "k": jnp.asarray(0, jnp.int32),
        "done": jnp.asarray(False, bool),
    }
    out = jax.lax.while_loop(cond, body, init)
    stats = {"iterations": out["k"], "error": out["err_best"]}
    return out["T_best"], out["A_best"], out["b_best"], out["sigma_best"], stats


def track(ref_pyr, cur_pyr, Ks, T_init, cfg: TrackerConfig,
          axis_name: Optional[str] = None, sampler=None) -> TrackResult:
    """Align the current frame to the reference frame (DenseTracker::match).

    Args:
      ref_pyr / cur_pyr: tuples of per-level (H, W, 6) slabs (finest first),
        from ops.pyramid.build_pyramid.
      Ks: tuple of per-level (4,) intrinsics (finest first).
      T_init: (4, 4) initial estimate (reference cam -> current cam).
      cfg: static TrackerConfig.
      axis_name: optional mesh axis for pixel-sharded reductions.
      sampler: optional bilinear-sampler override (Pallas kernel hook).

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
            jax.lax.axis_index(axis_name) * ref_slab.shape[0]
            if axis_name is not None
            else 0
        )
        points, i1, selected = residuals.reference_points(
            ref_slab,
            Ks[lvl],
            intensity_grad_threshold=cfg.intensity_grad_threshold,
            depth_grad_threshold=cfg.depth_grad_threshold,
            row_offset=row_offset,
        )
        level_data[lvl] = (points, i1, selected)

    A = jnp.eye(6, dtype=T.dtype)
    sigma = jnp.eye(2, dtype=T.dtype)
    for lvl in levels:
        points, i1, selected = level_data[lvl]
        T, A, _, sigma, stats = _track_level(
            points, i1, selected, cur_pyr[lvl], Ks[lvl], T, cfg,
            axis_name=axis_name, sampler=sampler,
        )
        iters.append(stats["iterations"])
        errs.append(stats["error"])

    # Final evaluation at the converged pose on the finest tracked level:
    # exact Information/LogLikelihood at T (reference reports A at
    # convergence) + validity statistics for the acceptance criteria.
    lvl = levels[-1]
    points, i1, selected = level_data[lvl]
    fin = _linearize(points, i1, selected, cur_pyr[lvl], Ks[lvl], T, cfg,
                     axis_name=axis_name, sampler=sampler)
    loglik = robust.tdist_log_likelihood(
        fin["r"], fin["sigma"], fin["valid"], dof=cfg.tdist_dof
    )
    loglik = _psum(loglik, axis_name)
    n_selected = _psum(selected.sum().astype(T.dtype), axis_name)
    information = fin["A"]
    entropy = pose_entropy(information)

    return TrackResult(
        transformation=T,
        information=information,
        log_likelihood=loglik,
        entropy=entropy,
        error=fin["err_mean"],
        sigma=fin["sigma"],
        valid_pixels=fin["n_valid"],
        valid_ratio=fin["n_valid"] / jnp.maximum(n_selected, 1.0),
        iterations=jnp.stack(iters),
        level_errors=jnp.stack(errs),
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

    ref_pyrs: tuple of (B, H, W, 6) slabs; T_inits: (B, 4, 4).
    """
    fn = lambda ref, T0: track(ref, cur_pyr, Ks, T0, cfg)
    return jax.vmap(fn)(ref_pyrs, T_inits)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_pairs_batched(ref_pyrs, cur_pyrs, Ks, T_inits, cfg: TrackerConfig) -> TrackResult:
    """Fully batched: B reference pyramids against B current pyramids."""
    fn = lambda ref, cur, T0: track(ref, cur, Ks, T0, cfg)
    return jax.vmap(fn)(ref_pyrs, cur_pyrs, T_inits)
