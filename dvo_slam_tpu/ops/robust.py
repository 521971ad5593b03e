"""Robust scale estimation and influence (weight) functions.

TPU-native equivalent of the reference's weight_calculation.{h,cpp}
(ScaleEstimators::{Unit,NormalDistribution,MAD,TDistribution},
InfluenceFunctions::{Unit,Huber,Tukey,TDistribution}) plus the *bivariate*
t-distribution scale-matrix fixed point used by the default tracking path
(dvo_core/src/dense_tracking_impl.cpp computeScale/computeWeights; IROS13
§III, SURVEY.md §4.3).

All estimators are masked: statistics divide by the valid count, never the
padded array size (SURVEY.md §8.3.2), so fixed-shape masked arrays reproduce
the reference's compacted-array semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _masked_mean(x, mask, axis=None):
    m = mask.astype(x.dtype)
    count = jnp.maximum(m.sum(axis=axis), 1.0)
    return (x * m).sum(axis=axis) / count


# ---------------------------------------------------------------------------
# Scalar scale estimators (operate on 1-D residuals r with validity mask)
# ---------------------------------------------------------------------------


def scale_unit(r, mask):
    return jnp.asarray(1.0, r.dtype)


def scale_normal(r, mask):
    """Std-dev of valid residuals (NormalDistributionScaleEstimator)."""
    mean = _masked_mean(r, mask)
    var = _masked_mean((r - mean) ** 2, mask)
    return jnp.sqrt(var + _EPS)


def scale_mad(r, mask):
    """Median absolute deviation x 1.4826 (MADScaleEstimator).

    Median over a masked fixed-shape array: invalid entries are replaced by
    +inf and the median is read at index valid_count//2 of the sorted
    absolute residuals — the C++ nth_element(n/2) convention of the
    reference's compacted median (exact for odd counts, UPPER median for
    even counts; the (n-1)//2 lower median would bias the robust scale
    systematically low on even counts).
    """
    absr = jnp.where(mask, jnp.abs(r), jnp.inf)
    sorted_r = jnp.sort(absr)
    count = mask.sum()
    med_idx = jnp.minimum(count // 2, jnp.maximum(count - 1, 0))
    med = sorted_r[med_idx]
    return 1.4826 * jnp.where(jnp.isfinite(med), med, 1.0)


def scale_tdist(r, mask, dof=5.0, iters=5):
    """Scalar t-distribution sigma fixed point (TDistributionScaleEstimator):
    sigma^2 <- mean_i [ (dof+1)/(dof + r_i^2/sigma^2) * r_i^2 ]."""
    r2 = jnp.where(mask, r * r, 0.0)
    count = jnp.maximum(mask.sum().astype(r.dtype), 1.0)

    def body(_, sigma2):
        w = (dof + 1.0) / (dof + r2 / jnp.maximum(sigma2, _EPS))
        return (w * r2).sum() / count

    sigma2 = (r2.sum() / count) + _EPS
    sigma2 = jax.lax.fori_loop(0, iters, body, sigma2)
    return jnp.sqrt(sigma2 + _EPS)


# ---------------------------------------------------------------------------
# Scalar influence functions: weight w(x) for normalized residual x = r/sigma
# ---------------------------------------------------------------------------


def influence_unit(x):
    return jnp.ones_like(x)


def influence_huber(x, k=1.345):
    ax = jnp.abs(x)
    return jnp.where(ax <= k, jnp.ones_like(x), k / jnp.maximum(ax, _EPS))


def influence_tukey(x, b=4.6851):
    t = 1.0 - (x / b) ** 2
    return jnp.where(jnp.abs(x) <= b, t * t, jnp.zeros_like(x))


def influence_tdist(x, dof=5.0):
    return (dof + 1.0) / (dof + x * x)


SCALE_FNS = {
    "unit": scale_unit,
    "normal": scale_normal,
    "mad": scale_mad,
    "tdist": scale_tdist,
}

INFLUENCE_FNS = {
    "unit": influence_unit,
    "huber": influence_huber,
    "tukey": influence_tukey,
    "tdist": influence_tdist,
}


# ---------------------------------------------------------------------------
# Bivariate t-distribution scale matrix (the default IROS13 path)
# ---------------------------------------------------------------------------


def tdist_covariance(r, mask, dof=5.0, iters=5, axis_name=None, floor=None):
    """Fixed-point estimate of the 2x2 t-distribution scale matrix.

    Sigma <- (1/n) sum_i w_i(Sigma) r_i r_i^T,
    w_i = (dof + 2) / (dof + r_i^T Sigma^{-1} r_i)

    r: (N, 2) residuals, mask: (N,) validity. Returns (Sigma, precision)
    with precision = Sigma^{-1}, both (2, 2). Reference:
    dense_tracking_impl computeScaleSse / the IRLS covariance update.

    When `axis_name` is given, the N dimension is assumed sharded over that
    mesh axis and every sum is a psum (pixel-sharded tracking).

    `floor`: optional (2,) per-channel minimum standard deviations added in
    quadrature to the diagonal every fixed-point step — the sensor-noise
    floor that keeps Sigma from collapsing on noise-free residuals (see
    TrackerConfig.min_intensity_sigma / min_depth_sigma).
    """
    def _reduce(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    if floor is None:
        reg = _EPS * jnp.eye(2, dtype=r.dtype)
    else:
        floor = jnp.asarray(floor, r.dtype)
        reg = jnp.diag(floor * floor) + _EPS * jnp.eye(2, dtype=r.dtype)

    m = mask.astype(r.dtype)
    count = jnp.maximum(_reduce(m.sum()), 1.0)
    rr = r[:, :, None] * r[:, None, :]  # (N, 2, 2)
    rr = rr * m[:, None, None]

    sigma0 = _reduce(rr.sum(axis=0)) / count + reg

    def body(_, sigma):
        prec = inv2x2(sigma)
        maha = jnp.einsum("ni,ij,nj->n", r, prec, r)
        w = (dof + 2.0) / (dof + maha)
        w = w * m
        sigma_new = _reduce((w[:, None, None] * rr).sum(axis=0)) / count
        return sigma_new + reg

    sigma = jax.lax.fori_loop(0, iters, body, sigma0)
    return sigma, inv2x2(sigma)


def tdist_weights(r, precision, mask, dof=5.0):
    """Per-point IRLS weights w_i = (dof+2)/(dof + r^T Sigma^{-1} r)."""
    maha = jnp.einsum("ni,ij,nj->n", r, precision, r)
    w = (dof + 2.0) / (dof + maha)
    return jnp.where(mask, w, 0.0)


def inv2x2(a):
    """Closed-form symmetric 2x2 inverse with determinant guard."""
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    inv = jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]], dtype=a.dtype)
    return inv / det


def tdist_nll_mean(r, sigma, prec, mask, dof=5.0, axis_name=None):
    """Mean per-point negative log-likelihood (constants dropped).

    nll_i = 0.5 ln det Sigma + (dof+2)/2 * log1p(maha_i / dof)

    This is the correct iteration-acceptance metric for the IRLS loop: the
    weighted squared error sum w_i r_i^T Sigma^{-1} r_i is scale-INVARIANT
    (Sigma is re-estimated from the same residuals each iteration, so that
    quantity hovers near a constant regardless of fit quality) — the
    ln det Sigma term is what actually decreases as the alignment improves.
    """
    def _reduce(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    m = mask.astype(r.dtype)
    count = jnp.maximum(_reduce(m.sum()), 1.0)
    maha = jnp.einsum("ni,ij,nj->n", r, prec, r)
    det = sigma[0, 0] * sigma[1, 1] - sigma[0, 1] * sigma[1, 0]
    per_point = 0.5 * jnp.log(jnp.maximum(det, _EPS)) + (dof + 2.0) / 2.0 * jnp.log1p(
        maha / dof
    )
    return _reduce((per_point * m).sum()) / count


def tdist_log_likelihood(r, sigma, mask, dof=5.0):
    """Summed bivariate Student-t log-likelihood of the final residuals.

    Used for DenseTracker::Result::LogLikelihood parity (keyframe selection
    can use either this or the information-determinant entropy).
    """
    p = 2.0
    prec = inv2x2(sigma)
    maha = jnp.einsum("ni,ij,nj->n", r, prec, r)
    det = sigma[0, 0] * sigma[1, 1] - sigma[0, 1] * sigma[1, 0]
    log_norm = (
        jax.scipy.special.gammaln((dof + p) / 2.0)
        - jax.scipy.special.gammaln(dof / 2.0)
        - (p / 2.0) * jnp.log(dof * jnp.pi)
        - 0.5 * jnp.log(jnp.maximum(det, _EPS))
    )
    ll = log_norm - ((dof + p) / 2.0) * jnp.log1p(maha / dof)
    return jnp.where(mask, ll, 0.0).sum()
