"""Robust weighting tests: closed forms and estimator sanity."""

import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.ops import robust


def test_influence_closed_forms():
    x = jnp.asarray([0.0, 1.0, 2.0, -3.0])
    np.testing.assert_allclose(np.asarray(robust.influence_unit(x)), np.ones(4))
    # Scalar t-dist influence: (dof+1)/(dof+x^2).
    np.testing.assert_allclose(
        np.asarray(robust.influence_tdist(x, dof=5.0)),
        (5.0 + 1.0) / (5.0 + np.asarray(x) ** 2),
        atol=1e-6,
    )
    # Huber: 1 inside k, k/|x| outside.
    w = np.asarray(robust.influence_huber(x, k=1.345))
    np.testing.assert_allclose(w[0], 1.0)
    np.testing.assert_allclose(w[1], 1.0)
    np.testing.assert_allclose(w[2], 1.345 / 2.0, atol=1e-6)
    np.testing.assert_allclose(w[3], 1.345 / 3.0, atol=1e-6)
    # Tukey: 0 outside b.
    wt = np.asarray(robust.influence_tukey(jnp.asarray([0.0, 5.0]), b=4.6851))
    np.testing.assert_allclose(wt[0], 1.0)
    np.testing.assert_allclose(wt[1], 0.0)


def test_scale_normal_and_mad():
    rng = np.random.default_rng(0)
    r = rng.normal(scale=2.0, size=4096).astype(np.float32)
    mask = jnp.ones(4096, bool)
    s_normal = float(robust.scale_normal(jnp.asarray(r), mask))
    s_mad = float(robust.scale_mad(jnp.asarray(r), mask))
    assert abs(s_normal - 2.0) < 0.15
    assert abs(s_mad - 2.0) < 0.15


def test_scale_mad_ignores_masked():
    r = np.concatenate([np.ones(100), 1e6 * np.ones(100)]).astype(np.float32)
    mask = jnp.asarray(np.concatenate([np.ones(100), np.zeros(100)]).astype(bool))
    s = float(robust.scale_mad(jnp.asarray(r), mask))
    # All valid residuals equal 1 -> MAD of |r| has median 1.
    assert s < 2.0


def test_tdist_covariance_recovers_scale():
    """On Gaussian data the t-dist scale matrix converges near the Gaussian
    covariance (slightly smaller); check ordering + off-diagonal sign."""
    rng = np.random.default_rng(1)
    cov = np.array([[4.0, 1.0], [1.0, 1.0]])
    L = np.linalg.cholesky(cov)
    r = (rng.normal(size=(8192, 2)) @ L.T).astype(np.float32)
    mask = jnp.ones(8192, bool)
    sigma, prec = robust.tdist_covariance(jnp.asarray(r), mask, dof=5.0, iters=20)
    sigma = np.asarray(sigma)
    assert 2.0 < sigma[0, 0] < 5.0
    assert 0.5 < sigma[1, 1] < 1.5
    assert sigma[0, 1] > 0.2
    # precision is the inverse
    np.testing.assert_allclose(sigma @ np.asarray(prec), np.eye(2), atol=1e-3)


def test_tdist_weights_downweight_outliers():
    r = jnp.asarray(np.array([[0.1, 0.0], [5.0, 5.0]], np.float32))
    prec = jnp.eye(2)
    w = np.asarray(robust.tdist_weights(r, prec, jnp.ones(2, bool), dof=5.0))
    assert w[0] > 5 * w[1]


def test_masked_points_get_zero_weight():
    r = jnp.asarray(np.ones((4, 2), np.float32))
    mask = jnp.asarray([True, False, True, False])
    w = np.asarray(robust.tdist_weights(r, jnp.eye(2), mask))
    assert w[1] == 0.0 and w[3] == 0.0 and w[0] > 0.0


def test_log_likelihood_finite_and_ordered():
    rng = np.random.default_rng(2)
    good = jnp.asarray(rng.normal(scale=0.1, size=(256, 2)).astype(np.float32))
    bad = jnp.asarray(rng.normal(scale=3.0, size=(256, 2)).astype(np.float32))
    mask = jnp.ones(256, bool)
    sigma = jnp.eye(2) * 0.01
    ll_good = float(robust.tdist_log_likelihood(good, sigma, mask))
    ll_bad = float(robust.tdist_log_likelihood(bad, sigma, mask))
    assert np.isfinite(ll_good) and np.isfinite(ll_bad)
    assert ll_good > ll_bad
