"""SE(3) unit tests: exp/log round trips, group laws, host/device parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from dvo_slam_tpu.ops import se3
from dvo_slam_tpu.utils import se3_np


def random_twists(n, scale=0.5, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(scale=scale, size=(n, 6))


def test_exp_zero_is_identity():
    T = se3.exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


def test_exp_log_roundtrip():
    xis = random_twists(32, scale=0.4)
    T = se3.exp(jnp.asarray(xis, jnp.float32))
    xi_back = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi_back), xis, atol=2e-5)


def test_exp_log_roundtrip_tiny():
    xis = random_twists(8, scale=1e-5, seed=1)
    T = se3.exp(jnp.asarray(xis, jnp.float32))
    xi_back = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi_back), xis, atol=1e-7)


def test_exp_is_rigid():
    xis = random_twists(16, scale=1.0, seed=2)
    T = np.asarray(se3.exp(jnp.asarray(xis, jnp.float32)))
    R = T[:, :3, :3]
    should_be_eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(should_be_eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1], (16, 1)), atol=0)


def test_inverse():
    xi = random_twists(1, scale=0.7, seed=3)[0]
    T = se3.exp(jnp.asarray(xi, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(T @ se3.inverse(T)), np.eye(4), atol=1e-6
    )


def test_adjoint_identity():
    """exp((Ad_T xi)^) == T exp(xi^) T^{-1}."""
    rng = np.random.default_rng(4)
    T = se3.exp(jnp.asarray(rng.normal(scale=0.5, size=6), jnp.float32))
    xi = jnp.asarray(rng.normal(scale=0.1, size=6), jnp.float32)
    lhs = se3.exp(se3.adjoint(T) @ xi)
    rhs = T @ se3.exp(xi) @ se3.inverse(T)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_host_device_parity():
    xis = random_twists(16, scale=0.6, seed=5)
    for xi in xis:
        T_np = se3_np.exp(xi)
        T_jnp = np.asarray(se3.exp(jnp.asarray(xi, jnp.float32)))
        np.testing.assert_allclose(T_jnp, T_np, atol=1e-6)
        np.testing.assert_allclose(se3_np.log(T_np), xi, atol=1e-10)


def test_transform_points():
    rng = np.random.default_rng(6)
    xi = rng.normal(scale=0.3, size=6)
    p = rng.normal(size=(10, 3))
    T = se3_np.exp(xi)
    expected = (T[:3, :3] @ p.T).T + T[:3, 3]
    got = se3.transform(jnp.asarray(T, jnp.float32), jnp.asarray(p, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_log_jacobian_finite_at_identity():
    """jacfwd through log at (and near) the identity must be finite — the
    pose-graph edge Jacobians hit exactly this point for consistent edges."""
    import jax

    def f(d):
        return se3.log(se3.exp(d) @ jnp.eye(4))

    J0 = np.asarray(jax.jacfwd(f)(jnp.zeros(6)))
    assert np.isfinite(J0).all()
    np.testing.assert_allclose(J0, np.eye(6), atol=1e-5)

    d_small = jnp.asarray(np.full(6, 1e-4), jnp.float32)
    J1 = np.asarray(jax.jacfwd(f)(d_small))
    assert np.isfinite(J1).all()


def test_quaternion_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(20):
        xi = rng.normal(scale=1.5, size=6)
        T = se3_np.exp(xi)
        t, q = se3_np.matrix_to_pose(T)
        T2 = se3_np.pose_to_matrix(t, q)
        np.testing.assert_allclose(T2, T, atol=1e-10)


def test_host_log_near_pi():
    """The host log must NOT fail open at theta ~ pi: the loop-closure
    CrossValidationVoter thresholds ||log(T_f @ T_b)||, and a maximally
    inconsistent fwd/bwd pair is a ~180-deg relative rotation. The
    arccos + vee(R - R^T) form returns ZERO rotation there (R symmetric)."""
    rng = np.random.default_rng(7)
    for theta in [np.pi, np.pi - 1e-3, np.pi - 1e-6, 3.0, 2.9]:
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        v = rng.normal(scale=0.2, size=3)
        xi = np.concatenate([v, theta * axis])
        T = se3_np.exp(xi)
        xi_back = se3_np.log(T)
        # Rotation magnitude must survive (the fail-open mode reads ~0).
        assert abs(np.linalg.norm(xi_back[3:]) - theta) < 1e-9, (theta, xi_back)
        # Full round trip: exp(log(T)) == T even where log(T) != xi
        # (at theta == pi the twist sign is ambiguous; the transform isn't).
        np.testing.assert_allclose(se3_np.exp(xi_back), T, atol=1e-9)


def test_host_log_small_and_generic_unchanged():
    xis = random_twists(64, scale=0.4, seed=3)
    for xi in xis:
        np.testing.assert_allclose(se3_np.log(se3_np.exp(xi)), xi, atol=1e-10)
    for xi in random_twists(16, scale=1e-6, seed=4):
        np.testing.assert_allclose(se3_np.log(se3_np.exp(xi)), xi, atol=1e-12)


def test_log_batch_matches_scalar():
    """Vectorized host log (used by outlier-edge masking over ALL graph
    edges per solve) must agree with the scalar quaternion-based log in
    every trace regime: generic, tiny, and near/at theta = pi (where the
    scalar version's stability mattered for the CrossValidationVoter)."""
    rng = np.random.default_rng(7)
    xis = [rng.normal(scale=0.5, size=6) for _ in range(64)]
    xis += [rng.normal(scale=1e-6, size=6) for _ in range(8)]
    for theta in [np.pi, np.pi - 1e-3, np.pi - 1e-6, 3.0, 2.9, 1e-9, 0.0]:
        axis = rng.normal(size=3)
        axis /= max(np.linalg.norm(axis), 1e-12)
        xis.append(np.concatenate([rng.normal(scale=0.1, size=3),
                                   theta * axis]))
    Ts = np.stack([se3_np.exp(xi) for xi in xis])
    batched = se3_np.log_batch(Ts)
    for k in range(Ts.shape[0]):
        scalar = se3_np.log(Ts[k])
        np.testing.assert_allclose(batched[k], scalar, atol=1e-9,
                                   err_msg=f"row {k}")


def test_inverse_batch_matches_scalar():
    rng = np.random.default_rng(8)
    Ts = np.stack([se3_np.exp(rng.normal(scale=0.5, size=6))
                   for _ in range(16)])
    inv = se3_np.inverse_batch(Ts)
    for k in range(16):
        np.testing.assert_allclose(inv[k], se3_np.inverse(Ts[k]), atol=1e-12)
