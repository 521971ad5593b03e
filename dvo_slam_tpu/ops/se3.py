"""SE(3) Lie-group operations in JAX.

TPU-native replacement for the reference's use of Sophus (SE3::exp / SE3::log
in dvo_core/src/dense_tracking.cpp and the g2o SE3 vertex machinery). Twist
convention is translation-first: xi = (v, w) with exp(xi^) acting as a LEFT
increment, T <- exp(xi^) @ T, matching the Jacobian derivation in SURVEY.md
§4.2 (d p'/d xi = [I | -[p']x]).

All functions are shape-polymorphic over leading batch dimensions and work in
the input dtype (f32 on device; call with f64 arrays under jax x64 or use
utils/se3_np.py for host-side double-precision bookkeeping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Pose math must run at true f32 matmul precision regardless of ambient
# config (JAX's default emulates bf16 passes; ~3e-3 error on 3x3 products).
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def hat(w):
    """so(3) hat operator: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _so3_coefficients(theta_sq):
    """Taylor-safe (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3)."""
    theta = jnp.sqrt(theta_sq)
    small = theta_sq < 1e-8
    # Guard the denominators; the small branch value is used where small.
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    safe_t = jnp.sqrt(safe_sq)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe_t)) / safe_sq)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (safe_t - jnp.sin(safe_t)) / (safe_sq * safe_t),
    )
    return a, b, c


def exp_so3(w):
    """so(3) exponential: (..., 3) -> (..., 3, 3) rotation matrices."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _so3_coefficients(theta_sq)
    W = hat(w)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def exp(xi):
    """se(3) exponential map: (..., 6) twist (v, w) -> (..., 4, 4) matrix."""
    v, w = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, c = _so3_coefficients(theta_sq)
    W = hat(w)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = _einsum("...ij,...j->...i", V, v)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def log_so3(R):
    """SO(3) logarithm: (..., 3, 3) -> (..., 3). Safe for small angles
    (pose increments here are small). Near theta = pi the arccos/sin form
    loses ~1/sin(theta) digits: in the module's f32 device dtype expect
    ~2e-2 rad roundtrip error at theta = 3.14 (f64 holds ~1e-3 to
    theta ~ pi - 1e-3) — don't trust near-pi twists to high precision.

    Autodiff-safe at the identity: both branches are parameterized by
    u = 1 - cos(theta), whose tangent is polynomial there. (A naive
    arccos-based small branch has d(arccos)/dc = -inf at c = 1, which
    jacfwd propagates as NaN through the *selected* branch — this is how
    pose-graph Jacobians of exactly-consistent edges die.)
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    u = jnp.clip((3.0 - trace) * 0.5, 0.0, 2.0)  # u = 1 - cos(theta)
    small = u < 1e-6
    u_safe = jnp.where(small, jnp.ones_like(u), u)
    theta = jnp.arccos(1.0 - u_safe)
    sin_theta = jnp.sqrt(u_safe * (2.0 - u_safe))
    # theta / (2 sin theta); small-angle: theta^2 = 2u + u^2/3 + O(u^3),
    # factor = 0.5 + theta^2/12 + 7 theta^4/720.
    theta_sq_small = 2.0 * u + u * u / 3.0
    factor = jnp.where(
        small,
        0.5 + theta_sq_small / 12.0 + 7.0 * theta_sq_small * theta_sq_small / 720.0,
        theta / (2.0 * sin_theta),
    )
    return factor[..., None] * vee(R - jnp.swapaxes(R, -1, -2))


def log(T):
    """SE(3) logarithm: (..., 4, 4) -> (..., 6) twist (v, w)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.where(theta_sq < 1e-12, 1.0, theta_sq))
    small = theta_sq < 1e-8
    W = hat(w)
    W2 = _mm(W, W)
    # V^{-1} = I - W/2 + coef * W^2,  coef = 1/t^2 - (1+cos t)/(2 t sin t)
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 / jnp.where(small, 1.0, theta_sq))
        - (1.0 + cos_t) / jnp.where(small, 1.0, 2.0 * theta * sin_t),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    V_inv = eye - 0.5 * W + coef[..., None, None] * W2
    v = _einsum("...ij,...j->...i", V_inv, t)
    return jnp.concatenate([v, w], axis=-1)


def inverse(T):
    """Rigid-transform inverse: (..., 4, 4) -> (..., 4, 4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -_einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def transform(T, p):
    """Apply (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return _einsum("...ij,...nj->...ni", R, p) + t[..., None, :]


def adjoint(T):
    """Adjoint of T for the (v, w) twist ordering: (..., 6, 6).

    Ad(T) @ xi satisfies exp((Ad(T) xi)^) = T exp(xi^) T^{-1}.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = _mm(hat(t), R)
    zeros = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([zeros, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)
