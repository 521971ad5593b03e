"""Weighted 6x6 normal-equation accumulation and solve.

TPU-native equivalent of the reference's NormalEquationsLeastSquares
(dvo_core/src/core/least_squares.cpp) + OptimizedSelfAdjointMatrix6x6f
(dvo_core/src/core/math_sse.cpp). The reference hand-writes SSE rank-2
updates per pixel; on TPU the whole accumulation is two large matmuls that
XLA maps onto the MXU:

  A = sum_i w_i J_i^T P J_i  =  Jf^T @ Gf      (6 x 2N) @ (2N x 6)
  b = sum_i w_i J_i^T P r_i  =  Gf^T-contract with residuals

with P the 2x2 precision (Sigma^{-1}) of the bivariate residual and w_i the
per-point IRLS weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_JITTER = 1e-8


def normal_equations(r, J, w, precision):
    """Accumulate A (6,6), b (6,) and the weighted squared error.

    r: (N, 2), J: (N, 2, 6), w: (N,) (0 for invalid), precision: (2, 2).
    Error = sum_i w_i r_i^T P r_i (the IRLS quadratic surrogate; used for
    the error-increase rollback test, reference Revertable semantics).
    """
    G = jnp.einsum("ab,nbk->nak", precision, J) * w[:, None, None]  # (N, 2, 6)
    Jf = J.reshape(-1, 6)
    Gf = G.reshape(-1, 6)
    A = Jf.T @ Gf  # (6, 6) — MXU
    b = jnp.einsum("nak,na->k", G, r)
    Pr = jnp.einsum("ab,nb->na", precision, r)
    err = jnp.einsum("na,na->n", r, Pr) * w
    return A, b, err.sum()


def normal_equations_scalar(r, J, w):
    """Scalar (photometric-only) variant: r (N,), J (N, 6), w (N,)."""
    Jw = J * w[:, None]
    A = J.T @ Jw
    b = Jw.T @ r
    err = (w * r * r).sum()
    return A, b, err


def solve(A, b, lm_lambda=0.0):
    """Solve A dx = -b with optional Levenberg-Marquardt diagonal damping.

    Uses Jacobi preconditioning (scale by 1/sqrt(diag)) so the f32 Cholesky
    stays well conditioned — the reference solves in f64 LDLT
    (SURVEY.md §8.3.3); scaling buys back the precision on TPU f32.
    """
    diag = jnp.diagonal(A)
    damped = A + lm_lambda * jnp.diag(diag) + _JITTER * jnp.eye(6, dtype=A.dtype)
    s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(damped), _JITTER))
    As = damped * s[:, None] * s[None, :]
    bs = b * s
    L, low = jax.scipy.linalg.cho_factor(As, lower=True)
    dx = jax.scipy.linalg.cho_solve((L, low), -bs)
    return dx * s
