"""Analytic Jacobian vs jax autodiff.

Design note: the analytic J uses precomputed central-difference image
gradients sampled at the warped position, while autodiff through the
bilinear sampler yields the sampler's piecewise derivative — these only
agree exactly when the image is globally LINEAR in (u, v). So the fixture
uses linear intensity and linear depth images, where both discretizations
equal the true derivative and the comparison is exact to float tolerance.
This validates the full geometric chain (backproject -> transform ->
project -> sample) of SURVEY.md §4.2.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.ops import camera, pyramid, residuals, se3
from dvo_slam_tpu.utils import se3_np


def _linear_images(h, w):
    v, u = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
                       indexing="ij")
    intensity = 50.0 + 0.8 * u - 0.5 * v
    depth = 2.0 + 0.004 * u + 0.003 * v
    return jnp.asarray(intensity), jnp.asarray(depth)


def test_analytic_jacobian_matches_autodiff():
    H, W = 24, 32
    K = camera.intrinsics(40.0, 40.0, (W - 1) / 2, (H - 1) / 2)
    i_ref, z_ref = _linear_images(H, W)
    i_cur, z_cur = _linear_images(H, W)
    ref_slab = pyramid.build_slab(i_ref, z_ref)
    cur_slab = pyramid.build_slab(i_cur, z_cur)

    T0 = jnp.asarray(se3_np.exp(np.array([0.01, -0.02, 0.015, 0.004, -0.003, 0.002])),
                     jnp.float32)
    points, i1, selected = residuals.reference_points(ref_slab, K)

    out = residuals.compute_residuals(points, i1, selected, cur_slab, K, T0)
    J_analytic = np.asarray(out["J"])
    valid = np.asarray(out["valid"])

    def r_of_xi(xi):
        T = se3.exp(xi) @ T0
        return residuals.compute_residuals(points, i1, selected, cur_slab, K, T)["r"]

    J_auto = np.asarray(jax.jacfwd(r_of_xi)(jnp.zeros(6)))  # (N, 2, 6)

    # Compare on strictly-interior valid points (exclude the border ring
    # where one-sided gradient stencils differ from bilinear derivatives).
    uv_mask = np.zeros((H, W), bool)
    uv_mask[2:-2, 2:-2] = True
    sel = valid & uv_mask.reshape(-1)
    assert sel.sum() > 100
    np.testing.assert_allclose(J_auto[sel], J_analytic[sel], atol=5e-3, rtol=1e-3)


def test_residual_zero_at_identity_same_frame():
    H, W = 24, 32
    K = camera.intrinsics(40.0, 40.0, (W - 1) / 2, (H - 1) / 2)
    i_img, z_img = _linear_images(H, W)
    slab = pyramid.build_slab(i_img, z_img)
    points, i1, selected = residuals.reference_points(slab, K)
    out = residuals.compute_residuals(points, i1, selected, slab, K, jnp.eye(4))
    r = np.asarray(out["r"])[np.asarray(out["valid"])]
    np.testing.assert_allclose(r, 0.0, atol=1e-3)


def test_residual_sign_convention():
    """Moving the camera toward the scene (+z) must make sampled depth
    smaller than predicted? Verify r_Z = Z2(x') - p'_z directly."""
    H, W = 16, 16
    K = camera.intrinsics(20.0, 20.0, 7.5, 7.5)
    i_img = jnp.zeros((H, W))
    z_ref = jnp.full((H, W), 2.0)
    z_cur = jnp.full((H, W), 2.5)  # current frame sees deeper surface
    ref_slab = pyramid.build_slab(i_img, z_ref)
    cur_slab = pyramid.build_slab(i_img, z_cur)
    points, i1, selected = residuals.reference_points(ref_slab, K)
    out = residuals.compute_residuals(points, i1, selected, cur_slab, K, jnp.eye(4))
    r_z = np.asarray(out["r"])[:, 1][np.asarray(out["valid"])]
    np.testing.assert_allclose(r_z, 0.5, atol=1e-4)
