"""Camera model tests: projection round trips and intrinsics scaling."""

import jax
import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.ops import camera


def test_project_backproject_roundtrip():
    K = camera.intrinsics(525.0, 525.0, 319.5, 239.5)
    u, v = camera.pixel_grid(48, 64)
    depth = jnp.full_like(u, 2.0)
    p = camera.backproject(depth, u, v, K)
    uv = camera.project(p, K)
    np.testing.assert_allclose(np.asarray(uv[:, 0]), np.asarray(u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(uv[:, 1]), np.asarray(v), atol=1e-4)


def test_scale_intrinsics_center_alignment():
    """Halving resolution must keep back-projected rays identical: a pixel
    center at level l+1 corresponds to the midpoint of a 2x2 block at l."""
    K0 = camera.intrinsics(517.3, 516.5, 318.6, 255.3)
    K1 = camera.scale_intrinsics(K0, 0.5)
    # Pixel (u1, v1) at level 1 covers pixels (2u1, 2v1)..(2u1+1, 2v1+1) at
    # level 0; its center is (2u1 + 0.5, 2v1 + 0.5).
    u1, v1 = 10.0, 7.0
    p1 = camera.backproject(jnp.asarray([1.0]), jnp.asarray([u1]), jnp.asarray([v1]), K1)
    p0 = camera.backproject(
        jnp.asarray([1.0]), jnp.asarray([2 * u1 + 0.5]), jnp.asarray([2 * v1 + 0.5]), K0
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-5)


def test_projection_jacobian_matches_autodiff():
    K = camera.intrinsics(500.0, 480.0, 320.0, 240.0)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(
        np.stack(
            [rng.uniform(-1, 1, 16), rng.uniform(-1, 1, 16), rng.uniform(0.5, 4.0, 16)],
            axis=-1,
        ),
        jnp.float32,
    )
    J_analytic = camera.projection_jacobian(pts, K)
    J_auto = jax.vmap(jax.jacfwd(lambda p: camera.project(p, K)))(pts)
    np.testing.assert_allclose(np.asarray(J_analytic), np.asarray(J_auto), atol=1e-3)


def test_pyramid_intrinsics_levels():
    K = camera.intrinsics(525.0, 525.0, 319.5, 239.5)
    Ks = camera.pyramid_intrinsics(K, 4)
    assert len(Ks) == 4
    np.testing.assert_allclose(float(Ks[1][0]), 262.5, atol=1e-5)
    np.testing.assert_allclose(float(Ks[3][0]), 65.625, atol=1e-5)
