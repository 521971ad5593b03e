"""Bilinear sampling and pyramid tests."""

import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.ops import interp, pyramid


def _ramp(h, w, a=0.0, bx=1.0, by=0.0):
    v, u = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
                       indexing="ij")
    return a + bx * u + by * v


def test_bilinear_at_integer_coords():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(16, 20)).astype(np.float32)
    slab = jnp.asarray(img)[..., None]
    uv = jnp.asarray([[3.0, 5.0], [0.0, 0.0], [18.0, 14.0]])
    vals, ok = interp.bilinear(slab, uv)
    np.testing.assert_allclose(
        np.asarray(vals[:, 0]), [img[5, 3], img[0, 0], img[14, 18]], atol=1e-6
    )
    assert np.asarray(ok).all()


def test_bilinear_exact_on_linear_image():
    img = jnp.asarray(_ramp(16, 20, a=2.0, bx=0.5, by=-0.25))[..., None]
    rng = np.random.default_rng(1)
    uv = jnp.asarray(
        np.stack([rng.uniform(0, 18.9, 50), rng.uniform(0, 14.9, 50)], axis=-1),
        jnp.float32,
    )
    vals, ok = interp.bilinear(img, uv)
    expected = 2.0 + 0.5 * np.asarray(uv[:, 0]) - 0.25 * np.asarray(uv[:, 1])
    np.testing.assert_allclose(np.asarray(vals[:, 0]), expected, atol=1e-4)
    assert np.asarray(ok).all()


def test_bilinear_out_of_bounds_masked():
    img = jnp.ones((8, 8, 1))
    uv = jnp.asarray([[-0.5, 3.0], [3.0, -0.1], [7.5, 3.0], [3.0, 7.2], [6.99, 6.99]])
    _, ok = interp.bilinear(img, uv)
    np.testing.assert_array_equal(np.asarray(ok), [False, False, False, False, True])


def test_bilinear_nan_propagates():
    img = np.ones((8, 8), np.float32)
    img[4, 4] = np.nan
    vals, ok = interp.bilinear(jnp.asarray(img)[..., None], jnp.asarray([[3.5, 3.5]]))
    assert bool(ok[0])
    assert not np.isfinite(np.asarray(vals)[0, 0])


def test_downsample_intensity_box():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    down = pyramid.downsample_intensity(img)
    np.testing.assert_allclose(np.asarray(down), [[2.5, 4.5], [10.5, 12.5]])


def test_downsample_depth_nan_aware():
    d = np.full((4, 4), 2.0, np.float32)
    d[0, 0] = np.nan  # block (0,0): 3 valid -> mean of the rest
    d[2:, 2:] = np.nan  # block (1,1): all invalid -> NaN
    down = np.asarray(pyramid.downsample_depth(jnp.asarray(d)))
    np.testing.assert_allclose(down[0, 0], 2.0)
    assert np.isnan(down[1, 1])
    np.testing.assert_allclose(down[0, 1], 2.0)


def test_gradients_of_linear_ramp():
    img = jnp.asarray(_ramp(12, 16, bx=0.7, by=-0.3))
    dx, dy = pyramid.gradients(img)
    # Interior: central difference of a linear ramp is exact.
    np.testing.assert_allclose(np.asarray(dx[1:-1, 1:-1]), 0.7, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy[1:-1, 1:-1]), -0.3, atol=1e-5)


def test_build_pyramid_shapes():
    intensity = jnp.zeros((64, 80))
    depth = jnp.full((64, 80), 2.0)
    pyr = pyramid.build_pyramid(intensity, depth, 4)
    assert len(pyr) == 4
    assert pyr[0].shape == (6, 64, 80)
    assert pyr[3].shape == (6, 8, 10)


def test_convert_raw_depth():
    raw = jnp.asarray(np.array([[0, 5000], [10000, 2500]], np.uint16))
    d = np.asarray(pyramid.convert_raw_depth(raw))
    assert np.isnan(d[0, 0])
    np.testing.assert_allclose(d[0, 1], 1.0)
    np.testing.assert_allclose(d[1, 0], 2.0)
    np.testing.assert_allclose(d[1, 1], 0.5)
