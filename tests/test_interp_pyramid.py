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


def test_pack_depth12_roundtrip():
    """pack_depth12 (host) -> unpack_depth12 (device) reconstructs metric
    depth to the 16-tick quantization bound (+-1.6 mm at 5000 ticks/m),
    preserves validity bit-exactly (0 -> NaN, nonzero stays valid across
    the whole u16 range), and clamps at the 12-bit ceiling."""
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 65536, (32, 40)).astype(np.uint16)
    raw[0, :7] = 0  # invalid pixels
    raw[1, 0] = 1  # smallest valid tick must stay valid
    raw[1, 1] = 65535  # clamps to 4095 * 16 = 65520 ticks
    packed = pyramid.pack_depth12(raw)
    assert packed.dtype == np.uint8 and packed.shape == (32, 60)
    d = np.asarray(pyramid.unpack_depth12(jnp.asarray(packed), 40))
    assert d.shape == (32, 40)
    invalid = raw == 0
    assert np.isnan(d[invalid]).all()
    assert np.isfinite(d[~invalid]).all()
    expect = np.minimum((raw.astype(np.int64) + 8) >> 4 << 4, 65520)
    expect = np.maximum(expect, 16 * (raw > 0))  # validity clamp
    np.testing.assert_allclose(
        d[~invalid], expect[~invalid] / 5000.0, rtol=0, atol=1e-6
    )
    # Quantization never exceeds half a tick unit, except the 12-bit clamp
    # tail (>65520) and sub-16-tick values clamped up for validity (both
    # non-physical: 3.2 mm and 13.1 m at TUM's 5000 ticks/m).
    err = np.abs(d[~invalid] * 5000.0 - raw[~invalid])
    mid = (raw[~invalid] >= 16) & (raw[~invalid] <= 65520)
    assert (err[mid] <= 8.01).all()


def test_build_pyramid_accepts_packed_depth():
    """A uint8 depth operand is auto-detected as 12-bit packed: the pyramid
    matches one built from the equivalent quantized u16 raw depth."""
    rng = np.random.default_rng(3)
    intensity = rng.uniform(0, 255, (32, 40)).astype(np.float32)
    raw = (rng.uniform(0, 4.0, (32, 40)) * 5000).astype(np.uint16)
    raw[2, 3] = 0
    packed = pyramid.pack_depth12(raw)
    pyr_packed = pyramid.build_pyramid(intensity, jnp.asarray(packed), 3)
    # Reconstruct the quantized ticks the packed path sees.
    q16 = np.minimum((raw.astype(np.int64) + 8) >> 4, 4095)
    q16 = np.maximum(q16, raw > 0).astype(np.uint16)
    ref_z = np.where(q16 > 0, q16 * 16 / 5000.0, np.nan).astype(np.float32)
    pyr_ref = pyramid.build_pyramid(intensity, jnp.asarray(ref_z), 3)
    for a, b in zip(pyr_packed, pyr_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), equal_nan=True, atol=1e-6
        )
