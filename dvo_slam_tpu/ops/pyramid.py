"""RGB-D image pyramids with NaN-aware depth downsampling and gradients.

TPU-native equivalent of the reference's RgbdImagePyramid / RgbdImage
(dvo_core/src/core/rgbd_image.cpp): per-level float intensity + metric depth,
central-difference gradients (x0.5), intensity 2x2-average downsampling, and
invalid-aware (NaN) depth downsampling. The per-level 6-channel "slab"
[I, Z, dI/dx, dI/dy, dZ/dx, dZ/dy] replaces the reference's interleaved
IntensityAndDepth SSE acceleration structure
(RgbdImage::buildAccelerationStructure): one bilinear sample of the slab
fetches everything the IRLS inner loop needs at a warped pixel.

Slabs are CHANNEL-MAJOR (6, H, W): with channels minor ((H, W, 6)) the
array's last dimension pads to 128 lanes on TPU, inflating every slab
write/read ~21x — building a 640x480 pyramid cost 0.65 ms that way and
0.04 ms this way.

All functions are jittable and shape-static; a pyramid is a tuple (one entry
per level, finest first) so it works as a pytree leaf container in vmap-ed
batched tracking.
"""

from __future__ import annotations

import jax.numpy as jnp

# Slab channel indices.
CH_I, CH_Z, CH_IDX, CH_IDY, CH_ZDX, CH_ZDY = 0, 1, 2, 3, 4, 5
NUM_CHANNELS = 6


import jax


def _pool2x2_sum(x):
    """2x2/stride-2 window sum via reduce_window (TPU pooling path).

    A reshape to (H/2, 2, W/2, 2) would put a size-2 dimension minormost,
    which pads to 128 lanes and costs ~64x its logical bandwidth.
    """
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (2, 2), (2, 2), "VALID"
    )


def downsample_intensity(img):
    """2x2 box-average downsample (reference RgbdImagePyramid intensity path)."""
    return _pool2x2_sum(img) * 0.25


def downsample_depth(depth):
    """NaN-aware 2x2 average: mean of the finite texels, NaN if none.

    Mirrors the reference's invalid-aware depth downsampling (SURVEY.md C2):
    a plain average would smear NaN/0 invalid pixels across the pyramid.
    """
    finite = jnp.isfinite(depth)
    total = _pool2x2_sum(jnp.where(finite, depth, 0.0))
    count = _pool2x2_sum(finite.astype(depth.dtype))
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), jnp.nan)


def gradients(img):
    """Central-difference gradients x0.5 (reference RgbdImage::calculateDerivative*).

    Borders use one-sided differences scaled to match; NaNs in `img`
    propagate to neighbouring gradient texels (validity handled by the
    sampler's isfinite check).
    """
    # d/dx
    left = jnp.concatenate([img[:, :1], img[:, :-1]], axis=1)
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    dx = 0.5 * (right - left)
    # d/dy
    up = jnp.concatenate([img[:1, :], img[:-1, :]], axis=0)
    down = jnp.concatenate([img[1:, :], img[-1:, :]], axis=0)
    dy = 0.5 * (down - up)
    return dx, dy


def build_slab(intensity, depth):
    """Stack one level's [I, Z, Ix, Iy, Zx, Zy] -> (6, H, W)."""
    idx, idy = gradients(intensity)
    zdx, zdy = gradients(depth)
    return jnp.stack([intensity, depth, idx, idy, zdx, zdy], axis=0)


def build_pyramid(intensity, depth, num_levels):
    """Build the full pyramid: tuple of (6, H/2^l, W/2^l) slabs, finest first.

    intensity: (H, W) float (0..255 grayscale); depth: (H, W) metric meters,
    NaN = invalid. Equivalent to RgbdImagePyramid::build +
    per-level buildAccelerationStructure.

    RAW sensor dtypes are accepted and converted on device: uint8
    intensity (PNG grayscale) and uint16 depth (Kinect/TUM raw, 5000
    units/m — convert_raw_depth). Streaming callers upload the raw 3
    bytes/pixel instead of 8 (f32 pair), which matters when host->device
    bandwidth bounds the pipeline (docs/performance.md).
    """
    if intensity.dtype == jnp.uint8:
        intensity = intensity.astype(jnp.float32)
    if depth.dtype == jnp.uint16:
        depth = convert_raw_depth(depth)
    levels = []
    cur_i, cur_z = intensity, depth
    for lvl in range(num_levels):
        levels.append(build_slab(cur_i, cur_z))
        if lvl + 1 < num_levels:
            cur_i = downsample_intensity(cur_i)
            cur_z = downsample_depth(cur_z)
    return tuple(levels)


def convert_raw_depth(raw_u16, scale=5000.0):
    """Kinect raw uint16 -> metric float depth; 0 -> NaN.

    Reference: SurfacePyramid::convertRawDepthImage
    (dvo_core/src/core/surface_pyramid.cpp); TUM RGB-D stores depth as
    uint16 with 5000 units per meter.
    """
    d = raw_u16.astype(jnp.float32)
    return jnp.where(d > 0, d / scale, jnp.nan)
