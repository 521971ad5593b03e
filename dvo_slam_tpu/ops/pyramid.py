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
    if depth.dtype == jnp.uint8:
        # 12-bit packed raw depth (pack_depth12): 1.5 bytes/pixel on the
        # wire instead of 2. Width comes from the intensity image.
        depth = unpack_depth12(depth, intensity.shape[-1])
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


# ---------------------------------------------------------------------------
# 12-bit packed raw depth (streaming-upload transport format).
#
# The stream pipeline is host->device bandwidth bound over remoted chips
# (docs/performance.md): raw u8 intensity + u16 depth is 3 bytes/pixel and
# depth is 2/3 of that. Kinect/TUM raw ticks span 0..65535 (5000/m = 13.1 m)
# but 12 bits at 16-tick granularity cover the same range at +-1.6 mm
# quantization — far below the sensor's own noise (>=2-4 mm past 1 m) and
# two orders below the system's ATE. Packing halves of each ROW (left half
# = value a, right half = value b; (a, b) -> 3 bytes) keeps every plane a
# clean (H, W/2) lane layout on TPU — no size-3 minor dim, no per-pixel
# interleave: the unpack is two shifts, two ors, and one lane concat.
#
# Wire layout (H, 3*W/2) u8, three planes along width:
#   plane0 = a >> 4            (high 8 bits of left-half values)
#   plane1 = (a & 0xF) << 4 | b >> 8
#   plane2 = b & 0xFF
# Zero ticks (invalid) stay exactly zero; nonzero ticks never quantize to
# zero (clamped to >=1), so validity is preserved bit-exactly.
# ---------------------------------------------------------------------------

PACK12_TICK = 16  # raw ticks per 12-bit unit


def pack_depth12(raw_u16):
    """HOST-side: (…, H, W) uint16 raw depth -> (…, H, 3*W/2) uint8.

    numpy in, numpy out (this runs in the ingest thread, next to the PNG
    decoder); W must be even. Inverse (up to 16-tick quantization) is
    unpack_depth12 on device.
    """
    import numpy as np

    raw = np.asarray(raw_u16)
    assert raw.dtype == np.uint16, raw.dtype
    w = raw.shape[-1]
    assert w % 2 == 0, f"pack_depth12 needs even width, got {w}"
    q = np.right_shift(raw.astype(np.uint32) + PACK12_TICK // 2, 4)
    q = np.minimum(q, 4095)
    q = np.where((raw > 0) & (q == 0), 1, q)  # keep validity bit-exact
    a, b = q[..., : w // 2], q[..., w // 2:]
    return np.concatenate(
        [a >> 4, ((a & 0xF) << 4) | (b >> 8), b & 0xFF], axis=-1
    ).astype(np.uint8)


def unpack_depth12(packed_u8, width, scale=5000.0):
    """DEVICE-side: (…, H, 3*W/2) uint8 -> (…, H, W) metric f32 depth.

    Jittable; 0 -> NaN like convert_raw_depth. `width` is the target W
    (static). Fuses into build_pyramid's slab construction under jit.
    """
    w2 = width // 2
    assert packed_u8.shape[-1] == 3 * w2, (packed_u8.shape, width)
    p = packed_u8.astype(jnp.int32)
    p0 = p[..., :w2]
    p1 = p[..., w2: 2 * w2]
    p2 = p[..., 2 * w2:]
    a = (p0 << 4) | (p1 >> 4)
    b = ((p1 & 0xF) << 8) | p2
    q = jnp.concatenate([a, b], axis=-1).astype(jnp.float32)
    return jnp.where(q > 0, q * (PACK12_TICK / scale), jnp.nan)
