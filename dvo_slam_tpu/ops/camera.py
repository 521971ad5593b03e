"""Pinhole camera model and per-pyramid-level intrinsics.

TPU-native equivalent of the reference's IntrinsicMatrix
(dvo_core/include/dvo/core/intrinsic_matrix.h: fx, fy, ox, oy +
IntrinsicMatrix::scale) and RgbdImage::buildPointCloud
(dvo_core/src/core/rgbd_image.cpp).

Intrinsics are a flat (4,) array [fx, fy, cx, cy] so they trace cleanly and
batch under vmap. Pixel coordinates follow the reference/OpenCV convention:
integer coordinates land on pixel centers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def intrinsics(fx, fy, cx, cy, dtype=jnp.float32):
    return jnp.asarray([fx, fy, cx, cy], dtype=dtype)


# TUM RGB-D "freiburg1" default calibration (dataset website; the reference
# benchmark uses the camera_info / dataset calibration for 640x480).
TUM_FR1 = (517.3, 516.5, 318.6, 255.3)
TUM_FR2 = (520.9, 521.0, 325.1, 249.7)
TUM_FR3 = (535.4, 539.2, 320.1, 247.6)
TUM_DEFAULT = (525.0, 525.0, 319.5, 239.5)


def scale_intrinsics(K, factor):
    """Rescale intrinsics for a downsampled level.

    Mirrors IntrinsicMatrix::scale with the half-pixel-center correction:
    a pixel center u at full resolution maps to (u + 0.5) * s - 0.5 at
    scale s.
    """
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    return jnp.stack(
        [fx * factor, fy * factor, (cx + 0.5) * factor - 0.5, (cy + 0.5) * factor - 0.5]
    )


def pyramid_intrinsics(K, num_levels):
    """Tuple of per-level intrinsics, level 0 = finest."""
    return tuple(scale_intrinsics(K, 0.5**lvl) for lvl in range(num_levels))


def pixel_grid(height, width, dtype=jnp.float32):
    """(H*W,) u and v pixel-center coordinates, row-major flattened."""
    v, u = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype), indexing="ij"
    )
    return u.reshape(-1), v.reshape(-1)


def backproject(depth_flat, u, v, K):
    """Back-project pixels to 3D camera-frame points.

    p = Z * K^{-1} (u, v, 1)  (reference: RgbdImage::buildPointCloud).
    depth_flat: (N,) metric depth (NaN = invalid); u, v: (N,) pixel coords.
    Returns (N, 3).
    """
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    x = (u - cx) / fx * depth_flat
    y = (v - cy) / fy * depth_flat
    return jnp.stack([x, y, depth_flat], axis=-1)


def project(points, K):
    """Project camera-frame points (N, 3) to pixel coords (N, 2) [u, v].

    Uses a sign-preserving epsilon guard on z so points behind the camera
    project far out of bounds (masked by the sampler) instead of NaN.
    """
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    z = points[..., 2]
    z_safe = _safe_z(z)
    u = fx * points[..., 0] / z_safe + cx
    v = fy * points[..., 1] / z_safe + cy
    return jnp.stack([u, v], axis=-1)


def _safe_z(z, eps=1e-8):
    """Sign-preserving epsilon guard: z in (-eps, 0] clamps to -eps (still
    behind the camera), [0, eps) to +eps — never flips a behind-the-camera
    point to the front."""
    return jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)


def projection_jacobian(points, K):
    """d(u,v)/d(p) at camera-frame points: (N, 3) -> (N, 2, 3).

    J_pi = [[fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]]  (SURVEY.md §4.2).
    """
    fx, fy = K[0], K[1]
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    z_safe = _safe_z(z)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(x)
    row0 = jnp.stack([fx * inv_z, zeros, -fx * x * inv_z2], axis=-1)
    row1 = jnp.stack([zeros, fy * inv_z, -fy * y * inv_z2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def intrinsics_np(fx, fy, cx, cy):
    """Host-side (numpy f64) intrinsics."""
    return np.array([fx, fy, cx, cy], dtype=np.float64)
