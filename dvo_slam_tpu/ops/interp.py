"""Bilinear interpolation via gathers.

TPU-native equivalent of the reference's Interpolation::bilinear
(dvo_core/src/core/interpolation.cpp), generalized to sample a multi-channel
"slab" (the reference's packed IntensityAndDepth acceleration structure,
dvo_core/src/core/rgbd_image.cpp RgbdImage::buildAccelerationStructure) with
one set of corner gathers.

NaN handling: invalid depth is NaN; any NaN corner propagates into the sample
(0-weight corners included, since 0*NaN=NaN), so validity is simply
isfinite(sample) — stricter than, but consistent with, the reference's
NaN-aware sampling.

ROLE: GOLDEN MODEL, not the production path. Production sampling lives in
ops/linearize._sample_gather (fused into the linearization) and
ops/pallas/sampler.py (the MXU kernel); this standalone version is the
oracle tests/test_interp_pyramid.py and tests/test_pallas_sampler.py
compare those against. Change them together.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear(slab, uv):
    """Bilinearly sample a (H, W, C) slab at (N, 2) [u, v] pixel coords.

    Returns:
      values: (N, C) sampled values (NaN where any touched texel is NaN).
      inbounds: (N,) bool, True where the full 2x2 footprint lies inside.
    """
    H, W, C = slab.shape
    u, v = uv[..., 0], uv[..., 1]

    u0f = jnp.floor(u)
    v0f = jnp.floor(v)
    inbounds = (u0f >= 0) & (v0f >= 0) & (u0f <= W - 2) & (v0f <= H - 2)

    u0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 2)
    v0 = jnp.clip(v0f.astype(jnp.int32), 0, H - 2)
    fu = (u - u0.astype(u.dtype))[..., None]
    fv = (v - v0.astype(v.dtype))[..., None]

    flat = slab.reshape(H * W, C)
    base = v0 * W + u0
    s00 = jnp.take(flat, base, axis=0, mode="clip")
    s01 = jnp.take(flat, base + 1, axis=0, mode="clip")
    s10 = jnp.take(flat, base + W, axis=0, mode="clip")
    s11 = jnp.take(flat, base + W + 1, axis=0, mode="clip")

    top = s00 + fu * (s01 - s00)
    bot = s10 + fu * (s11 - s10)
    return top + fv * (bot - top), inbounds
