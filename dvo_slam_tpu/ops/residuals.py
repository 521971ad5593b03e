"""Warp, bivariate residuals, and analytic 6-DoF Jacobians.

TPU-native equivalent of the reference's IRLS inner-loop kernels
(dvo_core/src/dense_tracking_impl.cpp: computeResiduals[Sse],
computeResidualsAndValidFlagsSse) — the math of SURVEY.md §4.1–4.2:

  p  = Z1(x) * K^{-1} (x, 1)          back-projected reference point
  p' = T p                            current rigid estimate
  x' = pi(p')                         pinhole projection
  r_I = I2(x') - I1(x)                photometric residual
  r_Z = Z2(x') - p'_z                 geometric residual
  J_I = grad I2(x')^T J_pi [I | -[p']x]
  J_Z = grad Z2(x')^T J_pi [I | -[p']x] - e3^T [I | -[p']x]

Everything operates on fixed-shape flattened per-level arrays with validity
masks (SURVEY.md §8.1: selection is a mask, not compaction).

ROLE: GOLDEN MODEL, not the production path. The tracker's hot loop uses
the fused channel-major formulation in ops/linearize.py (same math, laid
out for the MXU); this modular version exists as the readable oracle that
tests/test_jacobian.py checks against jax.grad numerics and against
linearize's fused output. Change the two together.
"""

from __future__ import annotations

import jax.numpy as jnp

from dvo_slam_tpu.ops import camera, interp
from dvo_slam_tpu.ops import pyramid as pyr


def reference_points(ref_slab, K, intensity_grad_threshold=0.0, depth_grad_threshold=0.0,
                     row_offset=0):
    """Extract the reference-frame quantities the IRLS loop needs.

    Equivalent of PointSelection + RgbdImage::buildPointCloud
    (dvo_core/src/core/point_selection.cpp): valid depth plus optional
    |grad I| / |grad Z| thresholds, as a mask over the full pixel grid.

    `row_offset` shifts the pixel-grid v coordinate — used when the
    reference image is row-sharded across a mesh axis and this shard holds
    rows [row_offset, row_offset + H).

    Returns (points (N,3), intensity (N,), selected (N,)) with N = H*W.
    """
    _, H, W = ref_slab.shape
    u, v = camera.pixel_grid(H, W, dtype=ref_slab.dtype)
    v = v + row_offset
    z = ref_slab[pyr.CH_Z].reshape(-1)
    i1 = ref_slab[pyr.CH_I].reshape(-1)
    points = camera.backproject(z, u, v, K)

    selected = jnp.isfinite(z)
    if intensity_grad_threshold > 0.0:
        gi = jnp.hypot(
            ref_slab[pyr.CH_IDX].reshape(-1), ref_slab[pyr.CH_IDY].reshape(-1)
        )
        selected &= gi >= intensity_grad_threshold
    if depth_grad_threshold > 0.0:
        gz = jnp.hypot(
            ref_slab[pyr.CH_ZDX].reshape(-1), ref_slab[pyr.CH_ZDY].reshape(-1)
        )
        selected &= jnp.isfinite(gz) & (gz >= depth_grad_threshold)
    return points, i1, selected


def compute_residuals(points, i1, selected, cur_slab, K, T, sampler=interp.bilinear):
    """One IRLS linearization: residuals + Jacobians at pose T.

    Args:
      points: (N, 3) reference back-projections (NaN rows where invalid).
      i1: (N,) reference intensities.
      selected: (N,) reference-side validity/selection mask.
      cur_slab: (6, H, W) current-frame slab [I, Z, Ix, Iy, Zx, Zy].
      K: (4,) intrinsics of this level.
      T: (4, 4) current pose estimate (maps reference camera frame to
         current camera frame).
      sampler: bilinear sampling fn (swap-in point for the Pallas kernel).

    Returns dict with r (N, 2), J (N, 2, 6), valid (N,).
    """
    R = T[:3, :3]
    t = T[:3, 3]
    p_cur = points @ R.T + t  # (N, 3)
    uv = camera.project(p_cur, K)

    # interp.bilinear samples (H, W, C); the canonical slab is (C, H, W).
    sampled, inbounds = sampler(jnp.transpose(cur_slab, (1, 2, 0)), uv)
    i2 = sampled[:, pyr.CH_I]
    z2 = sampled[:, pyr.CH_Z]
    grad_i2 = sampled[:, (pyr.CH_IDX, pyr.CH_IDY)]  # (N, 2)
    grad_z2 = sampled[:, (pyr.CH_ZDX, pyr.CH_ZDY)]  # (N, 2)

    r_i = i2 - i1
    r_z = z2 - p_cur[:, 2]
    r = jnp.stack([r_i, r_z], axis=-1)

    valid = (
        selected
        & inbounds
        & (p_cur[:, 2] > 1e-6)
        & jnp.isfinite(r_i)
        & jnp.isfinite(r_z)
        & jnp.isfinite(grad_z2).all(axis=-1)
    )
    r = jnp.where(valid[:, None], r, 0.0)

    # d p'/d xi = [I3 | -[p']x] for the left-increment twist (v, w):
    # columns 0..2 identity, columns 3..5 -hat(p').
    x, y, z = p_cur[:, 0], p_cur[:, 1], p_cur[:, 2]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # Jg: (N, 3, 6)
    Jg = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros, zeros, z, -y], axis=-1),
            jnp.stack([zeros, ones, zeros, -z, zeros, x], axis=-1),
            jnp.stack([zeros, zeros, ones, y, -x, zeros], axis=-1),
        ],
        axis=-2,
    )

    J_pi = camera.projection_jacobian(p_cur, K)  # (N, 2, 3)
    J_px = jnp.einsum("nij,njk->nik", J_pi, Jg)  # (N, 2, 6) d x'/d xi

    grad_i2 = jnp.where(valid[:, None], grad_i2, 0.0)
    grad_z2 = jnp.where(valid[:, None], grad_z2, 0.0)

    J_i = jnp.einsum("ni,nik->nk", grad_i2, J_px)  # (N, 6)
    J_z = jnp.einsum("ni,nik->nk", grad_z2, J_px) - Jg[:, 2, :]  # (N, 6)
    J = jnp.stack([J_i, J_z], axis=-2)  # (N, 2, 6)
    J = jnp.where(valid[:, None, None], J, 0.0)

    return {"r": r, "J": J, "valid": valid}
