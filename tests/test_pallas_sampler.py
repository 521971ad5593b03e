"""Pallas windowed sampler vs the gather reference (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.ops import interp
from dvo_slam_tpu.ops import linearize as lin_ops
from dvo_slam_tpu.ops import camera, pyramid
from dvo_slam_tpu.ops.pallas import sampler
from dvo_slam_tpu.utils import se3_np, synthetic

H, W, C = 32, 128, 6  # small: interpret mode is slow
N = H * W


def _coords(max_shift=3.0):
    vg, ug = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    du = max_shift * jnp.sin(jnp.arange(N) / 300.0)
    dv = max_shift * jnp.cos(jnp.arange(N) / 400.0)
    return ug.reshape(-1) + du, vg.reshape(-1) + dv


def test_sampler_matches_gather_bilinear():
    slab = jax.random.normal(jax.random.PRNGKey(0), (C, H, W), jnp.float32)
    u, v = _coords()
    cm = sampler.slab_to_cmajor(slab)
    smp, valid = sampler.sample_slab(
        cm, u, v, height=H, rows_per_tile=1, margin=8,
        precision=jax.lax.Precision.HIGHEST, interpret=True,
    )
    ref_vals, ref_inb = interp.bilinear(
        jnp.transpose(slab, (1, 2, 0)), jnp.stack([u, v], axis=-1)
    )
    valid = np.asarray(valid)
    ref_inb = np.asarray(ref_inb)
    both = valid & ref_inb
    assert both.mean() > 0.8
    # No spurious extra masking for these small shifts (margin 8 > 3).
    assert (ref_inb & ~valid).mean() == 0.0
    np.testing.assert_allclose(
        np.asarray(smp).T[both], np.asarray(ref_vals)[both], atol=1e-5
    )


def test_sampler_nan_depth_semantics():
    """NaN pixels must invalidate ONLY points whose 2x2 footprint touches
    them — not poison the whole band through the one-hot matmul."""
    slab = jax.random.normal(jax.random.PRNGKey(1), (C, H, W), jnp.float32)
    nan_px = [(5, 40), (20, 7), (29, 100)]
    for (r, c) in nan_px:
        slab = slab.at[1, r, c].set(jnp.nan)  # depth channel
    u, v = _coords()
    cm = sampler.slab_to_cmajor(slab)
    smp, valid = sampler.sample_slab(
        cm, u, v, height=H, rows_per_tile=1, margin=8,
        precision=jax.lax.Precision.HIGHEST, interpret=True,
    )
    smp = np.asarray(smp)
    valid = np.asarray(valid)
    # No NaN ever leaves the kernel, and valid points match the gather path.
    assert np.isfinite(smp).all()
    chans, inb = lin_ops._sample_gather(slab, u, v)
    ref_ok = np.array(inb)
    for ch in chans:
        ref_ok &= np.isfinite(np.asarray(ch))
    # No over-masking: every gather-valid point stays valid.
    assert not (ref_ok & ~valid).any()
    # Slip-throughs allowed only where the smallest corner weight is below
    # the matmul noise floor (negligible zero-substitution bias).
    fx = np.asarray(u - jnp.clip(jnp.floor(u), 0, W - 2))
    fy = np.asarray(v - jnp.clip(jnp.floor(v), 0, H - 2))
    w_min = np.minimum(fx, 1 - fx) * np.minimum(fy, 1 - fy)
    slipped = valid & ~ref_ok
    assert (w_min[slipped] < 2 * sampler._MASK_NOISE_HIGHEST).all()
    # Values agree exactly on the commonly-valid points.
    ref_vals = np.stack([np.asarray(ch) for ch in chans])
    both = valid & ref_ok
    np.testing.assert_allclose(smp[:, both], ref_vals[:, both], atol=1e-5)
    assert valid.mean() > 0.9  # the 3 NaNs only kill a handful of points


def test_sampler_window_masking():
    """Points far outside the band window must be masked, not mis-sampled."""
    slab = jnp.ones((C, H, W))
    vg, ug = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    u = ug.reshape(-1)
    v = vg.reshape(-1).at[:128].add(25.0)  # first row jumps far below band
    cm = sampler.slab_to_cmajor(slab)
    _, valid = sampler.sample_slab(
        cm, u, v, height=H, rows_per_tile=1, margin=4,
        precision=jax.lax.Precision.HIGHEST, interpret=True,
    )
    valid = np.asarray(valid)
    # In-image but out-of-window points masked; the rest kept.
    assert valid[256:].mean() > 0.9


def test_tracker_pallas_backend_matches_gather():
    """Full coarse-to-fine track with the pallas sampler (interpret) must
    agree with the gather path."""
    from dvo_slam_tpu.models import dense_tracker

    Wi, Hi = 64, 32
    K_t = (40.0, 40.0, (Wi - 1) / 2, (Hi - 1) / 2)
    scene = synthetic.two_plane_scene()
    xi = np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.005])
    T_rel = se3_np.exp(xi)
    i0, z0 = scene.render(np.asarray(K_t), Wi, Hi, np.eye(4))
    i1, z1 = scene.render(np.asarray(K_t), Wi, Hi, se3_np.inverse(T_rel))
    # Kinect-style NaN-invalid depth holes in BOTH frames (the pallas path
    # must not let a single NaN poison a whole sampling band).
    rng = np.random.default_rng(3)
    z0[rng.random(z0.shape) < 0.03] = np.nan
    z1[rng.random(z1.shape) < 0.03] = np.nan
    Ks = camera.pyramid_intrinsics(camera.intrinsics(*K_t), 2)
    ref = pyramid.build_pyramid(jnp.asarray(i0), jnp.asarray(z0), 2)
    cur = pyramid.build_pyramid(jnp.asarray(i1), jnp.asarray(z1), 2)

    cfg_g = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                          max_iterations=15)
    cfg_p = dataclasses.replace(
        cfg_g, sampler_backend="pallas", pallas_precision="highest",
        pallas_rows_per_tile=2,
    )
    rg = dense_tracker.track_jit(ref, cur, Ks, jnp.eye(4), cfg_g)
    rp = dense_tracker.track_jit(ref, cur, Ks, jnp.eye(4), cfg_p)
    np.testing.assert_allclose(
        np.asarray(rp.transformation), np.asarray(rg.transformation), atol=1e-5
    )
    assert abs(float(rp.valid_pixels) - float(rg.valid_pixels)) <= 2
