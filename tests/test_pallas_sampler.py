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
    smp, valid, _ = sampler.sample_slab(
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
    smp, valid, _ = sampler.sample_slab(
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
    # HALF of the first band jumps far down-image: the band window follows
    # the band MEAN row, so the jumped half leaves the window while the
    # staying half remains inside it.
    v = vg.reshape(-1).at[:64].add(25.0)
    cm = sampler.slab_to_cmajor(slab)
    _, valid, win_miss = sampler.sample_slab(
        cm, u, v, height=H, rows_per_tile=1, margin=1,
        precision=jax.lax.Precision.HIGHEST, interpret=True,
    )
    valid = np.asarray(valid)
    win_miss = np.asarray(win_miss)
    # In-image but out-of-window points masked; the rest kept.
    assert valid[256:].mean() > 0.9
    assert not valid[:64].any()
    # The masked points are REPORTED as window misses (observability:
    # distinct from NaN/out-of-bounds invalidity), and only they are.
    assert win_miss[:64].mean() > 0.9
    assert not win_miss[256:].any()
    assert not (valid & win_miss).any()


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


def test_tracker_pallas_reference_gradients_matches_gather():
    """gradient_source="reference" with the pallas sampler (the 2-channel
    [I, Z]+mask slab fast path) must agree with the gather backend in the
    same mode."""
    from dvo_slam_tpu.models import dense_tracker

    Wi, Hi = 64, 32
    K_t = (40.0, 40.0, (Wi - 1) / 2, (Hi - 1) / 2)
    scene = synthetic.two_plane_scene()
    xi = np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.005])
    T_rel = se3_np.exp(xi)
    i0, z0 = scene.render(np.asarray(K_t), Wi, Hi, np.eye(4))
    i1, z1 = scene.render(np.asarray(K_t), Wi, Hi, se3_np.inverse(T_rel))
    rng = np.random.default_rng(3)
    z0[rng.random(z0.shape) < 0.03] = np.nan
    z1[rng.random(z1.shape) < 0.03] = np.nan
    Ks = camera.pyramid_intrinsics(camera.intrinsics(*K_t), 2)
    ref = pyramid.build_pyramid(jnp.asarray(i0), jnp.asarray(z0), 2)
    cur = pyramid.build_pyramid(jnp.asarray(i1), jnp.asarray(z1), 2)

    cfg_g = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                          max_iterations=15, gradient_source="reference")
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
    # And it really converged to the truth.
    err = np.linalg.norm(se3_np.log(
        np.asarray(rp.transformation, np.float64) @ se3_np.inverse(T_rel)
    ))
    assert err < 2e-3, f"pose error {err}"


def test_violent_motion_escalates_to_gather():
    """fr1-class angular velocity between frames pushes warped rows past a
    small pallas window: the tracker must REPORT the masking
    (window_miss_frac) and the escalating dual-track wrapper must recover
    the gather backend's pose instead of silently losing accuracy."""
    from dvo_slam_tpu.models import dense_tracker

    Wi, Hi = 128, 32
    K_t = (40.0, 40.0, (Wi - 1) / 2, (Hi - 1) / 2)
    scene = synthetic.two_plane_scene()
    # Large ROLL (rotation about the optical axis), fr1-class angular
    # velocity at 30 Hz: rows move DIFFERENTIALLY across each band
    # (±x*sin(theta) ≈ ±19 rows at the image edges) — the per-band
    # window follows the band MEAN, so differential motion is exactly
    # what escapes a narrow window.
    xi = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.3])
    T_rel = se3_np.exp(xi)
    i0, z0 = scene.render(np.asarray(K_t), Wi, Hi, np.eye(4))
    i1, z1 = scene.render(np.asarray(K_t), Wi, Hi, se3_np.inverse(T_rel))
    Ks = camera.pyramid_intrinsics(camera.intrinsics(*K_t), 1)
    ref = pyramid.build_pyramid(jnp.asarray(i0), jnp.asarray(z0), 1)
    cur = pyramid.build_pyramid(jnp.asarray(i1), jnp.asarray(z1), 1)

    cfg_g = TrackerConfig(num_levels=1, first_level=0, last_level=0,
                          max_iterations=15)
    # Single-level track with a restrictive window: rows_per_tile 4 on
    # the 128-wide level -> 8 bands of height 4; margin 1 -> Hw = 16 of
    # 32 image rows.
    cfg_p = dataclasses.replace(
        cfg_g, sampler_backend="pallas", pallas_precision="highest",
        pallas_rows_per_tile=4, pallas_margin=1,
    )

    rg = dense_tracker.track_jit(ref, cur, Ks, jnp.eye(4), cfg_g)
    rp = dense_tracker.track_jit(ref, cur, Ks, jnp.eye(4), cfg_p)
    # Detection: the narrow window masked a meaningful fraction.
    assert float(rp.window_miss_frac) > 0.02
    assert float(rg.window_miss_frac) == 0.0

    # Escalation: the batched wrapper re-tracks with gather and matches
    # the BATCHED gather baseline (vmap changes f32 reduction order, so
    # the unbatched gather track is only close, not bit-equal).
    refs = tuple(jnp.stack([l, l]) for l in ref)
    inits = jnp.stack([jnp.eye(4)] * 2)
    fn = jax.jit(
        lambda r, c, t: dense_tracker.track_batched_escalating(
            r, c, Ks, t, cfg_p
        )
    )
    re = fn(refs, cur, inits)
    assert bool(np.asarray(re.escalated).all())
    assert float(np.asarray(re.window_miss_frac).max()) == 0.0  # gather rerun

    # Pose error vs ground truth must match the gather backend's quality
    # (this single-level violent-roll problem is numerically chaotic —
    # XLA reduction-order noise shifts individual iterates — so compare
    # error magnitudes, not matrix entries).
    rg_b = dense_tracker.track_batched(refs, cur, Ks, inits, cfg_g)
    err = lambda T: np.linalg.norm(se3_np.log(
        np.asarray(T, np.float64) @ se3_np.inverse(T_rel)
    ))
    err_esc = err(re.transformation[0])
    err_g = err(rg_b.transformation[0])
    assert err_esc < 0.1  # really tracked most of the 0.3 rad roll
    assert abs(err_esc - err_g) < 0.01  # gather-quality, no silent loss
