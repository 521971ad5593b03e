"""Dense-tracker integration tests: synthetic-warp recovery.

Frames rendered analytically at known poses (utils/synthetic.py) must be
aligned by the tracker to the true relative pose — the property-test
replacement for the reference's dataset-only validation (SURVEY.md §5).
Covers BASELINE.json configs #1 (photometric-only single level), #2
(coarse-to-fine bivariate), #3 (t-dist weighting + LM).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models import dense_tracker
from dvo_slam_tpu.ops import camera, pyramid
from dvo_slam_tpu.utils import se3_np, synthetic

W, H = 80, 60
K_TUPLE = (40.0, 40.0, (W - 1) / 2.0, (H - 1) / 2.0)


def _render_pair(xi_rel, scene=None, sharpness=1.0):
    """Render ref at identity and cur at T_wc = exp(xi)^{-1}... careful:
    tracker estimates T mapping ref-camera coords to cur-camera coords,
    i.e. T = T_cur_world = (T_w_cur)^{-1} T_w_ref."""
    scene = scene or synthetic.PlaneScene(sharpness=sharpness)
    K = np.asarray(K_TUPLE)
    T_w_ref = np.eye(4)
    T_rel = se3_np.exp(xi_rel)  # ref-cam -> cur-cam
    T_w_cur = T_w_ref @ se3_np.inverse(T_rel)
    i_ref, z_ref = scene.render(K, W, H, T_w_ref)
    i_cur, z_cur = scene.render(K, W, H, T_w_cur)
    return (i_ref, z_ref), (i_cur, z_cur), T_rel


def _track(ref, cur, cfg, T_init=None):
    Kd = camera.intrinsics(*K_TUPLE)
    Ks = camera.pyramid_intrinsics(Kd, cfg.num_levels)
    ref_pyr = pyramid.build_pyramid(jnp.asarray(ref[0]), jnp.asarray(ref[1]), cfg.num_levels)
    cur_pyr = pyramid.build_pyramid(jnp.asarray(cur[0]), jnp.asarray(cur[1]), cfg.num_levels)
    T0 = jnp.eye(4) if T_init is None else jnp.asarray(T_init, jnp.float32)
    return dense_tracker.track_jit(ref_pyr, cur_pyr, Ks, T0, cfg)


def _pose_error(T_est, T_true):
    return np.linalg.norm(se3_np.log(se3_np.inverse(np.asarray(T_est, np.float64)) @ T_true))


def test_identity_pair_converges_to_identity():
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0)
    (i_r, z_r), _, _ = _render_pair(np.zeros(6))
    res = _track((i_r, z_r), (i_r, z_r), cfg)
    assert _pose_error(res.transformation, np.eye(4)) < 1e-4
    assert not bool(res.is_nan())


def test_config1_photometric_single_level():
    """BASELINE.json config #1: single level, photometric only."""
    cfg = TrackerConfig(
        num_levels=1, first_level=0, last_level=0,
        use_depth=False, use_weighting=False, max_iterations=100,
    )
    xi = np.array([0.004, -0.003, 0.002, 0.002, -0.001, 0.002])
    ref, cur, T_true = _render_pair(xi)
    res = _track(ref, cur, cfg)
    err = _pose_error(res.transformation, T_true)
    assert err < 5e-3, f"pose error {err}"


def test_config2_coarse_to_fine_bivariate():
    """BASELINE.json config #2: 3-level pyramid, intensity+depth residuals."""
    cfg = TrackerConfig(
        num_levels=3, first_level=2, last_level=0,
        use_depth=True, use_weighting=False, max_iterations=50,
    )
    xi = np.array([0.02, -0.015, 0.01, 0.01, -0.008, 0.012])
    ref, cur, T_true = _render_pair(xi)
    res = _track(ref, cur, cfg)
    err = _pose_error(res.transformation, T_true)
    assert err < 2e-3, f"pose error {err}"


def test_config3_tdist_lm():
    """BASELINE.json config #3: t-dist weighting + LM damping."""
    cfg = TrackerConfig(
        num_levels=3, first_level=2, last_level=0,
        use_depth=True, use_weighting=True,
        scale_estimator="tdist", influence="tdist",
        lm_lambda_init=1e-4, max_iterations=50,
    )
    xi = np.array([0.02, -0.015, 0.01, 0.01, -0.008, 0.012])
    ref, cur, T_true = _render_pair(xi)
    res = _track(ref, cur, cfg)
    err = _pose_error(res.transformation, T_true)
    assert err < 2e-3, f"pose error {err}"


def test_robust_to_outlier_patch():
    """Corrupt a block of the current frame; t-dist weighting must keep the
    estimate close while unweighted LS degrades more."""
    xi = np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.005])
    ref, cur, T_true = _render_pair(xi)
    i_cur = cur[0].copy()
    i_cur[10:30, 20:50] = 250.0  # occluder-like corruption
    cur_bad = (i_cur, cur[1])

    cfg_robust = TrackerConfig(num_levels=3, first_level=2, last_level=0,
                               use_weighting=True)
    cfg_plain = TrackerConfig(num_levels=3, first_level=2, last_level=0,
                              use_weighting=False)
    # High-breakdown option: MAD scale + Tukey hard redescender. On
    # noise-free synthetic inliers the t-dist scale estimate is inflated by
    # the gross-outlier mass (not high-breakdown), leaving a small bias;
    # MAD+Tukey zeroes the outliers outright.
    cfg_mad = TrackerConfig(num_levels=3, first_level=2, last_level=0,
                            use_weighting=True, scale_estimator="mad",
                            influence="tukey")
    err_robust = _pose_error(_track(ref, cur_bad, cfg_robust).transformation, T_true)
    err_plain = _pose_error(_track(ref, cur_bad, cfg_plain).transformation, T_true)
    err_mad = _pose_error(_track(ref, cur_bad, cfg_mad).transformation, T_true)
    # The t-dist bound is loose: with noise-free inliers + 12.5% gross
    # outliers the non-high-breakdown t-dist scale is inflated and the
    # optimum carries a bias of the order of the motion itself; the
    # meaningful checks are the relative improvement and MAD+Tukey.
    assert err_robust < 4e-2, f"t-dist robust pose error {err_robust}"
    assert err_robust < 0.2 * err_plain, f"robust {err_robust} vs plain {err_plain}"
    assert err_mad < 4e-3, f"mad+tukey pose error {err_mad}"


def test_initial_estimate_used():
    xi = np.array([0.06, -0.04, 0.03, 0.03, -0.02, 0.03])  # large motion
    ref, cur, T_true = _render_pair(xi)
    cfg = TrackerConfig(num_levels=3, first_level=2, last_level=0)
    # With a good initial estimate the tracker must lock in.
    res = _track(ref, cur, cfg, T_init=se3_np.exp(xi * 0.9))
    assert _pose_error(res.transformation, T_true) < 3e-3


def test_mu_pose_prior_pulls_toward_init():
    """Config::Mu equivalent: a strong motion prior must keep the estimate
    near the initial guess even when the data pulls elsewhere."""
    xi = np.array([0.02, -0.01, 0.01, 0.005, -0.004, 0.006])
    ref, cur, T_true = _render_pair(xi)
    T_init = np.eye(4)  # prior anchored at identity, data wants T_true
    cfg_free = TrackerConfig(num_levels=2, first_level=1, last_level=0)
    cfg_prior = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                              mu=1e9)
    T_free = _track(ref, cur, cfg_free, T_init=T_init).transformation
    T_prior = _track(ref, cur, cfg_prior, T_init=T_init).transformation
    d_free = np.linalg.norm(se3_np.log(np.asarray(T_free, np.float64)))
    d_prior = np.linalg.norm(se3_np.log(np.asarray(T_prior, np.float64)))
    assert d_free > 5 * d_prior, (d_free, d_prior)
    # Moderate prior: still converges near truth.
    cfg_mild = TrackerConfig(num_levels=2, first_level=1, last_level=0, mu=1.0)
    err = _pose_error(_track(ref, cur, cfg_mild, T_init=T_init).transformation,
                      T_true)
    assert err < 5e-3


def test_result_fields_finite():
    xi = np.array([0.005, 0.0, 0.0, 0.0, 0.0, 0.002])
    ref, cur, _ = _render_pair(xi)
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0)
    res = _track(ref, cur, cfg)
    assert np.isfinite(float(res.log_likelihood))
    assert np.isfinite(float(res.entropy))
    assert np.isfinite(np.asarray(res.information)).all()
    assert float(res.valid_ratio) > 0.5
    assert int(res.iterations[0]) >= 1
    # Information must be symmetric positive definite (symmetry up to
    # f32 accumulation noise, relative to the matrix magnitude).
    info = np.asarray(res.information, np.float64)
    asym = np.abs(info - info.T).max() / max(np.abs(info).max(), 1.0)
    assert asym < 1e-5, f"information asymmetry {asym}"
    assert np.linalg.eigvalsh((info + info.T) / 2).min() > 0


def test_batched_tracking_matches_single():
    xi_a = np.array([0.01, 0.0, 0.005, 0.002, 0.0, 0.003])
    xi_b = np.array([-0.008, 0.006, 0.0, 0.0, 0.004, -0.002])
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0)
    Kd = camera.intrinsics(*K_TUPLE)
    Ks = camera.pyramid_intrinsics(Kd, cfg.num_levels)

    ref_a, cur, T_a = _render_pair(xi_a)
    # Second reference frame: the same current frame tracked from another view.
    scene = synthetic.PlaneScene()
    T_rel_b = se3_np.exp(xi_b)
    T_w_refb = (se3_np.inverse(T_rel_b))  # so that refb -> cur == exp(xi_b)...
    # Simpler: render refb s.t. cur = refb warped by exp(xi_b):
    # T_w_cur for pair a:
    T_w_cur = se3_np.inverse(T_a)
    T_w_refb = T_w_cur @ T_rel_b
    i_refb, z_refb = scene.render(np.asarray(K_TUPLE), W, H, T_w_refb)

    pyr_a = pyramid.build_pyramid(jnp.asarray(ref_a[0]), jnp.asarray(ref_a[1]), 2)
    pyr_b = pyramid.build_pyramid(jnp.asarray(i_refb), jnp.asarray(z_refb), 2)
    cur_pyr = pyramid.build_pyramid(jnp.asarray(cur[0]), jnp.asarray(cur[1]), 2)

    refs = tuple(jnp.stack([a, b]) for a, b in zip(pyr_a, pyr_b))
    T0 = jnp.stack([jnp.eye(4), jnp.eye(4)])
    batched = dense_tracker.track_batched(refs, cur_pyr, Ks, T0, cfg)

    single_a = dense_tracker.track_jit(pyr_a, cur_pyr, Ks, jnp.eye(4), cfg)
    np.testing.assert_allclose(
        np.asarray(batched.transformation[0]),
        np.asarray(single_a.transformation),
        atol=1e-5,
    )
    # Pair b must converge to its own ground truth.
    assert _pose_error(batched.transformation[1], T_rel_b) < 5e-3


def test_per_iteration_stats():
    """TrackResult.stats must carry the reference's IterationStats
    granularity: per-iteration valid counts / error / increment norms /
    accept flags and a per-level termination reason, consistent with the
    reported iteration counts."""
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=20)
    xi = np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.005])
    ref, cur, _ = _render_pair(xi)
    res = _track(ref, cur, cfg)
    s = res.stats
    assert s is not None
    L, I = len(cfg.tracked_levels), cfg.max_iterations
    assert s.valid.shape == (L, I) and s.error.shape == (L, I)
    assert s.delta_norm.shape == (L, I) and s.accepted.shape == (L, I)
    assert s.termination.shape == (L,)
    iters = np.asarray(res.iterations)
    for l in range(L):
        n = int(iters[l])
        assert 1 <= n <= cfg.max_iterations
        # Executed iterations have real entries; the tail stays zero.
        assert (np.asarray(s.valid[l][:n]) > 0).all()
        assert (np.asarray(s.valid[l][n:]) == 0).all()
        assert np.asarray(s.accepted[l][:n]).any()
        term = int(s.termination[l])
        assert term in (dense_tracker.TERM_ITERATIONS,
                        dense_tracker.TERM_INCREMENT,
                        dense_tracker.TERM_ERROR_INCREASED,
                        dense_tracker.TERM_TOO_FEW_CONSTRAINTS)
        if n < cfg.max_iterations:
            assert term != dense_tracker.TERM_ITERATIONS
    # Easy pair converges by increment or rollback, not by iteration cap.
    assert int(s.termination[-1]) in (dense_tracker.TERM_INCREMENT,
                                      dense_tracker.TERM_ERROR_INCREASED)


def test_stats_disabled():
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        collect_stats=False)
    ref, cur, _ = _render_pair(np.zeros(6))
    res = _track(ref, cur, cfg)
    assert res.stats is None


def test_large_wrong_initial_estimate_contained():
    """A badly wrong initialization may converge inaccurately but must be
    CONTAINED: finite result, usable is_nan, no crash (verify-skill probe)."""
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=20)
    ref, cur, _ = _render_pair(np.array([0.01, 0.0, 0.0, 0.0, 0.0, 0.0]))
    T_bad = se3_np.exp(np.array([0.5, -0.4, 0.8, 0.4, -0.5, 0.6]))
    res = _track(ref, cur, cfg, T_init=T_bad)
    assert np.isfinite(np.asarray(res.transformation)).all()
    assert not bool(res.is_nan())
    assert np.isfinite(float(res.error))


def test_pure_noise_current_frame_degrades_gracefully():
    """Pure-noise current frame: finite result, degraded quality signals
    (this is the keyframe-switch trigger path; verify-skill probe)."""
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=20)
    ref, cur_good, _ = _render_pair(np.zeros(6))
    rng = np.random.default_rng(0)
    noise_i = rng.uniform(0, 255, cur_good[0].shape).astype(np.float32)
    noise_z = rng.uniform(0.5, 4.0, cur_good[1].shape).astype(np.float32)
    res_noise = _track(ref, (noise_i, noise_z), cfg)
    res_good = _track(ref, cur_good, cfg)
    assert np.isfinite(np.asarray(res_noise.transformation)).all()
    assert not bool(res_noise.is_nan())
    # Quality must be visibly worse than a matching frame: the entropy
    # rises (less information) and/or the error explodes.
    assert float(res_noise.error) > float(res_good.error)
    assert float(res_noise.entropy) > float(res_good.entropy)


def test_batched_is_nan_is_per_row():
    """One diverged/garbage row in a validation batch must not flag the
    other rows as NaN (it would reject every candidate in the chunk)."""
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=10)
    xi = np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.005])
    ref, cur, T_true = _render_pair(xi)
    Kd = camera.intrinsics(*K_TUPLE)
    Ks = camera.pyramid_intrinsics(Kd, cfg.num_levels)
    good = pyramid.build_pyramid(jnp.asarray(ref[0]), jnp.asarray(ref[1]), 2)
    # Garbage reference: all-NaN depth => zero selected points.
    bad = pyramid.build_pyramid(
        jnp.asarray(ref[0]), jnp.full(ref[1].shape, jnp.nan), 2
    )
    refs = tuple(jnp.stack([g, b]) for g, b in zip(good, bad))
    cur_pyr = pyramid.build_pyramid(jnp.asarray(cur[0]), jnp.asarray(cur[1]), 2)
    curs = tuple(jnp.stack([l, l]) for l in cur_pyr)
    T0 = jnp.stack([jnp.eye(4), jnp.eye(4)])
    res = dense_tracker.track_pairs_batched(refs, curs, Ks, T0, cfg)
    nans = np.asarray(res.is_nan())
    assert nans.shape == (2,)
    assert not nans[0], "healthy row flagged NaN by its batch neighbour"
    assert _pose_error(res.transformation[0], T_true) < 2e-3


def test_scale_warm_start_matches_cold():
    """tdist_scale_warm_iters: seeding the Sigma fixed point from the
    previous iteration's estimate (the reference scale estimator persists
    across iterations) must recover the same pose and scale as the cold
    per-iteration fixed point."""
    import dataclasses

    xi = np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.005])
    ref, cur, T_true = _render_pair(xi)
    cfg_cold = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                             max_iterations=30)
    cfg_warm = dataclasses.replace(cfg_cold, tdist_scale_warm_iters=2)
    r_cold = _track(ref, cur, cfg_cold)
    r_warm = _track(ref, cur, cfg_warm)
    assert _pose_error(r_warm.transformation, T_true) < 5e-4
    assert abs(_pose_error(r_warm.transformation, T_true)
               - _pose_error(r_cold.transformation, T_true)) < 1e-5
    np.testing.assert_allclose(np.asarray(r_warm.sigma),
                               np.asarray(r_cold.sigma),
                               rtol=1e-3, atol=1e-6)


def test_reference_gradient_mode_converges_like_current():
    """gradient_source="reference" (constant LK-style Jacobian gradients;
    samples 2.3x fewer channels per IRLS iteration) must recover the same
    pose as the exact current-frame-gradient formulation, in both the
    bivariate and photometric-only modes."""
    import dataclasses

    xi = np.array([0.02, -0.015, 0.01, 0.01, -0.008, 0.012])
    ref, cur, T_true = _render_pair(xi)
    for use_depth in (True, False):
        cfg_cur = TrackerConfig(num_levels=3, first_level=2, last_level=0,
                                use_depth=use_depth, max_iterations=50)
        cfg_ref = dataclasses.replace(cfg_cur, gradient_source="reference")
        err_c = _pose_error(_track(ref, cur, cfg_cur).transformation, T_true)
        err_r = _pose_error(_track(ref, cur, cfg_ref).transformation, T_true)
        assert err_r < 2e-3, f"use_depth={use_depth}: pose error {err_r}"
        # No systematic degradation vs the exact mode on a clean pair.
        assert err_r < err_c + 1e-3, (err_r, err_c)


def test_reference_gradient_mode_keeps_depth_holes():
    """Photometric-only + reference gradients: current-frame depth holes
    must still not invalidate points (the 1-channel sampled slab masks on
    intensity only)."""
    import dataclasses

    xi = np.array([0.008, -0.004, 0.006, 0.003, -0.002, 0.004])
    ref, cur, T_true = _render_pair(xi)
    z_holed = cur[1].copy()
    z_holed[10:40, 20:60] = np.nan
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=30, use_depth=False,
                        gradient_source="reference")
    res_holed = _track(ref, (cur[0], z_holed), cfg)
    res_full = _track(ref, cur, cfg)
    assert float(res_holed.valid_pixels) > 0.9 * float(res_full.valid_pixels)
    assert _pose_error(res_holed.transformation, T_true) < 1e-3


def test_photometric_only_ignores_depth_holes():
    """use_depth=False must keep photometrically valid pixels whose
    CURRENT-frame depth is invalid (depth holes are the reason to disable
    the depth residual in the first place)."""
    import dataclasses

    xi = np.array([0.008, -0.004, 0.006, 0.003, -0.002, 0.004])
    ref, cur, T_true = _render_pair(xi)
    # Punch a large depth hole into the current frame; intensity intact.
    z_holed = cur[1].copy()
    z_holed[10:40, 20:60] = np.nan
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=30, use_depth=False)
    res_holed = _track(ref, (cur[0], z_holed), cfg)
    res_full = _track(ref, cur, cfg)
    # The hole must not cost (many) valid constraints...
    assert float(res_holed.valid_pixels) > 0.9 * float(res_full.valid_pixels)
    # ...and photometric tracking still recovers the pose.
    assert _pose_error(res_holed.transformation, T_true) < 1e-3

    # Contrast: the bivariate mode rightly drops the hole's pixels.
    cfg_d = dataclasses.replace(cfg, use_depth=True)
    res_d = _track(ref, (cur[0], z_holed), cfg_d)
    assert float(res_d.valid_pixels) < float(res_holed.valid_pixels)
