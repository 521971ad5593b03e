"""Device-resident sequence odometry (lax.scan) tests."""

import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models import odometry
from dvo_slam_tpu.ops import camera
from dvo_slam_tpu.utils import evaluate, se3_np, synthetic

W, H = 64, 48
K_TUPLE = (32.0, 32.0, (W - 1) / 2.0, (H - 1) / 2.0)


def test_sequence_scan_matches_per_frame_tracking():
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=20)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(8, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K_TUPLE), W, H, poses)
    intensities = jnp.stack([jnp.asarray(f[0]) for f in frames])
    depths = jnp.stack([jnp.asarray(f[1]) for f in frames])
    K = camera.intrinsics(*K_TUPLE)

    out = odometry.track_sequence(intensities, depths, K, cfg)
    assert out["rel_poses"].shape == (7, 4, 4)
    assert not bool(np.asarray(out["is_nan"]).any())

    est = odometry.compose_trajectory(out["rel_poses"], poses[0])
    ate = evaluate.ate_rmse(est, poses)
    assert ate < 0.005, f"scan odometry ATE {ate*1000:.2f} mm"

    # Each relative pose matches the ground-truth inter-frame motion.
    for k in range(7):
        gt_rel = se3_np.inverse(poses[k + 1]) @ poses[k]
        err = np.linalg.norm(
            se3_np.log(se3_np.inverse(np.asarray(out["rel_poses"][k], np.float64))
                       @ gt_rel)
        )
        assert err < 3e-3, (k, err)


def test_sequence_scan_survives_untrackable_frame():
    """An untrackable frame (all-NaN depth + pure-noise intensity) must not
    poison the rest of the scan: the broken transitions degrade gracefully
    (valid_ratio collapses, finite fallback pose — the scan carries the
    same NaN guard as the host OdometryTracker) and later frames track
    normally."""
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=20)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(8, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K_TUPLE), W, H, poses)
    intensities = np.stack([f[0] for f in frames])
    depths = np.stack([f[1] for f in frames])
    depths[3] = np.nan  # untrackable frame mid-sequence
    intensities[3] = np.random.default_rng(0).uniform(0, 255, intensities[3].shape)
    out = odometry.track_sequence(
        jnp.asarray(intensities), jnp.asarray(depths),
        camera.intrinsics(*K_TUPLE), cfg,
    )
    rels = np.asarray(out["rel_poses"])
    vr = np.asarray(out["valid_ratio"])
    # The broken transitions are observable in the stats stream...
    assert vr[2] < 0.1 and vr[3] < 0.1
    assert vr[4] > 0.5
    # ...every emitted pose stays finite, and tracking recovers.
    assert np.isfinite(rels).all()
    for k in (5, 6):
        gt_rel = se3_np.inverse(poses[k + 1]) @ poses[k]
        err = np.linalg.norm(
            se3_np.log(se3_np.inverse(np.asarray(rels[k], np.float64))
                       @ gt_rel)
        )
        assert err < 3e-3, (k, err)


def test_sequence_scan_stat_streams():
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=10)
    scene = synthetic.PlaneScene()
    poses = synthetic.orbit_trajectory(5, radius=0.03)
    frames = synthetic.render_sequence(scene, np.asarray(K_TUPLE), W, H, poses)
    intensities = jnp.stack([jnp.asarray(f[0]) for f in frames])
    depths = jnp.stack([jnp.asarray(f[1]) for f in frames])
    out = odometry.track_sequence(intensities, depths,
                                  camera.intrinsics(*K_TUPLE), cfg)
    assert out["entropy"].shape == (4,)
    assert out["iterations"].shape == (4, 2)
    assert np.asarray(out["valid_ratio"]).min() > 0.5
    assert np.isfinite(np.asarray(out["entropy"])).all()
