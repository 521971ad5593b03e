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
