"""On-disk end-to-end accuracy gate (reduced-scale bench/accuracy.py).

The full-scale version (640x480, 240 frames, TPU) is bench/accuracy.py;
this is the same COMPLETE pipeline — PNG-encoded TUM-layout sequence on
disk with sensor noise, depth dropout and a genuine closing loop, decoded
through TumDataset (native path when available), tracked by full SLAM with
entropy-ratio keyframe selection and loop-closure validation, evaluated by
the ATE oracle — at a CPU-affordable scale.
"""

import numpy as np

from dvo_slam_tpu import benchmark
from dvo_slam_tpu.config import SlamConfig, TrackerConfig
from dvo_slam_tpu.utils import synthetic

W, H = 96, 72
K = (525.0 * W / 640.0, 525.0 * H / 480.0, (W - 1) / 2.0, (H - 1) / 2.0)
TRACKER = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=30)


def test_on_disk_slam_accuracy(tmp_path):
    rng = np.random.default_rng(11)
    scene = synthetic.two_plane_scene(sharpness=2.0)
    # cycles=2.0 + enough sensor noise that odometry accumulates REAL
    # drift (~9.5 mm over the run at this scale): the slam-vs-odometry
    # margin gate below needs drift loop closure can visibly repair —
    # with gentle noise the loop edge's residual is ~0 and the solve
    # correctly no-ops, making the margin unmeasurable.
    poses = synthetic.orbit_trajectory(60, radius=0.25, yaw_amplitude=0.6,
                                       cycles=2.0)
    frames = [
        synthetic.add_sensor_noise(i, z, rng, intensity_std=3.0,
                                   depth_rel_std=0.015, dropout=0.08)
        for i, z in synthetic.render_sequence(scene, np.asarray(K), W, H, poses)
    ]
    out = str(tmp_path / "seq")
    synthetic.write_tum_dataset(out, frames, poses)

    slam_cfg = SlamConfig(
        new_constraint_search_radius=0.12,
        min_constraint_distance=4,
        coarse_first_level=1,
        coarse_last_level=1,
        validation_batch=4,
    )
    res = benchmark.run_tum_dataset(out, TRACKER, slam_cfg, mode="slam",
                                    intrinsics=K)
    # Real keyframe cadence (entropy-ratio, not forced), a genuine loop
    # closure, and an absolute accuracy bound — all from disk.
    assert res.num_keyframes >= 3, res
    assert res.num_loop_edges >= 1, res
    assert res.ate_rmse_m is not None and res.ate_rmse_m < 0.02, res

    # Loop-closure VALUE gate (round-3 regression guard): accepted loop
    # edges must actually pull the trajectory — full SLAM beats pure
    # keyframe odometry. Without it, robust-kernel/information-scale bugs
    # that zero out every loop edge's weight leave slam ATE EXACTLY equal
    # to odometry while still reporting accepted edges (seen at full
    # scale when a fixed GNC anneal met 640x480 information magnitudes).
    odo = benchmark.run_tum_dataset(out, TRACKER, slam_cfg, mode="keyframe",
                                    intrinsics=K)
    assert res.ate_rmse_m < 0.7 * odo.ate_rmse_m, (res.ate_rmse_m,
                                                   odo.ate_rmse_m)


def test_figure8_trajectory_geometry():
    """bench/accuracy.py --trajectory figure8 relies on these properties."""
    n, radius = 240, 0.3
    poses = synthetic.figure8_trajectory(n, radius=radius, yaw_amplitude=0.5,
                                         cycles=1.0)
    # Valid SE(3) throughout.
    for T in poses[::31]:
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert abs(np.linalg.det(R) - 1.0) < 1e-9
    ts = np.array([T[:3, 3] for T in poses])
    # Handheld-like: consecutive motion small and smooth.
    steps = np.linalg.norm(np.diff(ts, axis=0), axis=1)
    assert steps.max() < 0.12 * radius
    # The lemniscate center is crossed twice per cycle, once per lobe.
    d = np.linalg.norm(ts[:, :2], axis=1)
    i1 = int(np.argmin(d[: n // 2]))
    i2 = n // 2 + int(np.argmin(d[n // 2:]))
    assert d[i1] < 0.05 * radius and d[i2] < 0.05 * radius
    # ... approached from OPPOSITE x-directions (the harder loop-closure
    # geometry the harness advertises): revisit frames near the center
    # come in with reversed heading, unlike orbit's same-heading revisits.
    vx1 = ts[min(i1 + 1, n - 1), 0] - ts[max(i1 - 1, 0), 0]
    vx2 = ts[min(i2 + 1, n - 1), 0] - ts[max(i2 - 1, 0), 0]
    assert vx1 * vx2 < 0.0, (vx1, vx2)
