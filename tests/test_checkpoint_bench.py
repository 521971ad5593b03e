"""Checkpoint/resume, benchmark harness, CLI, and aux-subsystem tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from dvo_slam_tpu.config import SlamConfig, TrackerConfig
from dvo_slam_tpu.models.keyframe_tracker import KeyframeSlam
from dvo_slam_tpu.utils import checkpoint, evaluate, synthetic

from cross_run import assert_cross_run_close

W, H = 64, 48
K_TUPLE = (32.0, 32.0, (W - 1) / 2.0, (H - 1) / 2.0)
TRACKER = TrackerConfig(num_levels=2, first_level=1, last_level=0, max_iterations=30)
SLAM = SlamConfig(max_keyframes=32, max_edges=128, min_constraint_distance=3,
                  coarse_first_level=1, coarse_last_level=1, validation_batch=4)


def _frames(n, radius=0.05):
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(n, radius=radius)
    return synthetic.render_sequence(scene, np.asarray(K_TUPLE), W, H, poses), poses


def test_checkpoint_resume_equivalence(tmp_path):
    """Run 10 frames straight vs save@5 + resume: identical trajectories."""
    frames, poses = _frames(10)

    slam_a = KeyframeSlam(K_TUPLE, TRACKER, SLAM, enable_loop_closure=False)
    slam_a.init(poses[0])
    for i, (intensity, depth) in enumerate(frames):
        if i == 5:
            slam_a.force_keyframe()
        slam_a.update(intensity, depth, i / 30.0)
    traj_a = slam_a.trajectory()

    slam_b = KeyframeSlam(K_TUPLE, TRACKER, SLAM, enable_loop_closure=False)
    slam_b.init(poses[0])
    for i, (intensity, depth) in enumerate(frames[:5]):
        slam_b.update(intensity, depth, i / 30.0)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_slam(path, slam_b)
    slam_c = checkpoint.load_slam(path, K_TUPLE, TRACKER, SLAM,
                                  enable_loop_closure=False)
    for i, (intensity, depth) in enumerate(frames[5:], start=5):
        if i == 5:
            slam_c.force_keyframe()
        slam_c.update(intensity, depth, i / 30.0)
    traj_c = slam_c.trajectory()

    assert len(traj_a) == len(traj_c)
    for (ta, Ta), (tc, Tc) in zip(traj_a, traj_c):
        assert ta == tc
        assert_cross_run_close(Ta, Tc)


def test_checkpoint_preserves_reset_anchor(tmp_path):
    """A checkpoint taken after reset() must resume anchored at the reset
    pose, not at the first keyframe's pose."""
    frames, poses = _frames(6)
    slam = KeyframeSlam(K_TUPLE, TRACKER, SLAM, enable_loop_closure=False)
    slam.init(poses[0])
    for i, (intensity, depth) in enumerate(frames[:4]):
        slam.update(intensity, depth, i / 30.0)
    from dvo_slam_tpu.utils import se3_np

    T_reset = poses[0] @ se3_np.exp(np.array([0.3, 0.1, -0.2, 0.05, 0.02, -0.04]))
    slam.reset(T_reset)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_slam(path, slam)

    slam_r = checkpoint.load_slam(path, K_TUPLE, TRACKER, SLAM,
                                  enable_loop_closure=False)
    assert not slam_r._initialized
    # The next frame becomes a fresh anchor keyframe at the reset pose.
    T_next = slam_r.update(frames[4][0], frames[4][1], 4 / 30.0)
    np.testing.assert_allclose(T_next, T_reset, atol=1e-9)


def test_checkpoint_engine_mismatch_and_empty_chunked(tmp_path):
    """Engine identity is recorded explicitly: a chunked checkpoint taken
    before the first chunk (no scan carry yet) still restores as chunked,
    and loading with the wrong engine flag raises."""
    import pytest

    from dvo_slam_tpu.models.chunked_slam import ChunkedKeyframeSlam

    slam = ChunkedKeyframeSlam(K_TUPLE, TRACKER, SLAM,
                               enable_loop_closure=False)
    slam.init()
    path = str(tmp_path / "empty_chunked.npz")
    checkpoint.save_slam(path, slam)
    with pytest.raises(ValueError, match="chunked"):
        checkpoint.load_slam(path, K_TUPLE, TRACKER, SLAM, chunked=False)
    slam_r = checkpoint.load_slam(path, K_TUPLE, TRACKER, SLAM,
                                  enable_loop_closure=False, chunked=True)
    assert isinstance(slam_r, ChunkedKeyframeSlam)
    assert slam_r._carry is None
    # And the restored engine runs.
    frames, _ = _frames(3)
    out = slam_r.update_chunk(
        np.stack([f[0] for f in frames]), np.stack([f[1] for f in frames]),
        [i / 30.0 for i in range(3)],
    )
    assert len(out) == 3 and all(np.isfinite(T).all() for T in out)

    # Per-frame checkpoints reject chunked loading symmetrically.
    slam_p = KeyframeSlam(K_TUPLE, TRACKER, SLAM, enable_loop_closure=False)
    slam_p.init()
    path_p = str(tmp_path / "perframe.npz")
    checkpoint.save_slam(path_p, slam_p)
    with pytest.raises(ValueError, match="per-frame"):
        checkpoint.load_slam(path_p, K_TUPLE, TRACKER, SLAM, chunked=True)


def test_checkpoint_restore_respects_residency_budget(tmp_path):
    """Restoring a long run must not stage every keyframe pyramid through
    HBM: keyframes beyond resident_keyframes come back as host numpy."""
    import dataclasses

    import jax

    cfg = dataclasses.replace(SLAM, resident_keyframes=2)
    frames, poses = _frames(8)
    slam = KeyframeSlam(K_TUPLE, TRACKER, cfg, enable_loop_closure=False)
    slam.init(poses[0])
    for i, (intensity, depth) in enumerate(frames):
        if i and i % 2 == 0:
            slam.force_keyframe()
        slam.update(intensity, depth, i / 30.0)
    assert len(slam.keyframes) >= 4
    path = str(tmp_path / "evicted.npz")
    checkpoint.save_slam(path, slam)
    slam_r = checkpoint.load_slam(path, K_TUPLE, TRACKER, cfg,
                                  enable_loop_closure=False)
    n = len(slam_r.keyframes)
    for k, kf in enumerate(slam_r.keyframes):
        expect_resident = k >= n - cfg.resident_keyframes
        assert kf.resident == expect_resident, k
        is_device = isinstance(kf.pyramid[0], jax.Array)
        assert is_device == expect_resident, k


def test_checkpoint_local_map_capacity_check(tmp_path):
    """A pending local-map window larger than the loader's capacity must
    raise, not silently truncate."""
    import dataclasses

    import pytest

    frames, poses = _frames(6)
    slam = KeyframeSlam(K_TUPLE, TRACKER, SLAM, enable_loop_closure=False)
    slam.init(poses[0])
    for i, (intensity, depth) in enumerate(frames):
        slam.update(intensity, depth, i / 30.0)
    assert len(slam._local_map) >= 3
    path = str(tmp_path / "window.npz")
    checkpoint.save_slam(path, slam)
    small = dataclasses.replace(SLAM, local_map_capacity=2)
    with pytest.raises(ValueError, match="local_map_capacity"):
        checkpoint.load_slam(path, K_TUPLE, TRACKER, small,
                             enable_loop_closure=False)


def test_benchmark_synthetic_odometry():
    from dvo_slam_tpu import benchmark

    res = benchmark.run_synthetic(
        num_frames=8, width=W, height=H,
        tracker_cfg=TRACKER, slam_cfg=SLAM, mode="keyframe",
    )
    assert res.num_frames == 8
    assert res.ate_rmse_m is not None and res.ate_rmse_m < 0.01
    assert res.fps > 0
    json.loads(res.to_json())  # serializable


def test_benchmark_odometry_mode():
    """Frame-to-frame odometry mode (reference camera_tracker semantics):
    no keyframe store, no pose graph — sequence length is unbounded by
    SlamConfig capacities; accuracy holds on a clean sequence."""
    import dataclasses

    from dvo_slam_tpu import benchmark

    # Capacities far below the frame count must not matter in this mode.
    tiny = dataclasses.replace(SLAM, max_keyframes=2, max_edges=2)
    res = benchmark.run_synthetic(
        num_frames=6, width=W, height=H,
        tracker_cfg=TRACKER, slam_cfg=tiny, mode="odometry",
    )
    assert res.num_keyframes == 0
    assert res.ate_rmse_m is not None and res.ate_rmse_m < 0.01


def test_benchmark_groundtruth_gaps_excluded():
    """Frames without a groundtruth match must be excluded from ATE, not
    evaluated against identity placeholders."""
    import numpy as np

    from dvo_slam_tpu import benchmark
    from dvo_slam_tpu.utils import synthetic

    K = (W * 0.8, W * 0.8, (W - 1) / 2.0, (H - 1) / 2.0)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(6, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)
    gt = list(poses)
    gt[2] = None  # mocap dropout
    gt[4] = None
    res = benchmark.run_sequence(
        ((i / 30.0, f[0], f[1]) for i, f in enumerate(frames)),
        K, TRACKER, SLAM, groundtruth=gt, mode="odometry", warmup=0,
    )
    # With identity placeholders this would be tens of cm; excluded
    # frames keep it at synthetic-accuracy levels.
    assert res.ate_rmse_m is not None and res.ate_rmse_m < 0.01


def test_odometry_covariance_export(tmp_path):
    """Per-frame covariance sidecar (reference PoseWithCovarianceStamped
    from Information^{-1}, dvo_ros camera_dense_tracking)."""
    import numpy as np

    from dvo_slam_tpu import benchmark
    from dvo_slam_tpu.utils import synthetic

    K = (W * 0.8, W * 0.8, (W - 1) / 2.0, (H - 1) / 2.0)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(5, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)
    cov_path = str(tmp_path / "cov.txt")
    benchmark.run_sequence(
        ((i / 30.0, f[0], f[1]) for i, f in enumerate(frames)),
        K, TRACKER, SLAM, mode="odometry", warmup=0,
        covariance_out=cov_path,
    )
    rows = [line.split() for line in open(cov_path)]
    assert len(rows) == 5
    assert all(len(r) == 37 for r in rows)  # timestamp + 6x6
    cov = np.asarray([float(v) for v in rows[2][1:]]).reshape(6, 6)
    assert np.isfinite(cov).all()
    np.testing.assert_allclose(cov, cov.T, atol=1e-12)
    assert (np.linalg.eigvalsh(cov) > 0).all()  # a real covariance


def test_benchmark_checkpoint_resume(tmp_path):
    """benchmark --checkpoint-out / --resume: a split run must reproduce
    the uninterrupted run's optimized trajectory."""
    import numpy as np

    from dvo_slam_tpu import benchmark
    from dvo_slam_tpu.utils import synthetic, tum

    K = (W * 0.8, W * 0.8, (W - 1) / 2.0, (H - 1) / 2.0)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(8, radius=0.04)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)
    seq = [(i / 30.0, f[0], f[1]) for i, f in enumerate(frames)]

    full_out = str(tmp_path / "full.txt")
    benchmark.run_sequence(iter(seq), K, TRACKER, SLAM, mode="keyframe",
                           warmup=0, trajectory_out=full_out)

    ck = str(tmp_path / "state.npz")
    benchmark.run_sequence(iter(seq[:4]), K, TRACKER, SLAM, mode="keyframe",
                           warmup=0, checkpoint_out=ck)
    resumed_out = str(tmp_path / "resumed.txt")
    benchmark.run_sequence(iter(seq[4:]), K, TRACKER, SLAM, mode="keyframe",
                           warmup=0, resume=ck, trajectory_out=resumed_out)

    full = tum.read_trajectory(full_out)
    resumed = tum.read_trajectory(resumed_out)
    assert len(full) == len(resumed) == len(seq)
    for (ta, Ta), (tb, Tb) in zip(full, resumed):
        assert ta == tb
        np.testing.assert_allclose(Ta, Tb, atol=1e-4)


def test_cli_evaluate(tmp_path):
    from dvo_slam_tpu.utils import se3_np, tum

    poses = synthetic.orbit_trajectory(6, radius=0.1)
    ts = [float(i) for i in range(6)]
    est_path = str(tmp_path / "est.txt")
    gt_path = str(tmp_path / "gt.txt")
    tum.write_trajectory(est_path, ts, poses)
    # Groundtruth = same trajectory rigidly moved: ATE must be ~0.
    offset = se3_np.exp(np.array([0.3, -0.2, 0.1, 0.2, 0.1, -0.3]))
    tum.write_trajectory(gt_path, ts, [offset @ T for T in poses])

    from dvo_slam_tpu import cli

    rc = cli.main(["evaluate", est_path, gt_path])
    assert rc == 0


def test_stopwatch_and_logger(tmp_path):
    from dvo_slam_tpu.utils import stats

    watch = stats.Stopwatch()
    with watch.section("a"):
        x = sum(range(1000))
    with watch.section("a"):
        pass
    s = watch.summary()
    assert s["a"]["count"] == 2
    assert "a" in watch.report()

    # Device sections: outputs registered on the handle are blocked on at
    # exit, so the section measures device latency, not dispatch time.
    import jax
    import jax.numpy as jnp

    with watch.section("dev") as sec:
        y = sec.block_on(jax.jit(lambda v: v * 2)(jnp.ones(16)))
    np.testing.assert_allclose(np.asarray(y), 2.0)
    assert watch.summary()["dev"]["count"] == 1

    log_path = str(tmp_path / "frames.jsonl")
    logger = stats.FrameLogger(log_path)
    logger.log(frame=1, entropy=-54.2, iters=np.asarray([3, 4]))
    logger.close()
    rec = json.loads(open(log_path).read().strip())
    assert rec["frame"] == 1 and rec["iters"] == [3, 4]


def test_visualizer_outputs(tmp_path):
    from dvo_slam_tpu.utils import visualization as viz

    v = viz.FileTrajectoryVisualizer(str(tmp_path / "viz"))
    poses = synthetic.orbit_trajectory(5, radius=0.1)
    for i, T in enumerate(poses):
        v.add_pose(float(i), T, is_keyframe=(i % 2 == 0))
    pts = np.random.default_rng(0).normal(size=(100, 3))
    v.add_point_cloud(pts)
    v.finish()
    assert os.path.exists(tmp_path / "viz" / "trajectory.txt")
    assert os.path.exists(tmp_path / "viz" / "keyframes.txt")
    ply = open(tmp_path / "viz" / "cloud_0000.ply").read()
    assert "element vertex 100" in ply

    # Round-trip: the dumped trajectory must match what went in.
    from dvo_slam_tpu.utils import tum

    back = tum.read_trajectory(str(tmp_path / "viz" / "trajectory.txt"))
    np.testing.assert_allclose(back[2][1], poses[2], atol=1e-5)


def test_point_cloud_from_rgbd():
    from dvo_slam_tpu.utils import visualization as viz

    scene = synthetic.PlaneScene()
    intensity, depth = scene.render(np.asarray(K_TUPLE), W, H, np.eye(4))
    pts, colors = viz.point_cloud_from_rgbd(intensity, depth, K_TUPLE, stride=4)
    assert pts.shape[1] == 3 and len(pts) == len(colors)
    # All points must lie on the scene plane: n.X = d.
    n, d = scene.planes[0]
    np.testing.assert_allclose(pts @ n, d, atol=1e-3)


def test_benchmark_graph_export(tmp_path):
    """--graph-out writes the final optimized pose graph as loadable .g2o
    with one vertex per keyframe (reference g2o interchange)."""
    import numpy as np

    from dvo_slam_tpu import benchmark
    from dvo_slam_tpu.utils import g2o_io, synthetic

    import dataclasses

    K = (W * 0.8, W * 0.8, (W - 1) / 2.0, (H - 1) / 2.0)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(8, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)
    out = str(tmp_path / "graph.g2o")
    # Switch on every frame so the exported graph has real edges (the tiny
    # orbit never degrades entropy enough on its own).
    cfg = dataclasses.replace(SLAM, min_entropy_ratio=2.0)
    res = benchmark.run_sequence(
        ((i / 30.0, f[0], f[1]) for i, f in enumerate(frames)),
        K, TRACKER, cfg, mode="keyframe", warmup=0, graph_out=out,
    )
    g = g2o_io.load_g2o(out)
    assert int(g.num_vertices) == res.num_keyframes >= 2
    assert int(g.num_edges) >= res.num_keyframes - 1
    assert np.isfinite(np.asarray(g.poses[:int(g.num_vertices)])).all()


def test_slam_covariance_export(tmp_path):
    """Per-frame covariance export from the KEYFRAME engines (the
    reference keyframe-tracker node publishes PoseWithCovarianceStamped
    too), per-frame and chunked paths."""
    import numpy as np

    from dvo_slam_tpu import benchmark
    from dvo_slam_tpu.utils import synthetic

    K = (W * 0.8, W * 0.8, (W - 1) / 2.0, (H - 1) / 2.0)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(6, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)

    for chunk in (None, 3):
        cov_path = str(tmp_path / f"cov_{chunk}.txt")
        benchmark.run_sequence(
            ((i / 30.0, f[0], f[1]) for i, f in enumerate(frames)),
            K, TRACKER, SLAM, mode="keyframe", warmup=0,
            covariance_out=cov_path, chunk_size=chunk,
        )
        rows = [line.split() for line in open(cov_path)]
        assert len(rows) == 6, chunk
        assert all(len(r) == 37 for r in rows)
        # First frame (the anchor keyframe) has zero covariance; later
        # frames carry a real SPD covariance.
        c0 = np.asarray([float(v) for v in rows[0][1:]]).reshape(6, 6)
        np.testing.assert_allclose(c0, 0.0)
        c2 = np.asarray([float(v) for v in rows[2][1:]]).reshape(6, 6)
        assert np.isfinite(c2).all()
        np.testing.assert_allclose(c2, c2.T, atol=1e-12)
        assert (np.linalg.eigvalsh(c2) > 0).all()


def test_checkpoint_exact_path_any_extension(tmp_path):
    """save_slam must write the EXACT path given: np.savez_compressed on a
    path string silently appends '.npz' to other extensions, so
    `--checkpoint-out state.ckpt` + `--resume state.ckpt` would
    FileNotFoundError on a path the run reported saving."""
    import os

    frames, poses = _frames(3)
    slam = KeyframeSlam(K_TUPLE, TRACKER, SLAM, enable_loop_closure=False)
    slam.init(poses[0])
    for i, (intensity, depth) in enumerate(frames):
        slam.update(intensity, depth, i / 30.0)
    path = str(tmp_path / "state.ckpt")
    checkpoint.save_slam(path, slam)
    assert os.path.exists(path), os.listdir(tmp_path)
    assert not os.path.exists(path + ".npz")
    resumed = checkpoint.load_slam(path, K_TUPLE, TRACKER, SLAM,
                                   enable_loop_closure=False)
    ta, tb = slam.trajectory(), resumed.trajectory()
    assert len(ta) == len(tb) and len(ta) == 3
    for (sa, Ta), (sb, Tb) in zip(ta, tb):
        assert sa == sb
        assert_cross_run_close(Ta, Tb)
