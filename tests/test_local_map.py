"""Windowed local-map optimization (reference dvo_slam/src/local_map.cpp)."""

import dataclasses

import numpy as np

from dvo_slam_tpu.config import SlamConfig, TrackerConfig
from dvo_slam_tpu.models.keyframe_tracker import KeyframeSlam, fuse_relative_poses
from dvo_slam_tpu.models.local_map import LocalMap
from dvo_slam_tpu.utils import evaluate, se3_np, synthetic

from cross_run import assert_cross_run_close

W, H = 64, 48
K_TUPLE = (32.0, 32.0, (W - 1) / 2.0, (H - 1) / 2.0)
TRACKER = TrackerConfig(num_levels=2, first_level=1, last_level=0, max_iterations=30)
SLAM = SlamConfig(
    max_keyframes=32,
    max_edges=128,
    min_constraint_distance=3,
    coarse_first_level=1,
    coarse_last_level=1,
    validation_batch=4,
    local_map_capacity=16,
)


def _pose_err(T_a, T_b):
    return np.linalg.norm(se3_np.log(T_a @ se3_np.inverse(T_b)))


def test_exact_measurements_are_a_fixed_point():
    """With noise-free consistent measurements the joint solve must return
    the estimates unchanged (zero-residual fixed point)."""
    rng = np.random.default_rng(0)
    lm = LocalMap(capacity=16)
    T = np.eye(4)
    info = np.eye(6) * 1e4
    for i in range(5):
        step = se3_np.exp(rng.normal(scale=0.02, size=6))
        T = step @ T  # T_kf_frame chain
        lm.add_frame(i, T, (T.copy(), info), (step.copy(), info))
    refined = lm.optimize(iterations=10)
    for est, ref in zip(lm.estimates, refined):
        assert _pose_err(est, ref) < 1e-5


def test_window_solve_beats_forward_fusion():
    """Joint window optimization propagates information backwards along the
    window; it must beat the forward-only closed-form fusion chain on a
    noisy window (the reason LocalMap exists)."""
    rng = np.random.default_rng(1)
    n = 10
    trials_joint, trials_fused = [], []
    for _ in range(10):
        # Ground-truth chain of frame poses relative to the keyframe.
        true = []
        T = np.eye(4)
        steps = []
        for _ in range(n):
            step = se3_np.exp(
                np.concatenate([rng.normal(scale=0.03, size=3),
                                rng.normal(scale=0.02, size=3)])
            )
            steps.append(step)
            T = step @ T
            true.append(T.copy())
        # Noisy measurements: weak kf alignments, stronger odometry.
        kf_info = np.eye(6) * 1.0 / (0.02**2)
        odo_info = np.eye(6) * 1.0 / (0.008**2)
        kf_meas = [se3_np.exp(rng.normal(scale=0.02, size=6)) @ t for t in true]
        odo_meas = [se3_np.exp(rng.normal(scale=0.008, size=6)) @ s for s in steps]

        # Forward fusion chain (what the orchestrator does per frame).
        lm = LocalMap(capacity=16)
        T_prev = np.eye(4)
        for i in range(n):
            T_alt = odo_meas[i] @ T_prev
            fused = fuse_relative_poses(kf_meas[i], kf_info, T_alt, odo_info)
            lm.add_frame(i, fused, (kf_meas[i], kf_info), (odo_meas[i], odo_info))
            T_prev = fused
        refined = lm.optimize(iterations=10)

        trials_fused.append(np.mean([_pose_err(e, t) for e, t in zip(lm.estimates, true)]))
        trials_joint.append(np.mean([_pose_err(r, t) for r, t in zip(refined, true)]))
    fused_err = float(np.mean(trials_fused))
    joint_err = float(np.mean(trials_joint))
    assert joint_err < fused_err * 0.95, (joint_err, fused_err)


def test_slam_local_map_improves_noisy_trajectory():
    """End to end: windowed local-map refinement must not hurt — and should
    help — trajectory accuracy on a noisy sequence."""
    rng = np.random.default_rng(5)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(14, radius=0.07)
    frames = [
        synthetic.add_sensor_noise(i, z, rng, intensity_std=4.0,
                                   depth_rel_std=0.02)
        for i, z in synthetic.render_sequence(scene, np.asarray(K_TUPLE), W, H, poses)
    ]

    def run(local_map_on):
        cfg = dataclasses.replace(SLAM, local_map_optimize=local_map_on)
        slam = KeyframeSlam(K_TUPLE, TRACKER, cfg, enable_loop_closure=False)
        slam.init(poses[0])
        for i, (intensity, depth) in enumerate(frames):
            if i > 0 and i % 6 == 0:
                slam.force_keyframe()
            slam.update(intensity, depth, i / 30.0)
        est = [T for _, T in slam.finish()]
        return evaluate.ate_rmse(est, poses)

    ate_on = run(True)
    ate_off = run(False)
    assert ate_on <= ate_off * 1.05, (ate_on, ate_off)
    assert ate_on < 0.01, f"ATE with local map {ate_on*1000:.2f} mm"


def test_measurementless_window_is_trivial_not_a_handle():
    """A window whose frames carry NO accepted measurements must fall back
    to the fused estimates: optimize_async returns None (never the
    estimates list — callers treat any non-None return as a device poses
    handle for refined_from, which would crash / produce garbage)."""
    lm = LocalMap(capacity=16)
    rng = np.random.default_rng(7)
    ests = []
    for i in range(3):
        T = se3_np.exp(rng.normal(scale=0.02, size=6))
        ests.append(T)
        lm.add_frame(i, T, None, None)
    assert lm.optimize_async() is None
    refined = lm.optimize()
    assert len(refined) == 3
    for r, e in zip(refined, ests):
        np.testing.assert_allclose(r, e)


def test_deferred_window_refinement_lands_everywhere():
    """The window solve is dispatched at the switch and collected at the
    NEXT transfer (reference: LocalMap::optimize runs on the background
    graph thread). Every read path must land it first: trajectory()
    called immediately after the switch, a subsequent update()'s
    piggybacked fetch, and finish()."""
    rng = np.random.default_rng(9)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(10, radius=0.06)
    frames = [
        synthetic.add_sensor_noise(i, z, rng, intensity_std=4.0,
                                   depth_rel_std=0.02)
        for i, z in synthetic.render_sequence(
            scene, np.asarray(K_TUPLE), W, H, poses)
    ]

    def drive(read_after_switch):
        slam = KeyframeSlam(K_TUPLE, TRACKER, SLAM, enable_loop_closure=False)
        slam.init(poses[0])
        for i, (intensity, depth) in enumerate(frames):
            if i == 6:
                slam.force_keyframe()
            slam.update(intensity, depth, i / 30.0)
            if i == 6 and read_after_switch:
                # Immediately consume the trajectory: the pending window
                # must be collected here, not silently dropped.
                assert slam._pending_window is not None
                traj = slam.trajectory()
                assert slam._pending_window is None
                assert len(traj) == 7
        return [T for _, T in slam.finish()]

    # Reading right after the switch must not change the final result
    # vs letting the next update()'s fetch collect it.
    t_eager = drive(True)
    t_lazy = drive(False)
    for Ta, Tb in zip(t_eager, t_lazy):
        assert_cross_run_close(Ta, Tb)

    # ... and the refinement genuinely landed: window frame records moved
    # away from their closed-form fused estimates.
    slam = KeyframeSlam(K_TUPLE, TRACKER, SLAM, enable_loop_closure=False)
    slam.init(poses[0])
    for i, (intensity, depth) in enumerate(frames[:6]):
        slam.update(intensity, depth, i / 30.0)
    fused = [f.T_kf_frame.copy() for f in slam.frames[1:]]
    slam.force_keyframe()
    slam.update(*frames[6], 6 / 30.0)
    assert slam._pending_window is not None
    slam._collect_pending_window()
    refined = [f.T_kf_frame for f in slam.frames[1:6]]
    deltas = [np.linalg.norm(se3_np.log(a @ se3_np.inverse(b)))
              for a, b in zip(refined, fused)]
    assert max(deltas) > 0.0, deltas
