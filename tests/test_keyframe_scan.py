"""Device-resident keyframe odometry scan vs the host orchestrator."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.config import SlamConfig, TrackerConfig
from dvo_slam_tpu.models import keyframe_scan
from dvo_slam_tpu.models.keyframe_tracker import KeyframeSlam
from dvo_slam_tpu.ops import camera
from dvo_slam_tpu.utils import evaluate, synthetic

W, H = 64, 48
K_TUPLE = (32.0, 32.0, (W - 1) / 2.0, (H - 1) / 2.0)
TRACKER = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=30)
# local_map_optimize off: the scan implements the closed-form fusion path
# (the windowed solve remains a host-side refinement).
SLAM = SlamConfig(local_map_optimize=False, min_constraint_distance=3)


def _sequence(n=10, radius=0.05, dropout=None, rng=None):
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(n, radius=radius)
    frames = synthetic.render_sequence(scene, np.asarray(K_TUPLE), W, H, poses)
    if dropout is not None:
        out = []
        for i, (intensity, depth) in enumerate(frames):
            d = depth.copy()
            d[:, : int(W * min(0.85, dropout * i))] = np.nan
            out.append((intensity, d))
        frames = out
    return frames, poses


def test_scan_matches_host_orchestrator():
    """One-dispatch keyframe odometry must reproduce the host loop
    (same decisions, same switch frames, same trajectory)."""
    frames, poses = _sequence(10)
    force = np.zeros(10, bool)
    force[[4, 8]] = True

    slam = KeyframeSlam(K_TUPLE, TRACKER, SLAM, enable_loop_closure=False)
    slam.init()
    for i, (intensity, depth) in enumerate(frames):
        if force[i]:
            slam.force_keyframe()
        slam.update(intensity, depth, i / 30.0)
    host_traj = [T for _, T in slam.trajectory()]
    host_kf = sorted({f.keyframe_idx for f in slam.frames})

    seq_i = jnp.stack([jnp.asarray(f[0]) for f in frames])
    seq_z = jnp.stack([jnp.asarray(f[1]) for f in frames])
    outs = keyframe_scan.track_keyframe_sequence(
        seq_i, seq_z, camera.intrinsics(*K_TUPLE), TRACKER, SLAM,
        force_keyframe=jnp.asarray(force),
    )
    scan_traj, kf_indices = keyframe_scan.compose_keyframe_trajectory(outs)

    assert len(scan_traj) == len(host_traj)
    # Same keyframe cadence: host kf idx k corresponds to its frame index.
    host_kf_frames = [0] + [
        i + 1 for i, s in enumerate(np.asarray(outs["switch"])) if s
    ]
    assert kf_indices == host_kf_frames
    assert len(kf_indices) == len(slam.keyframes)
    for Th, Ts in zip(host_traj, scan_traj):
        np.testing.assert_allclose(Ts, Th, atol=1e-4)


def test_scan_entropy_switches_and_accuracy():
    """Without forced keyframes, degrading depth must trigger entropy-ratio
    switches on device, and the composed trajectory must stay accurate."""
    frames, poses = _sequence(10, radius=0.02, dropout=0.12)
    seq_i = jnp.stack([jnp.asarray(f[0]) for f in frames])
    seq_z = jnp.stack([jnp.asarray(f[1]) for f in frames])
    outs = keyframe_scan.track_keyframe_sequence(
        seq_i, seq_z, camera.intrinsics(*K_TUPLE), TRACKER, SLAM,
    )
    assert bool(np.asarray(outs["switch"]).any()), "entropy switch never fired"
    traj, kf_indices = keyframe_scan.compose_keyframe_trajectory(
        outs, T0=poses[0]
    )
    ate = evaluate.ate_rmse(traj, poses)
    assert ate < 0.01, f"scan keyframe odometry ATE {ate*1000:.2f} mm"
    assert len(kf_indices) >= 2


def test_entropy_floor_shared_and_engines_agree_at_boundary():
    """The entropy-denominator floor is ONE constant imported by both
    engines (a drift would silently desynchronize their keyframe cadence),
    and the host and traced entropy-ratio forms agree exactly in the
    floor-active regime (|h_ref| < floor, where the denominator clamps)."""
    from dvo_slam_tpu.models import dense_tracker

    assert keyframe_scan._ENTROPY_FLOOR is dense_tracker._ENTROPY_DENOM_FLOOR

    floor = dense_tracker._ENTROPY_DENOM_FLOOR
    # Boundary cases: reference entropy below/at/above the floor, either
    # sign, degradation and improvement.
    for h_ref in (-0.5 * floor, 0.25 * floor, floor, -3.0 * floor, 2.7):
        for h_cur in (h_ref - 1.3, h_ref, h_ref + 0.8, -4.1):
            host = dense_tracker.entropy_ratio(h_cur, h_ref)
            traced = float(keyframe_scan._entropy_ratio_jnp(
                jnp.float32(h_cur), jnp.float32(h_ref), jnp.bool_(True)
            ))
            np.testing.assert_allclose(traced, host, rtol=1e-6, atol=1e-6)
