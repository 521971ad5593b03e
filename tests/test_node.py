"""Streaming node protocol tests (the dvo_ros live-entry-point stand-in)."""

import threading

import numpy as np
import pytest

from dvo_slam_tpu import node
from dvo_slam_tpu.config import SlamConfig, TrackerConfig
from dvo_slam_tpu.utils import evaluate, synthetic

W, H = 64, 48
K = (32.0, 32.0, (W - 1) / 2.0, (H - 1) / 2.0)
TRACKER = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=30)
SLAM = SlamConfig(max_keyframes=32, max_edges=128, min_constraint_distance=3,
                  coarse_first_level=1, coarse_last_level=1,
                  validation_batch=4)


def _serve_unix(path, mode, with_covariance=False):
    t = threading.Thread(
        target=node.serve,
        args=(path, K),
        kwargs=dict(tracker_cfg=TRACKER, slam_cfg=SLAM, mode=mode,
                    with_covariance=with_covariance, unix=True,
                    max_sessions=1),
        daemon=True,
    )
    t.start()
    return t


def _wait_socket(path, client_cls=node.StreamClient, tries=100):
    import time

    for _ in range(tries):
        try:
            return client_cls.connect_unix(path)
        except (FileNotFoundError, ConnectionRefusedError):
            time.sleep(0.05)
    raise TimeoutError(path)


def test_live_slam_session(tmp_path):
    """Stream a synthetic sequence through the socket node: per-frame pose
    messages track groundtruth, force_keyframe works, finish returns the
    optimized trajectory."""
    sock_path = str(tmp_path / "dvo.sock")
    thread = _serve_unix(sock_path, "slam")
    client = _wait_socket(sock_path)

    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(10, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)
    live_poses = []
    for i, (intensity, depth) in enumerate(frames):
        if i == 4:
            client.command("force_keyframe", expect_reply=False)
        msg = client.send_frame(i / 30.0, intensity, depth)
        assert len(msg["pose"]) == 16
        live_poses.append(np.asarray(msg["pose"]).reshape(4, 4))
        if i == 4:
            assert msg["keyframe"]
    final = client.finish()
    client.close()
    thread.join(timeout=30)

    traj = [np.asarray(e["pose"]).reshape(4, 4) for e in final["trajectory"]]
    assert len(traj) == len(frames)
    # Streaming poses are live estimates; the finished trajectory is the
    # optimized one — both must track groundtruth (init at identity, gt
    # starts at identity).
    assert evaluate.ate_rmse(live_poses, poses) < 0.005
    assert evaluate.ate_rmse(traj, poses) < 0.005


def test_live_reconfigure(tmp_path):
    """dynamic_reconfigure equivalent: tracker knobs retune mid-stream;
    pyramid geometry is rejected."""
    sock_path = str(tmp_path / "cfg.sock")
    thread = _serve_unix(sock_path, "slam")
    client = _wait_socket(sock_path)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(6, radius=0.04)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)
    for i in range(3):
        client.send_frame(i / 30.0, *frames[i])
    reply = client.configure(max_iterations=12, huber_k=2.0)
    assert reply["tracker"]["max_iterations"] == 12
    assert reply["tracker"]["huber_k"] == 2.0
    bad = client.configure(num_levels=3)
    assert "error" in bad
    for i in range(3, 6):
        msg = client.send_frame(i / 30.0, *frames[i])
        assert len(msg["pose"]) == 16
    final = client.finish()
    assert len(final["trajectory"]) == 6
    client.close()
    thread.join(timeout=30)


def test_live_odometry_covariance(tmp_path):
    sock_path = str(tmp_path / "odo.sock")
    thread = _serve_unix(sock_path, "odometry", with_covariance=True)
    client = _wait_socket(sock_path)

    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(5, radius=0.04)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)
    last = None
    for i, (intensity, depth) in enumerate(frames):
        last = client.send_frame(i / 30.0, intensity, depth)
    # PoseWithCovarianceStamped equivalent: 6x6 covariance rides along.
    cov = np.asarray(last["covariance"]).reshape(6, 6)
    assert np.isfinite(cov).all() and (np.linalg.eigvalsh(cov) > 0).all()
    final = client.finish()
    assert len(final["trajectory"]) == len(frames)
    client.close()
    thread.join(timeout=30)
