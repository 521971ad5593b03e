"""Streaming node protocol tests (the dvo_ros live-entry-point stand-in)."""

import threading

import numpy as np
import pytest

from dvo_slam_tpu import node
from dvo_slam_tpu.config import SlamConfig, TrackerConfig
from dvo_slam_tpu.utils import evaluate, synthetic

from cross_run import assert_cross_run_close

W, H = 64, 48
K = (32.0, 32.0, (W - 1) / 2.0, (H - 1) / 2.0)
TRACKER = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=30)
SLAM = SlamConfig(max_keyframes=32, max_edges=128, min_constraint_distance=3,
                  coarse_first_level=1, coarse_last_level=1,
                  validation_batch=4)


def _serve_unix(path, mode, with_covariance=False, visualizer=None,
                publish_clouds=False, chunk=0):
    t = threading.Thread(
        target=node.serve,
        args=(path, K),
        kwargs=dict(tracker_cfg=TRACKER, slam_cfg=SLAM, mode=mode,
                    with_covariance=with_covariance, unix=True,
                    max_sessions=1, visualizer=visualizer,
                    publish_clouds=publish_clouds, chunk=chunk),
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


def test_broadcast_drops_stalled_subscriber(monkeypatch):
    """A subscriber that stops reading must be dropped after the send
    timeout instead of wedging publish (and every camera session) forever."""
    import socket
    import time

    monkeypatch.setattr(node.Broadcast, "SEND_TIMEOUT_S", 0.2)
    bcast = node.Broadcast()

    stalled_srv, stalled_cli = socket.socketpair()
    healthy_srv, healthy_cli = socket.socketpair()
    # Tiny buffers so the stalled peer's pipe fills quickly.
    for s in (stalled_srv, stalled_cli):
        s.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 4096)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
    bcast.add(stalled_srv)
    bcast.add(healthy_srv)

    msg = {"pose": list(range(2000))}  # ~10 KB per publish
    drained = []

    def drain():
        healthy_cli.settimeout(5.0)
        try:
            while True:
                chunk = healthy_cli.recv(65536)
                if not chunk:
                    break
                drained.append(chunk)
        except OSError:
            pass

    t = threading.Thread(target=drain, daemon=True)
    t.start()
    start = time.monotonic()
    for _ in range(40):  # enough to overflow the stalled pipe many times
        bcast.publish(msg)
    elapsed = time.monotonic() - start
    # publish only ENQUEUES (per-subscriber writer threads do the sends):
    # the hot path must never block on any subscriber's TCP buffer.
    assert elapsed < 2.0, elapsed

    def live_socks():
        with bcast._lock:
            return [sub.sock for sub in bcast._subs]

    # The stalled subscriber's writer hits the 0.2 s send timeout once its
    # pipe fills, and the drop happens asynchronously shortly after.
    deadline = time.monotonic() + 5.0
    while stalled_srv in live_socks() and time.monotonic() < deadline:
        time.sleep(0.02)
    assert stalled_srv not in live_socks()
    assert healthy_srv in live_socks()
    # Wait for the healthy writer to flush the full feed, then close.
    while (sum(c.count(b"\n") for c in drained) < 40
           and time.monotonic() < deadline):
        time.sleep(0.02)
    healthy_srv.close()
    t.join(timeout=5)
    # The healthy subscriber received a full, uncorrupted feed.
    lines = b"".join(drained).decode().strip().split("\n")
    assert len(lines) == 40
    import json as _json

    assert all(_json.loads(line)["pose"][:3] == [0, 1, 2] for line in lines)
    for s in (stalled_cli, healthy_cli):
        s.close()


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


def test_live_subscriber_and_visualizer(tmp_path):
    """Pub/sub + live viz (the rviz stand-in): a subscriber connection
    receives every camera pose message; the remote viewer and the node's
    in-process live visualizer both materialize the trajectory."""
    import time

    from dvo_slam_tpu.utils.visualization import LiveTrajectoryVisualizer

    sock_path = str(tmp_path / "pub.sock")
    server_viz = LiveTrajectoryVisualizer(str(tmp_path / "node_viz"),
                                          snapshot_every=2)
    thread = _serve_unix(sock_path, "slam", visualizer=server_viz)
    _wait_socket(sock_path).close()  # wait for the listener

    viewer_viz = LiveTrajectoryVisualizer(str(tmp_path / "viewer"),
                                          snapshot_every=3)
    viewer_out = {}
    viewer = threading.Thread(
        target=lambda: viewer_out.setdefault(
            "n", node.view(sock_path, viewer_viz, unix=True)
        ),
        daemon=True,
    )
    viewer.start()
    time.sleep(0.3)  # let the subscriber register before frames flow

    client = _wait_socket(sock_path)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(8, radius=0.04)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)
    sent = []
    for i, (intensity, depth) in enumerate(frames):
        msg = client.send_frame(i / 30.0, intensity, depth)
        sent.append(np.asarray(msg["pose"]).reshape(4, 4))
    client.finish()
    client.close()
    thread.join(timeout=30)
    viewer.join(timeout=30)

    # The subscriber saw the full per-frame feed, identical to the camera
    # client's replies.
    assert viewer_out["n"] == len(frames)
    assert len(viewer_viz.poses) == len(frames)
    for (_, T_sub), T_cam in zip(viewer_viz.poses, sent):
        np.testing.assert_allclose(T_sub, T_cam, atol=1e-12)
    # Both visualizers rendered live snapshots + final artifacts.
    for d in ("node_viz", "viewer"):
        assert (tmp_path / d / "trajectory.png").exists()
        traj = (tmp_path / d / "trajectory.txt").read_text().strip()
        assert len(traj.splitlines()) == len(frames)
    # Keyframe clouds from the in-process visualizer (frame 0 is a keyframe).
    assert (tmp_path / "node_viz" / "cloud_0000.ply").exists()


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


def test_live_slam_covariance(tmp_path):
    """The SLAM-mode node also publishes per-frame covariance (reference
    camera_keyframe_tracker PoseWithCovarianceStamped)."""
    sock_path = str(tmp_path / "slam_cov.sock")
    thread = _serve_unix(sock_path, "slam", with_covariance=True)
    client = _wait_socket(sock_path)

    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(5, radius=0.04)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)
    msgs = [client.send_frame(i / 30.0, f[0], f[1])
            for i, f in enumerate(frames)]
    # First frame (anchor keyframe) carries the zero covariance; later
    # frames a real SPD one.
    c0 = np.asarray(msgs[0]["covariance"]).reshape(6, 6)
    np.testing.assert_allclose(c0, 0.0)
    c2 = np.asarray(msgs[2]["covariance"]).reshape(6, 6)
    assert np.isfinite(c2).all() and (np.linalg.eigvalsh(c2) > 0).all()
    client.finish()
    client.close()
    thread.join(timeout=30)


def test_live_slam_reconfigure_and_clouds(tmp_path):
    """Round 3 surface: SlamConfig fields retune live (the reference's
    dvo_slam dynamic_reconfigure .cfg) and keyframe point clouds ride the
    pose feed (the PCL point-cloud topic equivalent)."""
    sock_path = str(tmp_path / "cfg2.sock")
    thread = _serve_unix(sock_path, "slam", publish_clouds=True)
    client = _wait_socket(sock_path)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(5, radius=0.04)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)

    # Frame 0 creates the anchor keyframe: its message carries the cloud.
    msg0 = client.send_frame(0.0, *frames[0])
    assert msg0["keyframe"] and "cloud" in msg0
    pts = np.asarray(msg0["cloud"]["points"])
    cols = np.asarray(msg0["cloud"]["colors"])
    assert pts.ndim == 2 and pts.shape[1] == 3 and len(pts) >= 40
    assert cols.shape == pts.shape
    assert np.isfinite(pts).all()

    # SLAM-layer knobs retune live; capacities are refused.
    reply = client.configure(
        slam={"min_entropy_ratio": 0.8, "new_constraint_search_radius": 2.0,
              "coarse_max_iterations": 10},
        max_iterations=12,
    )
    assert reply["slam"]["min_entropy_ratio"] == 0.8
    assert reply["slam"]["new_constraint_search_radius"] == 2.0
    assert reply["tracker"]["max_iterations"] == 12
    bad = client.configure(slam={"max_keyframes": 64})
    assert "error" in bad

    # Atomicity: a reply-level error must leave the engine UNTOUCHED even
    # when only a DERIVED config is invalid (valid tracker fields + slam
    # coarse levels violating TrackerConfig invariants) — an error reply
    # and a silently-retuned engine must never coexist.
    bad = client.configure(
        max_iterations=40,
        slam={"coarse_first_level": 0, "coarse_last_level": 1},
    )
    assert "error" in bad
    check = client.configure()  # no-op reconfigure reads back the state
    assert check["tracker"]["max_iterations"] == 12
    assert check["slam"]["coarse_first_level"] != 0

    for i in range(1, 5):
        msg = client.send_frame(i / 30.0, *frames[i])
        assert ("cloud" in msg) == bool(msg["keyframe"])
    final = client.finish()
    assert len(final["trajectory"]) == 5
    client.close()
    thread.join(timeout=30)


def test_broadcast_drops_backlogged_subscriber(monkeypatch):
    """A subscriber that trickles (never hitting the send timeout, so the
    timeout path can't catch it) must be dropped when it falls QUEUE_CAP
    messages behind — not rate-limit every camera session to its pace."""
    import socket
    import time

    monkeypatch.setattr(node.Broadcast, "QUEUE_CAP", 4)
    monkeypatch.setattr(node.Broadcast, "SEND_TIMEOUT_S", 30.0)
    bcast = node.Broadcast()
    srv, cli = socket.socketpair()
    for s in (srv, cli):
        s.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 4096)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
    bcast.add(srv)
    msg = {"pose": list(range(2000))}  # ~10 KB per publish
    start = time.monotonic()
    for _ in range(30):  # pipe (~8 KB) + queue (4) overflow well before 30
        bcast.publish(msg)
    assert time.monotonic() - start < 2.0  # the hot path never blocked
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        with bcast._lock:
            if not bcast._subs:
                break
        time.sleep(0.02)
    with bcast._lock:
        assert not bcast._subs  # dropped via overflow, not timeout
    cli.close()


def test_live_rejects_malformed_frame_dims(tmp_path):
    """A negative w*h would make BufferedReader.read(-N) swallow the
    stream to EOF (silent desync); a huge one is an unbounded allocation.
    The session must drop the client instead."""
    import json as _json
    import socket

    sock_path = str(tmp_path / "bad.sock")
    _serve_unix(sock_path, "odometry")

    import time

    deadline = time.monotonic() + 5.0
    sock = None
    while time.monotonic() < deadline:
        try:
            sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            sock.connect(sock_path)
            break
        except (FileNotFoundError, ConnectionRefusedError):
            sock.close()
            sock = None
            time.sleep(0.05)
    assert sock is not None
    sock.sendall((_json.dumps({"t": 0.0, "w": -1, "h": 4}) + "\n").encode())
    sock.settimeout(10.0)
    # Server must close the session (EOF), not hang waiting for payload.
    assert sock.recv(1) == b""
    sock.close()


def test_live_chunked_matches_per_frame(tmp_path):
    """The --chunk latency/throughput knob: a chunked session emits
    exactly one pose message per frame (in bursts, in frame order) and
    its finished trajectory matches the per-frame node over the same
    stream (control commands flush pending frames first)."""
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(12, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)

    # Per-frame reference session.
    path1 = str(tmp_path / "pf.sock")
    t1 = _serve_unix(path1, "slam")
    c1 = _wait_socket(path1)
    for i, (ii, zz) in enumerate(frames):
        c1.send_frame(i / 30.0, ii, zz)
    final_pf = c1.finish()
    c1.close()
    t1.join(timeout=30)

    # Chunked session: pipelined sends, burst replies.
    path2 = str(tmp_path / "ck.sock")
    t2 = _serve_unix(path2, "slam", chunk=4)
    c2 = _wait_socket(path2)
    for i, (ii, zz) in enumerate(frames):
        c2.send_frame_nowait(i / 30.0, ii, zz)
    final_ck = c2.finish()  # flushes the tail; poses land in pose_backlog
    bursts = c2.pose_backlog
    c2.close()
    t2.join(timeout=30)

    assert len(bursts) == len(frames)
    ts = [m["t"] for m in bursts]
    assert ts == sorted(ts)
    assert all(len(m["pose"]) == 16 for m in bursts)

    traj_pf = [np.asarray(e["pose"]).reshape(4, 4)
               for e in final_pf["trajectory"]]
    traj_ck = [np.asarray(e["pose"]).reshape(4, 4)
               for e in final_ck["trajectory"]]
    assert len(traj_ck) == len(traj_pf) == len(frames)
    for Ta, Tb in zip(traj_ck, traj_pf):
        assert_cross_run_close(Ta, Tb)
    assert evaluate.ate_rmse(traj_ck, poses) < 0.005


def test_live_chunked_force_keyframe_flushes(tmp_path):
    """force_keyframe mid-stream in chunked mode flushes the buffered
    frames (their pose messages precede later bursts) and the forced
    keyframe lands on the next frame."""
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(10, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)

    path = str(tmp_path / "ckf.sock")
    t = _serve_unix(path, "slam", chunk=4)
    c = _wait_socket(path)
    for i, (ii, zz) in enumerate(frames):
        if i == 5:
            c.command("force_keyframe", expect_reply=False)
        c.send_frame_nowait(i / 30.0, ii, zz)
    final = c.finish()
    bursts = c.pose_backlog
    c.close()
    t.join(timeout=30)

    assert len(bursts) == len(frames)
    by_t = {round(m["t"] * 30): m for m in bursts}
    assert by_t[5]["keyframe"]
    assert len(final["trajectory"]) == len(frames)


@pytest.mark.parametrize("enc", ["raw", "raw12"])
def test_live_raw_wire_encodings(tmp_path, enc):
    """Sensor-native wire encodings ("raw" u8+u16 = 3 B/px, "raw12"
    u8+12-bit-packed = 2.5 B/px vs f32's 8) stream end to end: payloads
    stay raw through the socket AND the host->device upload (build_pyramid
    converts on device), trajectories match the f32 session to the depth
    quantization bound, and keyframe clouds (host-side metric conversion)
    stay finite."""
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(8, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)
    raw_frames = [
        (np.clip(np.round(ii), 0, 255).astype(np.uint8),
         np.nan_to_num(zz * 5000.0, nan=0.0).astype(np.uint16))
        for ii, zz in frames
    ]

    def run(send_frames, enc):
        path = str(tmp_path / f"{enc}.sock")
        t = _serve_unix(path, "slam", publish_clouds=True)
        c = _wait_socket(path)
        msgs = [c.send_frame(i / 30.0, ii, zz, enc=enc)
                for i, (ii, zz) in enumerate(send_frames)]
        final = c.finish()
        c.close()
        t.join(timeout=30)
        return msgs, [np.asarray(e["pose"]).reshape(4, 4)
                      for e in final["trajectory"]]

    msgs, traj = run(raw_frames, enc)
    assert msgs[0]["keyframe"] and "cloud" in msgs[0]
    pts = np.asarray(msgs[0]["cloud"]["points"])
    assert np.isfinite(pts).all() and len(pts) >= 40
    # Raw u8 intensity quantization costs a little accuracy vs the f32
    # wire; both must still track groundtruth tightly.
    assert evaluate.ate_rmse(traj, poses) < 0.005

    _, traj_f32 = run(frames, "f32")
    for Tr, Tf in zip(traj, traj_f32):
        np.testing.assert_allclose(Tr[:3, 3], Tf[:3, 3], atol=2e-3)


def test_chunked_staging_window_blocks_and_matches(tmp_path):
    """Opt-in eager staging (stage_eagerly=True) is flow-controlled: at
    most _STAGE_WINDOW un-landed uploads may be in flight. Forcing the
    window smaller than the chunk exercises the blocking branch on every
    frame past it; the trajectory must be unchanged vs per-frame mode
    (which also pins eager-staged == burst-uploaded semantics, since the
    burst path is equivalence-tested against per-frame elsewhere)."""
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(12, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)

    chunked = node.SlamNode(K, tracker_cfg=TRACKER, slam_cfg=SLAM,
                            mode="slam", chunk=4, stage_eagerly=True)
    chunked._STAGE_WINDOW = 2  # chunk 4 > window 2: block on frames 3+4
    msgs = []
    for i, (ii, zz) in enumerate(frames):
        msgs.extend(chunked.handle_frame(i / 30.0, ii, zz))
    msgs.extend(chunked._flush())
    traj_ck = chunked.engine.finish()

    per_frame = node.SlamNode(K, tracker_cfg=TRACKER, slam_cfg=SLAM,
                              mode="slam", chunk=0)
    for i, (ii, zz) in enumerate(frames):
        per_frame.handle_frame(i / 30.0, ii, zz)
    traj_pf = per_frame.engine.finish()

    assert len(msgs) == len(frames)
    assert [m["t"] for m in msgs] == sorted(m["t"] for m in msgs)
    assert len(traj_ck) == len(traj_pf) == len(frames)
    for (_, Ta), (_, Tb) in zip(traj_ck, traj_pf):
        assert_cross_run_close(np.asarray(Ta), np.asarray(Tb))
    est = [np.asarray(T) for _, T in traj_ck]
    assert evaluate.ate_rmse(est, poses) < 0.005


def test_stall_watchdog_publishes_event(tmp_path):
    """Failure detection for a wedged device transport: when one engine
    call exceeds stall_timeout, the watchdog publishes {"event":
    "stall"} on the pose feed (warn-only — the session completes
    normally once the call returns). Simulated by an engine whose
    second update sleeps past the timeout."""
    import json
    import socket as socket_mod
    import time

    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(4, radius=0.05)
    frames = synthetic.render_sequence(scene, np.asarray(K), W, H, poses)

    n = node.SlamNode(K, tracker_cfg=TRACKER, slam_cfg=SLAM, mode="slam")
    real_update = n.engine.update
    calls = {"k": 0}

    def slow_update(intensity, depth, t):
        calls["k"] += 1
        if calls["k"] == 2:
            time.sleep(1.2)  # one "wedged" engine call
        return real_update(intensity, depth, t)

    n.engine.update = slow_update

    broadcast = node.Broadcast()
    sub_srv, sub_cli = socket_mod.socketpair()
    broadcast.add(sub_srv)

    cam_srv, cam_cli = socket_mod.socketpair()
    t = threading.Thread(
        target=node.serve_connection, args=(cam_srv, n, broadcast),
        kwargs=dict(stall_timeout=0.4), daemon=True)
    t.start()

    client = node.StreamClient(cam_cli)
    for i, (ii, zz) in enumerate(frames):
        client.send_frame_nowait(i / 30.0, ii, zz)
    final = client.finish()
    assert len(final["trajectory"]) == len(frames)
    t.join(timeout=30)

    sub_cli.settimeout(10.0)
    feed = b""
    while b'"stall"' not in feed:
        feed += sub_cli.recv(65536)  # raises timeout if event never came
    events = [json.loads(l) for l in feed.decode().splitlines()
              if '"event"' in l]
    assert any(e["event"] == "stall" and e["stalled_s"] >= 0.4
               for e in events)
    # Warn-only and once per stuck call: every frame still got a pose.
    n_poses = sum(1 for l in feed.decode().splitlines() if '"pose"' in l)
    assert n_poses <= len(frames)
    client.close()
    sub_cli.close()
