"""Live streaming SLAM/odometry node — the dvo_ros equivalent.

The reference's live entry points are ROS nodes (SURVEY.md §2.3/S10:
camera_tracker / camera_keyframe_tracker subscribe synchronized RGB-D
topics and publish PoseWithCovarianceStamped + visualization topics).
This module provides the same live surface without ROS: a framed
socket protocol (Unix or TCP — the TCPROS stand-in) over which a client
streams RGB-D frames and receives per-frame pose messages back, plus the
same control surface the nodes expose (reset, force-keyframe, finish).

Wire protocol (newline-delimited JSON headers, raw payloads):

  client -> server, per frame:
      {"t": <timestamp>, "w": W, "h": H}\n
      W*H*4 bytes  float32 little-endian intensity (0..255)
      W*H*4 bytes  float32 little-endian depth (meters, NaN invalid)
  client -> server, control:
      {"cmd": "force_keyframe"}\n | {"cmd": "reset"}\n |
      {"cmd": "finish"}\n  (server replies with the full trajectory and
                           closes) | {"cmd": "trajectory"}\n |
      {"cmd": "configure", "tracker": {<TrackerConfig fields>},
       "slam": {<SlamConfig fields>}}\n
          (the dynamic_reconfigure equivalent: live-retune tracker AND
           SLAM-layer knobs — keyframe/loop-closure thresholds etc., the
           reference's dvo_slam::Config .cfg surface; pyramid geometry and
           padded-capacity fields are rejected mid-run — replies with the
           resulting configs or an error)
  server -> client, per frame (the PoseWithCovarianceStamped equivalent;
  also THE feed a live visualizer consumes — the rviz stand-in):
      {"t": ..., "pose": [16 floats, row-major T_world_cam],
       "keyframe": bool, "covariance": [36 floats]?,
       "cloud": {"points": [[x,y,z]...], "colors": [[r,g,b]...]}?}\n
          (cloud: downsampled world-frame keyframe point cloud, attached
           on keyframe frames when the server runs publish_clouds — the
           reference's PCL/rviz point-cloud topic equivalent)
  server -> client, on finish/trajectory:
      {"trajectory": [{"t": ..., "pose": [...]}, ...]}\n

Pub/sub (the `rgbd/pose` topic equivalent): a connection whose FIRST
message is {"cmd": "subscribe"}\n becomes a subscriber — it receives a
copy of every per-frame pose message from every camera session until it
disconnects. `view()` + `LiveTrajectoryVisualizer` make a live remote
trajectory viewer out of this feed (the rviz stand-in, SURVEY.md R3);
`serve(visualizer=...)` attaches one in-process instead (the reference
node's own marker publishing).

Everything device-side is the standard pipeline (KeyframeSlam /
OdometryTracker); this file is transport only.
"""

from __future__ import annotations

import json
import queue
import socket
import socketserver
import threading
from typing import Optional

import numpy as np


def _read_exact(rfile, n: int) -> bytes:
    """Read exactly n bytes from a buffered socket file (EOF -> error)."""
    data = rfile.read(n)
    if data is None or len(data) < n:
        raise ConnectionError("peer closed mid-message")
    return data


class _Subscriber:
    """One pose-feed subscriber: bounded queue + dedicated writer thread."""

    __slots__ = ("sock", "q", "thread")

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.q: "queue.Queue[Optional[bytes]]" = queue.Queue(
            maxsize=Broadcast.QUEUE_CAP
        )


class Broadcast:
    """Thread-safe fan-out of pose messages to subscriber sockets
    (the TCPROS publish side of the `rgbd/pose` topic).

    publish() only ENQUEUES: each subscriber has its own bounded queue
    drained by a dedicated writer thread, so the per-frame hot path never
    blocks on any subscriber's TCP buffer. A subscriber that trickles
    (staying under the send timeout, so it is never "dead") would
    otherwise rate-limit every camera session to the slowest viewer; now
    it just fills its own queue and gets dropped when it falls
    QUEUE_CAP messages behind — a live pose feed is only useful to a
    client that keeps up."""

    # Bound each low-level send so a fully-stalled subscriber's writer
    # thread fails out instead of blocking in sendall forever.
    SEND_TIMEOUT_S = 2.0
    # Messages a subscriber may fall behind before it is disconnected.
    QUEUE_CAP = 256

    def __init__(self):
        self._lock = threading.Lock()
        self._subs: list[_Subscriber] = []

    def add(self, sock: socket.socket) -> None:
        sock.settimeout(self.SEND_TIMEOUT_S)
        sub = _Subscriber(sock)
        sub.thread = threading.Thread(
            target=self._writer, args=(sub,), daemon=True,
            name="pose-feed-writer",
        )
        with self._lock:
            self._subs.append(sub)
        sub.thread.start()

    def _writer(self, sub: _Subscriber) -> None:
        try:
            while True:
                data = sub.q.get()
                if data is None:  # close_all / overflow sentinel
                    break
                sub.sock.sendall(data)
        except OSError:  # includes TimeoutError: slow/stalled/hung up
            pass
        finally:
            with self._lock:
                if sub in self._subs:
                    self._subs.remove(sub)
            try:
                sub.sock.close()
            except OSError:
                pass

    def publish(self, msg: dict) -> None:
        with self._lock:
            subs = list(self._subs)
        if not subs:
            return
        data = (json.dumps(msg) + "\n").encode()
        for sub in subs:
            try:
                sub.q.put_nowait(data)
            except queue.Full:
                # QUEUE_CAP messages behind: disconnect. shutdown() (not
                # just close) WAKES a writer blocked inside sendall; its
                # cleanup then removes the subscriber from the list.
                try:
                    sub.sock.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                try:
                    sub.sock.close()
                except OSError:
                    pass

    def close_all(self) -> None:
        """Disconnect every subscriber (server shutdown): unblocks their
        reads with EOF and lets the writer threads exit."""
        with self._lock:
            subs = list(self._subs)
            self._subs.clear()
        for sub in subs:
            try:
                sub.q.put_nowait(None)
            except queue.Full:
                pass
            try:
                sub.sock.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                sub.sock.close()
            except OSError:
                pass


class SlamNode:
    """Session state for one connected camera stream."""

    def __init__(self, K, tracker_cfg=None, slam_cfg=None, mode="slam",
                 with_covariance=False, frame_logger=None, visualizer=None,
                 visualizer_lock=None, publish_clouds=False):
        from dvo_slam_tpu.config import SlamConfig, TrackerConfig

        tracker_cfg = tracker_cfg or TrackerConfig()
        slam_cfg = slam_cfg or SlamConfig()
        self.mode = mode
        self.with_covariance = with_covariance
        self.publish_clouds = publish_clouds
        self.visualizer = visualizer
        # The visualizer may be shared by concurrent camera sessions in
        # the threaded server (serve passes one shared lock); matplotlib
        # rendering and the pose lists are not thread-safe.
        self._viz_lock = visualizer_lock or threading.Lock()
        self._K = np.asarray(K, np.float64).reshape(-1)[:4]
        if mode == "odometry":
            from dvo_slam_tpu.models.odometry import OdometryTracker

            self.engine = OdometryTracker(
                K, tracker_cfg, collect_covariance=with_covariance
            )
        else:
            from dvo_slam_tpu.models.keyframe_tracker import KeyframeSlam

            self.engine = KeyframeSlam(
                K, tracker_cfg, slam_cfg,
                enable_loop_closure=(mode == "slam"),
                frame_logger=frame_logger,
                collect_covariance=with_covariance,
            )
        self.engine.init()

    def handle_frame(self, t, intensity, depth) -> dict:
        if self.mode == "odometry":
            n_kf_before = 0
            pose = self.engine.update(intensity, depth, t)
            is_kf = False
        else:
            n_kf_before = len(self.engine.keyframes)
            pose = self.engine.update(intensity, depth, t)
            is_kf = len(self.engine.keyframes) > n_kf_before
        msg = {"t": t, "pose": np.asarray(pose).reshape(-1).tolist(),
               "keyframe": bool(is_kf)}
        if self.with_covariance and self.engine.covariances:
            cov = self.engine.covariances[-1][1]
            # Strict JSON has no NaN/Infinity tokens; a tracking-failure
            # frame's non-finite covariance would break non-Python
            # subscribers. Clamp to a huge variance ("unknown").
            cov = np.where(np.isfinite(cov), cov, 1e12)
            msg["covariance"] = cov.reshape(-1).tolist()
        if is_kf and (self.visualizer is not None or self.publish_clouds):
            from dvo_slam_tpu.utils.visualization import point_cloud_from_rgbd

            pts, colors = point_cloud_from_rgbd(
                intensity, depth, self._K, np.asarray(pose), stride=8
            )
            if self.publish_clouds:
                # Downsampled world-frame keyframe cloud on the pose feed
                # (reference PCL/rviz point-cloud topic): remote viewers
                # render the map live, not just the trajectory.
                msg["cloud"] = {
                    "points": np.round(pts, 4).tolist(),
                    "colors": np.round(colors, 3).tolist(),
                }
        if self.visualizer is not None:
            with self._viz_lock:
                self.visualizer.add_pose(t, np.asarray(pose), is_kf)
                if is_kf:
                    self.visualizer.add_point_cloud(pts, colors)
        return msg

    # SlamConfig fields that size compiled/stored state: changing them on
    # a live map would orphan the padded graph / window / HBM budget.
    _FROZEN_SLAM = {"max_keyframes", "max_edges", "local_map_capacity"}

    def reconfigure(self, tracker_fields: dict,
                    slam_fields: Optional[dict] = None) -> dict:
        """Live-retune tracker AND SLAM knobs (reference dynamic_reconfigure:
        CameraDenseTracker.cfg + dvo_slam/cfg/*.cfg): rebuilds the frozen
        configs, which recompile on the next frame — the same semantics as
        the reference rebuilding its trackers on a reconfigure callback.
        Pyramid geometry and padded capacities cannot change mid-run
        (stored keyframe pyramids / the live graph were built with them)."""
        import dataclasses

        slam_fields = slam_fields or {}
        frozen = {"num_levels", "first_level", "last_level"}
        bad = frozen & set(tracker_fields)
        if bad:
            return {"error": f"cannot change {sorted(bad)} mid-run"}
        if self.mode == "odometry" and slam_fields:
            return {"error": "odometry mode has no slam config"}
        bad = self._FROZEN_SLAM & set(slam_fields)
        if bad:
            return {"error": f"cannot change {sorted(bad)} mid-run"}
        # Build EVERY replacement config before assigning any: a validation
        # error in a derived config (e.g. slam coarse levels that violate
        # TrackerConfig invariants) must leave the live engine untouched —
        # an error reply and a silently-retuned engine must never coexist.
        try:
            if self.mode == "odometry":
                new = dataclasses.replace(self.engine.cfg, **tracker_fields)
                self.engine.cfg = new
                return {"tracker": dataclasses.asdict(new)}
            new = dataclasses.replace(self.engine.tracker_cfg,
                                      **tracker_fields)
            new_slam = dataclasses.replace(self.engine.slam_cfg,
                                           **slam_fields)
            new_coarse = dataclasses.replace(
                self.engine.coarse_cfg,
                **{k: v for k, v in tracker_fields.items()
                   if k != "max_iterations"},
            )
            if slam_fields:
                # The coarse validation tracker derives from slam fields.
                new_coarse = dataclasses.replace(
                    new_coarse,
                    first_level=min(new_slam.coarse_first_level,
                                    new.num_levels - 1),
                    last_level=min(new_slam.coarse_last_level,
                                   new.num_levels - 1),
                    max_iterations=new_slam.coarse_max_iterations,
                )
        except (TypeError, ValueError) as e:
            return {"error": str(e)}
        self.engine.tracker_cfg = new
        self.engine.fine_cfg = new
        self.engine.coarse_cfg = new_coarse
        self.engine.slam_cfg = new_slam
        return {"tracker": dataclasses.asdict(new),
                "slam": dataclasses.asdict(new_slam)}

    def handle_cmd(self, cmd: str) -> Optional[dict]:
        if cmd == "force_keyframe":
            # No-reply commands must never produce a reply, or the framed
            # protocol desynchronizes: in odometry mode (no keyframes)
            # this is a silent no-op, not an error message.
            if self.mode != "odometry":
                self.engine.force_keyframe()
            return None
        if cmd == "reset":
            if self.mode != "odometry":
                self.engine.reset()
            return None
        if cmd in ("finish", "trajectory"):
            if self.mode == "odometry":
                traj = self.engine.trajectory
            elif cmd == "finish":
                traj = self.engine.finish()
            else:
                traj = self.engine.trajectory()
            if cmd == "finish" and self.visualizer is not None:
                with self._viz_lock:
                    self.visualizer.finish()
            return {
                "trajectory": [
                    {"t": t, "pose": np.asarray(T).reshape(-1).tolist()}
                    for t, T in traj
                ]
            }
        return {"error": f"unknown/invalid command {cmd!r}"}


def serve_connection(sock: socket.socket, node: SlamNode,
                     broadcast: Optional[Broadcast] = None,
                     first_header: Optional[dict] = None,
                     rfile=None) -> None:
    """Run one camera session over an accepted socket until finish/EOF.

    rfile: optional buffered reader already wrapping `sock` (headers and
    payloads then cost one syscall each instead of byte-wise recv on the
    per-frame hot path)."""
    owns_rfile = rfile is None
    if owns_rfile:
        rfile = sock.makefile("rb")
    try:
        while True:
            if first_header is not None:
                header, first_header = first_header, None
            else:
                line = rfile.readline()
                if not line:
                    return
                header = json.loads(line)
            if "cmd" in header:
                if header["cmd"] == "configure":
                    reply = node.reconfigure(header.get("tracker", {}),
                                             header.get("slam"))
                else:
                    reply = node.handle_cmd(header["cmd"])
                if reply is not None:
                    sock.sendall((json.dumps(reply) + "\n").encode())
                if header["cmd"] == "finish":
                    return
                continue
            w, h = int(header["w"]), int(header["h"])
            # Validate BEFORE reading the payload: a negative product
            # makes BufferedReader.read(-N) consume the stream to EOF
            # (silent desync), and a huge one is an unbounded allocation.
            if not (0 < w <= 16384 and 0 < h <= 16384):
                raise ConnectionError(f"implausible frame dims {w}x{h}")
            intensity = np.frombuffer(
                _read_exact(rfile, w * h * 4), "<f4"
            ).reshape(h, w)
            depth = np.frombuffer(
                _read_exact(rfile, w * h * 4), "<f4"
            ).reshape(h, w)
            msg = node.handle_frame(float(header["t"]), intensity, depth)
            sock.sendall((json.dumps(msg) + "\n").encode())
            if broadcast is not None:
                broadcast.publish(msg)
    finally:
        if owns_rfile:
            rfile.close()


def serve(address, K, tracker_cfg=None, slam_cfg=None, mode="slam",
          with_covariance=False, unix=False, max_sessions=None,
          visualizer=None, publish_clouds=False):
    """Accept camera sessions + subscribers (one SlamNode per camera).

    address: (host, port) for TCP or a filesystem path for unix=True.
    max_sessions: stop after N completed CAMERA sessions (tests / bounded
      runs); subscriber connections don't count.
    visualizer: optional TrajectoryVisualizerInterface driven in-process
      per frame (the reference node's own rviz publishing); remote viewers
      use subscribe/`view()` instead.
    publish_clouds: attach a downsampled world-frame keyframe point cloud
      to each keyframe's pose message (remote viewers render the live map
      — the reference's PCL point-cloud topic equivalent).
    """
    broadcast = Broadcast()
    done = threading.Semaphore(0)
    viz_lock = threading.Lock()  # the visualizer is shared across sessions

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            rfile = self.request.makefile("rb")
            try:
                line = rfile.readline()
                if not line:
                    return
                header = json.loads(line)
                if header.get("cmd") == "subscribe":
                    broadcast.add(self.request)
                    # Hold the connection open until the subscriber leaves
                    # (subscribers never send after subscribing). The
                    # broadcast send-timeout applies to this recv too —
                    # an idle-but-healthy subscriber just keeps waiting.
                    try:
                        while True:
                            try:
                                if not self.request.recv(1):
                                    break
                            except TimeoutError:
                                continue
                    except OSError:
                        pass
                    return
                node = SlamNode(K, tracker_cfg, slam_cfg, mode,
                                with_covariance, visualizer=visualizer,
                                visualizer_lock=viz_lock,
                                publish_clouds=publish_clouds)
                try:
                    serve_connection(self.request, node, broadcast,
                                     first_header=header, rfile=rfile)
                finally:
                    done.release()
            finally:
                rfile.close()

    base = (socketserver.UnixStreamServer if unix
            else socketserver.TCPServer)

    class Server(socketserver.ThreadingMixIn, base):
        daemon_threads = True
        allow_reuse_address = True

    if unix:
        # allow_reuse_address is a no-op for AF_UNIX: a socket file left
        # behind by an unclean exit would fail the bind forever.
        import os

        try:
            os.unlink(address)
        except FileNotFoundError:
            pass

    with Server(address, Handler) as server:
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            if max_sessions is None:
                thread.join()
            else:
                for _ in range(max_sessions):
                    done.acquire()
        finally:
            server.shutdown()
            broadcast.close_all()


class StreamClient:
    """Minimal client for the node protocol (tests and tooling)."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self._rfile = sock.makefile("rb")

    @classmethod
    def connect_tcp(cls, host, port):
        return cls(socket.create_connection((host, port)))

    @classmethod
    def connect_unix(cls, path):
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.connect(path)
        return cls(s)

    def send_frame(self, t, intensity, depth) -> dict:
        h, w = intensity.shape
        header = json.dumps({"t": float(t), "w": w, "h": h}) + "\n"
        self.sock.sendall(header.encode())
        self.sock.sendall(np.ascontiguousarray(intensity, "<f4").tobytes())
        self.sock.sendall(np.ascontiguousarray(depth, "<f4").tobytes())
        return json.loads(self._rfile.readline())

    def command(self, cmd: str, expect_reply: bool) -> Optional[dict]:
        self.sock.sendall((json.dumps({"cmd": cmd}) + "\n").encode())
        if expect_reply:
            return json.loads(self._rfile.readline())
        return None

    def configure(self, slam: Optional[dict] = None,
                  **tracker_fields) -> dict:
        body = {"cmd": "configure", "tracker": tracker_fields}
        if slam:
            body["slam"] = slam
        self.sock.sendall((json.dumps(body) + "\n").encode())
        return json.loads(self._rfile.readline())

    def subscribe(self):
        """Turn this connection into a pose subscriber; yields per-frame
        pose messages until the server closes the feed."""
        self.sock.sendall(b'{"cmd": "subscribe"}\n')
        while True:
            try:
                line = self._rfile.readline()
            except OSError:
                return
            if not line:
                return
            yield json.loads(line)

    def finish(self) -> dict:
        return self.command("finish", expect_reply=True)

    def close(self):
        try:
            self._rfile.close()
        finally:
            self.sock.close()


def view(address, visualizer, unix=False, max_poses=None) -> int:
    """Remote live trajectory viewer (the rviz stand-in): subscribe to a
    running node and drive a visualizer from its pose feed. Returns the
    number of poses consumed (feed closed or max_poses reached)."""
    client = (StreamClient.connect_unix(address) if unix
              else StreamClient.connect_tcp(*address))
    seen = 0
    try:
        for msg in client.subscribe():
            visualizer.add_pose(
                float(msg["t"]),
                np.asarray(msg["pose"], np.float64).reshape(4, 4),
                bool(msg.get("keyframe", False)),
            )
            if "cloud" in msg:
                visualizer.add_point_cloud(
                    np.asarray(msg["cloud"]["points"], np.float64),
                    np.asarray(msg["cloud"]["colors"], np.float64),
                )
            seen += 1
            if max_poses is not None and seen >= max_poses:
                break
    finally:
        client.close()
        visualizer.finish()
    return seen
