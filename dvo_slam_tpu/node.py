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
      {"cmd": "configure", "tracker": {<TrackerConfig fields>}}\n
          (the dynamic_reconfigure equivalent: live-retune tracker knobs;
           pyramid geometry fields are rejected mid-run — replies with the
           resulting config or an error)
  server -> client, per frame (the PoseWithCovarianceStamped equivalent;
  also THE feed a live visualizer consumes — the rviz stand-in):
      {"t": ..., "pose": [16 floats, row-major T_world_cam],
       "keyframe": bool, "covariance": [36 floats]?}\n
  server -> client, on finish/trajectory:
      {"trajectory": [{"t": ..., "pose": [...]}, ...]}\n

Everything device-side is the standard pipeline (KeyframeSlam /
OdometryTracker); this file is transport only.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading
from typing import Optional

import numpy as np


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-message")
        buf.extend(chunk)
    return bytes(buf)


def _recv_line(sock: socket.socket) -> bytes:
    buf = bytearray()
    while True:
        b = sock.recv(1)
        if not b:
            if buf:
                raise ConnectionError("peer closed mid-line")
            return b""
        if b == b"\n":
            return bytes(buf)
        buf.extend(b)


class SlamNode:
    """Session state for one connected camera stream."""

    def __init__(self, K, tracker_cfg=None, slam_cfg=None, mode="slam",
                 with_covariance=False, frame_logger=None):
        from dvo_slam_tpu.config import SlamConfig, TrackerConfig

        tracker_cfg = tracker_cfg or TrackerConfig()
        slam_cfg = slam_cfg or SlamConfig()
        self.mode = mode
        self.with_covariance = with_covariance
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
        if self.mode == "odometry" and self.with_covariance \
                and self.engine.covariances:
            msg["covariance"] = (
                self.engine.covariances[-1][1].reshape(-1).tolist()
            )
        return msg

    def reconfigure(self, tracker_fields: dict) -> dict:
        """Live-retune tracker knobs (reference dynamic_reconfigure /
        CameraDenseTracker.cfg): rebuilds the static TrackerConfig, which
        recompiles on the next frame — the same semantics as the
        reference rebuilding its trackers on a reconfigure callback.
        Pyramid geometry cannot change mid-run (stored keyframe pyramids
        were built with it)."""
        import dataclasses

        frozen = {"num_levels", "first_level", "last_level"}
        bad = frozen & set(tracker_fields)
        if bad:
            return {"error": f"cannot change {sorted(bad)} mid-run"}
        try:
            if self.mode == "odometry":
                new = dataclasses.replace(self.engine.cfg, **tracker_fields)
                self.engine.cfg = new
            else:
                new = dataclasses.replace(self.engine.tracker_cfg,
                                          **tracker_fields)
                self.engine.tracker_cfg = new
                self.engine.fine_cfg = new
                self.engine.coarse_cfg = dataclasses.replace(
                    self.engine.coarse_cfg,
                    **{k: v for k, v in tracker_fields.items()
                       if k != "max_iterations"},
                )
        except (TypeError, ValueError) as e:
            return {"error": str(e)}
        return {"tracker": dataclasses.asdict(new)}

    def handle_cmd(self, cmd: str) -> Optional[dict]:
        if cmd == "force_keyframe" and self.mode != "odometry":
            self.engine.force_keyframe()
            return None
        if cmd == "reset" and self.mode != "odometry":
            self.engine.reset()
            return None
        if cmd in ("finish", "trajectory"):
            if self.mode == "odometry":
                traj = self.engine.trajectory
            elif cmd == "finish":
                traj = self.engine.finish()
            else:
                traj = self.engine.trajectory()
            return {
                "trajectory": [
                    {"t": t, "pose": np.asarray(T).reshape(-1).tolist()}
                    for t, T in traj
                ]
            }
        return {"error": f"unknown/invalid command {cmd!r}"}


def serve_connection(sock: socket.socket, node: SlamNode) -> None:
    """Run one camera session over an accepted socket until finish/EOF."""
    while True:
        line = _recv_line(sock)
        if not line:
            return
        header = json.loads(line)
        if "cmd" in header:
            if header["cmd"] == "configure":
                reply = node.reconfigure(header.get("tracker", {}))
            else:
                reply = node.handle_cmd(header["cmd"])
            if reply is not None:
                sock.sendall((json.dumps(reply) + "\n").encode())
            if header["cmd"] == "finish":
                return
            continue
        w, h = int(header["w"]), int(header["h"])
        intensity = np.frombuffer(
            _recv_exact(sock, w * h * 4), "<f4"
        ).reshape(h, w)
        depth = np.frombuffer(
            _recv_exact(sock, w * h * 4), "<f4"
        ).reshape(h, w)
        msg = node.handle_frame(float(header["t"]), intensity, depth)
        sock.sendall((json.dumps(msg) + "\n").encode())


def serve(address, K, tracker_cfg=None, slam_cfg=None, mode="slam",
          with_covariance=False, unix=False, max_sessions=None):
    """Accept camera sessions forever (one SlamNode per connection).

    address: (host, port) for TCP or a filesystem path for unix=True.
    max_sessions: stop after N sessions (tests / bounded runs).
    """
    served = 0

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            node = SlamNode(K, tracker_cfg, slam_cfg, mode, with_covariance)
            serve_connection(self.request, node)

    cls = (socketserver.UnixStreamServer if unix
           else socketserver.TCPServer)
    cls.allow_reuse_address = True
    with cls(address, Handler) as server:
        while max_sessions is None or served < max_sessions:
            server.handle_request()
            served += 1


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

    def configure(self, **tracker_fields) -> dict:
        msg = json.dumps({"cmd": "configure", "tracker": tracker_fields})
        self.sock.sendall((msg + "\n").encode())
        return json.loads(self._rfile.readline())

    def finish(self) -> dict:
        return self.command("finish", expect_reply=True)

    def close(self):
        try:
            self._rfile.close()
        finally:
            self.sock.close()
