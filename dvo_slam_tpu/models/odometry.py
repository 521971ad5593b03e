"""Device-resident sequence odometry: a whole video in one dispatch.

The reference processes frames one host call at a time (SURVEY.md §3.5,
camera_tracker node). On TPU the frame loop itself can live on device:
`lax.scan` carries the previous frame's pyramid, so tracking T frames is
ONE jitted call with zero host round-trips — the shape for offline batch
processing / large-scale replay where host dispatch would otherwise bound
throughput. (Keyframe SLAM needs per-frame host decisions and keyframe
storage, so it keeps the one-dispatch-per-frame structure in
keyframe_tracker.py; this module is the frame-to-frame odometry
equivalent.)

Memory: the full sequence lives in HBM ((T, H, W) intensity + depth f32 =
2.4 MB/frame at 640x480 — hundreds of frames per chip); for longer runs,
chunk and chain the carry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models import dense_tracker
from dvo_slam_tpu.ops import camera, pyramid
from dvo_slam_tpu.utils import se3_np


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_sequence(intensities, depths, K, cfg: TrackerConfig):
    """Frame-to-frame odometry over a whole sequence in one jitted call.

    Args:
      intensities: (T, H, W) float grayscale 0..255.
      depths: (T, H, W) metric depth, NaN invalid.
      K: (4,) intrinsics.
      cfg: static TrackerConfig.

    Returns dict with per-transition arrays (T-1 leading dim):
      rel_poses (T-1, 4, 4): frame k -> frame k+1 camera transforms
        (p_{k+1} = T p_k);
      entropy, valid_ratio, iterations — the tracker statistics stream.
    """
    Ks = camera.pyramid_intrinsics(K, cfg.num_levels)
    pyr0 = pyramid.build_pyramid(intensities[0], depths[0], cfg.num_levels)

    def step(carry, frame):
        prev_pyr, last_rel = carry
        intensity, depth = frame
        cur_pyr = pyramid.build_pyramid(intensity, depth, cfg.num_levels)
        # Constant-velocity warm start (reference Config::UseInitialEstimate:
        # seed with the previous increment) — typically halves iterations.
        T0 = last_rel if cfg.use_initial_estimate else jnp.eye(4)
        res = dense_tracker.track(prev_pyr, cur_pyr, Ks, T0, cfg)
        # NaN guard, same as OdometryTracker.update: on tracking failure
        # fall back to the constant-velocity increment for both the output
        # chain and the next frame's warm start — otherwise one bad frame
        # would poison every subsequent T0 through the carry (is_nan still
        # reports the failure in the stats stream).
        rel = jnp.where(res.is_nan(), last_rel, res.transformation)
        out = (rel, res.entropy, res.valid_ratio,
               res.iterations, res.is_nan())
        return (cur_pyr, rel), out

    _, (rels, entropy, valid_ratio, iterations, nan) = jax.lax.scan(
        step, (pyr0, jnp.eye(4)), (intensities[1:], depths[1:])
    )
    return {
        "rel_poses": rels,
        "entropy": entropy,
        "valid_ratio": valid_ratio,
        "iterations": iterations,
        "is_nan": nan,
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def _odometry_step(intensity, depth, prev_pyr, T0, Ks, cfg: TrackerConfig):
    """One fused odometry frame: pyramid build + frame-to-frame track."""
    cur = pyramid.build_pyramid(intensity, depth, cfg.num_levels)
    res = dense_tracker.track(prev_pyr, cur, Ks, T0, cfg)
    return cur, res


class OdometryTracker:
    """Host-driven frame-to-frame visual odometry — the reference's
    camera_tracker node (dvo_ros/src/camera_dense_tracking.cpp, SURVEY.md
    §3.5 / R2): no keyframes, no pose graph; every frame aligns against
    the previous frame, the world pose is chained on host in f64, and the
    per-frame 6x6 covariance (Information^{-1} — what the reference
    publishes as PoseWithCovarianceStamped) is exposed.

    For offline throughput over a pre-loaded sequence prefer
    track_sequence (the whole loop in one device dispatch); this class is
    the streaming form with per-frame host access to poses/covariances.
    """

    def __init__(self, K, cfg: TrackerConfig = TrackerConfig(),
                 collect_covariance: bool = False):
        self.cfg = cfg
        self.K = camera.intrinsics(*K) if not hasattr(K, "shape") else jnp.asarray(K)
        self.Ks = camera.pyramid_intrinsics(self.K, cfg.num_levels)
        self.collect_covariance = collect_covariance
        self.trajectory = []  # (timestamp, T_w_frame f64)
        self.covariances = []  # (timestamp, (6,6) f64) when collected
        self._prev_pyr = None
        self._T_w = np.eye(4)
        self._last_rel = np.eye(4)

    def init(self, T0=None):
        self._T_w = np.eye(4) if T0 is None else np.asarray(T0, np.float64)

    def update(self, intensity, depth, timestamp: float) -> np.ndarray:
        """Track one frame; returns the current world pose (4, 4) f64.

        Raw sensor dtypes (uint8 intensity / uint16 depth ticks / uint8
        12-bit-packed depth) pass through; build_pyramid converts on
        device so streaming uploads stay raw (2.5-3 B/px, not 8)."""
        raw_i = getattr(intensity, "dtype", None) == np.uint8
        raw_z = getattr(depth, "dtype", None) in (np.uint16, np.uint8)
        intensity = jnp.asarray(intensity, None if raw_i else jnp.float32)
        depth = jnp.asarray(depth, None if raw_z else jnp.float32)
        if self._prev_pyr is None:
            self._prev_pyr = pyramid.build_pyramid(
                intensity, depth, self.cfg.num_levels
            )
            self.trajectory.append((timestamp, self._T_w.copy()))
            if self.collect_covariance:
                self.covariances.append((timestamp, np.zeros((6, 6))))
            return self._T_w.copy()

        T0 = (jnp.asarray(self._last_rel, jnp.float32)
              if self.cfg.use_initial_estimate else jnp.eye(4))
        cur, res = _odometry_step(
            intensity, depth, self._prev_pyr, T0, self.Ks, self.cfg
        )
        fetch = (res.transformation, res.is_nan())
        if self.collect_covariance:
            fetch = fetch + (res.information,)
        host = jax.device_get(fetch)
        rel = np.asarray(host[0], np.float64)
        if bool(host[1]):
            # NaN guard (reference keeps publishing on tracking failure):
            # fall back to the constant-velocity increment.
            rel = self._last_rel.copy()
        else:
            self._last_rel = rel
        self._T_w = self._T_w @ se3_np.inverse(rel)
        self._prev_pyr = cur
        self.trajectory.append((timestamp, self._T_w.copy()))
        if self.collect_covariance:
            info = np.asarray(host[2], np.float64) if not bool(host[1]) else None
            cov = np.full((6, 6), np.nan)
            if info is not None and np.isfinite(info).all():
                try:
                    cov = np.linalg.inv(info)
                except np.linalg.LinAlgError:
                    pass
            self.covariances.append((timestamp, cov))
        return self._T_w.copy()


def compose_trajectory(rel_poses, T0=None):
    """Host-side f64 pose chain from the scan's relative poses.

    rel_poses[k]: frame k -> frame k+1; returns T (len+1) world poses
    T_w_frame with T_w_0 = T0 (identity default).
    """
    import numpy as np

    from dvo_slam_tpu.utils import se3_np

    rels = np.asarray(rel_poses, np.float64)
    T_w = np.eye(4) if T0 is None else np.asarray(T0, np.float64)
    out = [T_w.copy()]
    for k in range(len(rels)):
        T_w = T_w @ se3_np.inverse(rels[k])
        out.append(T_w.copy())
    return out
