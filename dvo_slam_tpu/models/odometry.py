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

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models import dense_tracker
from dvo_slam_tpu.ops import camera, pyramid


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
        out = (res.transformation, res.entropy, res.valid_ratio,
               res.iterations, res.is_nan())
        return (cur_pyr, res.transformation), out

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
