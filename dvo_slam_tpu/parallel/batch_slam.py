"""Batch odometry over many sequences — data-parallel scale-out.

The reference is a one-robot real-time system; batch processing fleets of
recorded sequences is this framework's scale-out capability (SURVEY.md
§2.5 P4 "new capability, not parity"): each device (or the single device's
vmap batch) runs the device-resident sequence scan (models/odometry.py)
over its shard of sequences — embarrassingly parallel over ICI, no
collectives needed for odometry; combine with parallel/sharded.py's
pixel sharding when individual frames are large.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models import odometry


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_sequences_batched(intensities, depths, K, cfg: TrackerConfig):
    """vmap of the device-resident sequence scan over a sequence batch.

    intensities/depths: (B, T, H, W); returns dict of (B, T-1, ...) arrays.
    """
    return jax.vmap(lambda i, d: odometry.track_sequence(i, d, K, cfg))(
        intensities, depths
    )


def track_sequences_sharded(mesh: Mesh, intensities, depths, K,
                            cfg: TrackerConfig, axis: str = "batch"):
    """Shard the sequence batch over a mesh axis and run the batched scan.

    B must be divisible by the mesh axis size. Sequences never communicate:
    the sharding constraint is all XLA needs to partition the whole scan.
    """
    sharding = NamedSharding(mesh, P(axis))
    intensities = jax.device_put(intensities, sharding)
    depths = jax.device_put(depths, sharding)
    return track_sequences_batched(intensities, depths, K, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "slam_cfg"))
def keyframe_sequences_batched(intensities, depths, K, cfg: TrackerConfig,
                               slam_cfg=None, force_keyframe=None):
    """vmap of the device-resident KEYFRAME front-end scan
    (models/keyframe_scan.track_keyframe_sequence: dual alignment +
    entropy-ratio switching + measurement fusion) over a sequence batch.

    intensities/depths: (B, T, H, W); force_keyframe: optional (B, T) bool.
    Returns dict of (B, T-1, ...) arrays — per-sequence keyframe-relative
    poses, switch flags and switch measurements, ready for per-sequence
    host backends (compose_keyframe_trajectory / KeyframeSlam graphs).
    """
    from dvo_slam_tpu.config import SlamConfig
    from dvo_slam_tpu.models import keyframe_scan

    slam_cfg = slam_cfg or SlamConfig()
    if force_keyframe is None:
        force_keyframe = jnp.zeros(intensities.shape[:2], bool)
    return jax.vmap(
        lambda i, d, f: keyframe_scan.track_keyframe_sequence(
            i, d, K, cfg, slam_cfg, force_keyframe=f
        )
    )(intensities, depths, force_keyframe)


def keyframe_sequences_sharded(mesh: Mesh, intensities, depths, K,
                               cfg: TrackerConfig, slam_cfg=None,
                               force_keyframe=None, axis: str = "batch"):
    """Keyframe-odometry fleet over the mesh: each device runs the full
    SLAM front-end scan for its shard of sequences (multi-robot / dataset-
    fleet serving; the scale-out form of SURVEY.md §3.3)."""
    sharding = NamedSharding(mesh, P(axis))
    intensities = jax.device_put(intensities, sharding)
    depths = jax.device_put(depths, sharding)
    if force_keyframe is not None:
        force_keyframe = jax.device_put(force_keyframe, sharding)
    return keyframe_sequences_batched(intensities, depths, K, cfg,
                                      slam_cfg, force_keyframe)
