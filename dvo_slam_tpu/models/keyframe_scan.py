"""Device-resident keyframe odometry: the SLAM front-end in one dispatch.

The reference's KeyframeTracker front-end (dual alignment + entropy-ratio
keyframe selection + measurement fusion; dvo_slam/src/local_tracker.cpp +
tracking_result_evaluation.cpp, SURVEY.md §3.3) needs a per-frame host
decision in the host-driven orchestrator (models/keyframe_tracker.py).
This module moves the WHOLE front-end loop into a single `lax.scan`: the
keyframe-switch decision, the active-keyframe pyramid swap, the
constant-velocity warm start and the information fusion all happen on
device, so tracking a T-frame sequence with real keyframe semantics is ONE
jitted call with zero host round trips — keyframe-mode SLAM at
frame-to-frame odometry throughput (on remoted devices the host loop costs
~90 ms/frame in round trips alone; here it costs nothing).

The backend (loop closure + global graph) remains host logic: the scan
emits exactly what the backend consumes — per-switch relative measurements
with information matrices, per-frame keyframe-relative poses, and the
entropy stream — so a host post-pass (`compose_keyframe_trajectory`) or
the full KeyframeSlam graph machinery can run on the outputs.

Memory: the sequence lives in HBM ((T,H,W)x2 f32 ≈ 2.4 MB/frame at
640x480); chunk-and-chain the carry for longer runs (the carry is
self-contained).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from dvo_slam_tpu.config import SlamConfig, TrackerConfig
from dvo_slam_tpu.models import dense_tracker
from dvo_slam_tpu.ops import camera, pyramid, se3

# ONE constant for both engines: a drift here would silently desynchronize
# the per-frame and scan engines' keyframe cadence.
_ENTROPY_FLOOR = dense_tracker._ENTROPY_DENOM_FLOOR


@dataclasses.dataclass(frozen=True)
class ScanConfig:
    """The SlamConfig subset the scan actually traces — used as the jit
    static key so host-side-only SlamConfig fields (loop-closure radii,
    voter thresholds, ...) don't fragment the compile cache: two SlamConfigs
    differing only in host fields share one compiled scan (the benchmark
    warmup relies on this)."""

    min_constraint_ratio: float
    min_entropy_ratio: float
    fuse_odometry: bool
    with_stats: bool  # emit per-iteration TrackStats as scan outputs

    @classmethod
    def from_slam(cls, s: SlamConfig, with_stats: bool = False):
        return cls(s.min_constraint_ratio, s.min_entropy_ratio,
                   s.fuse_odometry, with_stats)


def _entropy_ratio_jnp(h_cur, h_ref, has_ref):
    """Sign-safe entropy ratio (dense_tracker.entropy_ratio), traced form.
    No reference yet -> 1.0 even for non-finite h_cur (the host
    orchestrator keeps tracking until a finite first entropy establishes
    history; only WITH history does non-finite entropy force a switch)."""
    ref = jnp.where(has_ref, h_ref, h_cur)
    ratio = 1.0 - (h_cur - ref) / jnp.maximum(jnp.abs(ref), _ENTROPY_FLOOR)
    ok = jnp.isfinite(h_cur) & jnp.isfinite(ref)
    return jnp.where(has_ref, jnp.where(ok, ratio, -jnp.inf), 1.0)


def _fuse_relative_poses_jnp(T_a, info_a, T_b, info_b):
    """Information-weighted SE(3) fusion (keyframe_tracker.fuse_relative_poses,
    traced f32 form): one Gauss-Newton step from T_a."""
    xi = se3.log(T_b @ se3.inverse(T_a))
    L = info_a + info_b
    delta = jnp.linalg.solve(L, info_b @ xi)
    good = jnp.isfinite(delta).all()
    delta = jnp.where(good, delta, jnp.zeros_like(delta))
    return se3.exp(delta) @ T_a


def init_carry(pyr0):
    """Scan carry anchored at a fresh keyframe pyramid (frame 0 / the frame
    that just switched). The carry is self-contained: chunked runs chain it
    across dispatches (ChunkedKeyframeSlam, models/chunked_slam.py)."""
    eye = jnp.eye(4, dtype=jnp.float32)
    return {
        "kf": pyr0,
        "prev": pyr0,
        "T_kf_prev": eye,
        "last_odo": eye,
        "H_first": jnp.float32(0.0),
        "has_first": jnp.asarray(False),
    }


def _make_step(Ks, cfg: TrackerConfig, scan_cfg: ScanConfig):
    """The per-frame scan body (shared by whole-sequence and chunked runs)."""
    eye = jnp.eye(4, dtype=jnp.float32)

    def step(carry, inputs):
        intensity, depth, force = inputs
        cur = pyramid.build_pyramid(intensity, depth, cfg.num_levels)
        refs = tuple(
            jnp.stack([kf_l, prev_l])
            for kf_l, prev_l in zip(carry["kf"], carry["prev"])
        )
        odo_init = carry["last_odo"] if cfg.use_initial_estimate else eye
        inits = jnp.stack([carry["T_kf_prev"], odo_init])
        # Escalates to the gather backend when the pallas window masked
        # too many points (cfg.pallas_miss_escalate; the cond sits outside
        # the batch vmap so the fast path pays nothing at runtime).
        res = dense_tracker.track_batched_escalating(refs, cur, Ks, inits, cfg)

        r_kf_T = res.transformation[0]
        r_odo_T = res.transformation[1]
        kf_nan = res.is_nan()[0]
        odo_nan = res.is_nan()[1]
        last_odo = jnp.where(odo_nan, carry["last_odo"], r_odo_T)

        accept = (~kf_nan) & (
            res.valid_ratio[0] >= scan_cfg.min_constraint_ratio
        )
        h = res.entropy[0]
        ratio = jnp.where(
            accept,
            _entropy_ratio_jnp(h, carry["H_first"], carry["has_first"]),
            1.0,
        )
        switch = force | (~accept) | (ratio < scan_cfg.min_entropy_ratio)

        # Non-switch pose: keyframe measurement fused with chained odometry
        # (LocalMap keyframe+odometry measurements, closed form).
        T_alt = r_odo_T @ carry["T_kf_prev"]
        if scan_cfg.fuse_odometry:
            fused = _fuse_relative_poses_jnp(
                r_kf_T, res.information[0], T_alt, res.information[1]
            )
            T_kf_cur = jnp.where(odo_nan, r_kf_T, fused)
        else:
            T_kf_cur = r_kf_T

        # Switch measurement old-kf -> new-kf (KeyframeSlam switch branch).
        Z_new = jnp.where(
            accept, r_kf_T, jnp.where(odo_nan, carry["T_kf_prev"], T_alt)
        )
        info_new = jnp.where(
            accept,
            res.information[0],
            jnp.where(odo_nan, 1e2 * jnp.eye(6), res.information[1]),
        )

        # First-frame entropy of the active keyframe (ratioWithFirst).
        set_first = accept & (~carry["has_first"]) & jnp.isfinite(h)
        H_first = jnp.where(set_first, h, carry["H_first"])
        has_first = carry["has_first"] | set_first
        # After a switch the new keyframe starts with no history.
        H_first = jnp.where(switch, jnp.float32(0.0), H_first)
        has_first = jnp.where(switch, False, has_first)

        new_carry = {
            "kf": tuple(
                jnp.where(switch, c, k) for c, k in zip(cur, carry["kf"])
            ),
            "prev": cur,
            "T_kf_prev": jnp.where(switch, eye, T_kf_cur),
            "last_odo": last_odo,
            "H_first": H_first,
            "has_first": has_first,
        }
        out = {
            "rel_pose": jnp.where(switch, eye, T_kf_cur),
            "switch": switch,
            "Z_switch": Z_new,
            "info_switch": info_new,
            "entropy": h,
            "entropy_ratio": ratio,
            "valid_ratio": res.valid_ratio[0],
            "accept": accept,
            "iterations": res.iterations,
            "is_nan": jnp.stack([kf_nan, odo_nan]),
            # Pallas-window observability (0 / False on gather).
            "window_miss_frac": res.window_miss_frac.max(),
            "escalated": res.escalated.any(),
            # Raw (pre-fusion) dual measurements + informations: the
            # chunked walk replays the windowed LocalMap solve from these
            # (keyframe->frame and prev->frame edges, keyframe_tracker
            # switch branch).
            "T_kf_meas": r_kf_T,
            "T_odo_meas": r_odo_T,
            "info_pair": res.information,
        }
        if cfg.collect_stats and scan_cfg.with_stats:
            # Per-iteration TrackStats for both alignments (batch 2:
            # keyframe, odometry) — reference IterationStats granularity,
            # consumed by ChunkedKeyframeSlam's frame logger. Emitted only
            # on request: as scan OUTPUTS they would otherwise be
            # materialized ((T, 2, L, I) per field) even with no consumer.
            out["stats"] = res.stats
        return new_carry, out

    return step


@functools.partial(jax.jit, static_argnames=("cfg", "scan_cfg"))
def _track_chunk_jit(carry, intensities, depths, K, cfg: TrackerConfig,
                     scan_cfg: ScanConfig, force_keyframe):
    Ks = camera.pyramid_intrinsics(K, cfg.num_levels)
    step = _make_step(Ks, cfg, scan_cfg)
    return jax.lax.scan(step, carry, (intensities, depths, force_keyframe))


def track_keyframe_chunk(carry, intensities, depths, K, cfg: TrackerConfig,
                         slam_cfg: SlamConfig = SlamConfig(),
                         force_keyframe=None, with_stats: bool = False):
    """Run the keyframe front-end over one CHUNK of frames, chaining the
    carry: (carry, (T, H, W) frames) -> (carry, per-frame outputs).

    The chunked form gives streaming SLAM one host round trip per chunk
    instead of per frame (ChunkedKeyframeSlam); semantics are identical to
    track_keyframe_sequence split at arbitrary boundaries. The jit key is
    the traced SlamConfig subset only (ScanConfig) — SlamConfigs differing
    in host-side fields share one compiled program."""
    if force_keyframe is None:
        force_keyframe = jnp.zeros(intensities.shape[0], bool)
    return _track_chunk_jit(
        carry, intensities, depths, K, cfg,
        ScanConfig.from_slam(slam_cfg, with_stats), force_keyframe,
    )


def track_keyframe_sequence(intensities, depths, K, cfg: TrackerConfig,
                            slam_cfg: SlamConfig = SlamConfig(),
                            force_keyframe=None, with_stats: bool = False):
    """Keyframe odometry over a whole sequence in one jitted call.

    Args:
      intensities / depths: (T, H, W) f32 sequence (depth NaN-invalid).
      K: (4,) intrinsics.
      cfg / slam_cfg: static configs (entropy threshold, constraint ratio
        and fusion toggle come from slam_cfg, as in KeyframeSlam).
      force_keyframe: optional (T,) bool — promote frame k to a keyframe
        (the forceKeyframe control input). Frame 0 is always the first
        keyframe.

    Returns dict of per-frame arrays (leading dim T-1, frames 1..T-1):
      rel_pose (4,4): frame-cam <- active-keyframe-cam AFTER this frame's
        decision (identity rows where switch=True: the frame IS the new
        keyframe);
      switch (bool): this frame became a new keyframe;
      Z_switch (4,4): old-kf -> new-kf measurement where switch (garbage
        elsewhere); info_switch (6,6): its information;
      entropy, entropy_ratio, valid_ratio, accept, iterations, is_nan —
      the tracking-quality stream (reference Stats + evaluation signals).
    """
    T_total = intensities.shape[0]
    if force_keyframe is None:
        force_keyframe = jnp.zeros(T_total, bool)
    pyr0 = pyramid_from_stack(intensities, depths, 0, cfg.num_levels)
    _, outs = track_keyframe_chunk(
        init_carry(pyr0), intensities[1:], depths[1:], K, cfg, slam_cfg,
        force_keyframe=force_keyframe[1:], with_stats=with_stats,
    )
    return outs


@functools.partial(jax.jit, static_argnames=("num_levels",))
def pyramid_from_stack(intensities, depths, k, num_levels):
    """Pyramid of frame k of a (T, H, W) stack in ONE dispatch: an eager
    slice + eager build is many separate command submissions (tens of ms
    over a remoted device). Used for frame 0 here and for keyframe-switch
    replay in the chunked engine."""
    return pyramid.build_pyramid(intensities[k], depths[k], num_levels)


def compose_keyframe_trajectory(outs, T0=None):
    """Host f64 composition of the scan outputs into world poses.

    Returns (poses, keyframe_indices): len(T) world poses (frame 0 at T0)
    and the frame indices that became keyframes (frame 0 included).
    """
    import numpy as np

    from dvo_slam_tpu.utils import se3_np

    switch = np.asarray(outs["switch"])
    rel = np.asarray(outs["rel_pose"], np.float64)
    Z = np.asarray(outs["Z_switch"], np.float64)
    T_w_kf = np.eye(4) if T0 is None else np.asarray(T0, np.float64)
    poses = [T_w_kf.copy()]
    kf_indices = [0]
    for k in range(len(switch)):
        if switch[k]:
            T_w_kf = T_w_kf @ se3_np.inverse(Z[k])
            kf_indices.append(k + 1)
            poses.append(T_w_kf.copy())
        else:
            poses.append(T_w_kf @ se3_np.inverse(rel[k]))
    return poses, kf_indices
