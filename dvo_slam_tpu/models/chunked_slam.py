"""Chunked streaming SLAM: device-resident front-end + host graph backend.

The reference KeyframeTracker makes one in-process call per frame
(dvo_slam/src/keyframe_tracker.cpp); the host-driven KeyframeSlam mirrors
that with ONE device dispatch + one result transfer per frame — already
minimal, but on remoted accelerators each frame still pays a full
host<->device round trip (~90 ms over the axon tunnel; docs/performance.md),
so full SLAM runs at ~11 fps there no matter how fast the chip is.

ChunkedKeyframeSlam removes that wall: frames are processed in CHUNKS
through the device-resident keyframe front-end (models/keyframe_scan.py —
dual alignment, entropy-ratio keyframe switching, measurement fusion inside
one `lax.scan`), so a chunk of N frames costs ONE dispatch + ONE transfer.
The backend (keyframe records, pose graph, loop-closure proposal +
two-stage validation, async device LM) is inherited unchanged from
KeyframeSlam; keyframe switches discovered inside a chunk are replayed on
the host walk of the chunk outputs: new-keyframe pyramids are rebuilt from
the raw frames (keyframes are rare — a dispatch per switch, not per frame),
odometry edges enter the graph, loop closures are searched and validated,
and the global solve is dispatched asynchronously exactly as in the
per-frame orchestrator.

Feature parity with KeyframeSlam: the windowed LocalMap solve runs on the
host walk (the scan emits the raw dual measurements + informations per
frame, so with `local_map_optimize=True` keyframe switches refine the
closing window exactly as the per-frame engine does), and per-iteration
TrackStats flow into the same frame-logger records. Per-frame poses inside
a window use the scan's f32 closed-form fusion (the per-frame engine fuses
in f64 on host) — sub-micron numeric deltas, not semantic ones.

Trajectory results are chunk-size invariant: splitting a sequence at any
boundaries yields the same poses (tests/test_chunked_slam.py).
"""

from __future__ import annotations

from collections import deque
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.config import SlamConfig, TrackerConfig
from dvo_slam_tpu.models import keyframe_scan, local_map
from dvo_slam_tpu.models.keyframe_tracker import (
    FrameRecord, KeyframeSlam, _cov_from_info, _stats_record,
)
from dvo_slam_tpu.utils import se3_np


class ChunkedKeyframeSlam(KeyframeSlam):
    """KeyframeSlam with a chunked device-resident front-end.

    Public surface: `update_chunk(intensities, depths, timestamps)` plus
    everything inherited (init / force_keyframe / reset / finish /
    trajectory). `update()` processes a 1-frame chunk — identical results,
    per-frame round-trip cost; use update_chunk for throughput.
    """

    def __init__(self, K, tracker_cfg: TrackerConfig = TrackerConfig(),
                 slam_cfg: SlamConfig = SlamConfig(),
                 enable_loop_closure: bool = True, frame_logger=None,
                 collect_covariance: bool = False):
        super().__init__(K, tracker_cfg, slam_cfg,
                         enable_loop_closure=enable_loop_closure,
                         frame_logger=frame_logger,
                         collect_covariance=collect_covariance)
        self._carry = None
        # Submitted-but-not-collected chunks (see submit_chunk).
        self._chunk_queue: deque = deque()

    def update(self, intensity, depth, timestamp: float) -> np.ndarray:
        return self.update_chunk(
            np.asarray(intensity)[None], np.asarray(depth)[None], [timestamp]
        )[-1]

    def update_chunk(self, intensities, depths,
                     timestamps: Sequence[float]) -> List[np.ndarray]:
        """Track a chunk of frames; returns one world pose (4,4) f64 per
        frame. intensities/depths: (N, H, W); timestamps: length N.

        Raw sensor dtypes pass straight through to the device (uint8
        intensity, uint16 raw depth — converted inside the scan by
        build_pyramid): streaming callers should upload raw chunks, which
        is 2.7x less transfer than the f32 pair.

        Equivalent to submit_chunk() + collect_chunk(): streaming callers
        that know the next chunk early should submit it BEFORE collecting
        the previous one — the scan carry is self-contained on device
        (keyframe switches happen inside the scan), so chunk k+1's
        compute starts immediately and the fetch round trip + host graph
        walk of chunk k hide underneath it."""
        # Outstanding pipelined submissions belong to EARLIER frames;
        # without this drain, collect_chunk() would return the oldest
        # queued chunk's poses misattributed to this call's frames. The
        # drained chunks' per-frame poses are NOT returned (they land in
        # frames/trajectory) — warn, since mixing update_chunk into a
        # submit/collect pipeline usually indicates a caller-side pairing
        # bug rather than intent.
        if self._chunk_queue:
            import warnings

            warnings.warn(
                f"update_chunk() called with {len(self._chunk_queue)} "
                "pipelined chunk(s) outstanding; draining them first "
                "(their per-frame poses are only available via "
                "trajectory()). Pair submit_chunk with collect_chunk "
                "when pipelining.",
                RuntimeWarning,
                stacklevel=2,
            )
        self._drain_chunks()
        self.submit_chunk(intensities, depths, timestamps)
        return self.collect_chunk()

    def submit_chunk(self, intensities, depths,
                     timestamps: Sequence[float]) -> None:
        """Dispatch a chunk's device-resident scan WITHOUT fetching.

        Any submit depth works (records queue up); depth 2 captures the
        pipelining win. force_keyframe() applies to the next SUBMITTED
        chunk. collect_chunk() pops results in submission order;
        finish/reset/trajectory/export/checkpoint drain the queue first.
        """
        raw_i = getattr(intensities, "dtype", None) == np.uint8
        # uint16 = raw ticks; uint8 = 12-bit packed ticks (pack_depth12,
        # 1.5 B/px on the wire) — both unpack on device in build_pyramid.
        raw_z = getattr(depths, "dtype", None) in (np.uint16, np.uint8)
        intensities = jnp.asarray(
            intensities, None if raw_i else jnp.float32
        )
        depths = jnp.asarray(depths, None if raw_z else jnp.float32)
        assert intensities.ndim == 3 and len(timestamps) == intensities.shape[0]
        init_poses: List[np.ndarray] = []
        start = 0

        if not self._initialized:
            if not hasattr(self, "_T0"):
                self.init()
            pyr0 = self._build_pyramid(intensities[0], depths[0])
            self._add_keyframe(pyr0, timestamps[0], self._T0, None, None)
            self.frames.append(
                FrameRecord(timestamps[0], self.keyframes[-1].idx, np.eye(4))
            )
            self._carry = keyframe_scan.init_carry(pyr0)
            # Fresh anchor keyframe ⇒ fresh measurement window (the
            # per-frame engine's init branch does the same) — without this
            # a reset() leaves pre-reset measurements in the window and the
            # next solve mixes edges across the reset discontinuity.
            self._local_map = local_map.LocalMap(
                self.slam_cfg.local_map_capacity
            )
            if self.collect_covariance:
                self.covariances.append((timestamps[0], np.zeros((6, 6))))
            self._initialized = True
            init_poses.append(self._T0.copy())
            start = 1

        n = intensities.shape[0] - start
        if n == 0:
            self._chunk_queue.append({"n": 0, "init_poses": init_poses})
            return

        force = np.zeros(n, bool)
        if self._force_next:
            force[0] = True
            self._force_next = False

        # ONE dispatch for the whole chunk; ONE device->host transfer for
        # everything the backend walk needs (at collect time).
        self._carry, outs = keyframe_scan.track_keyframe_chunk(
            self._carry, intensities[start:], depths[start:], self.K,
            self.tracker_cfg, self.slam_cfg,
            force_keyframe=jnp.asarray(force),
            with_stats=self.frame_logger is not None,
        )
        self._chunk_queue.append({
            "n": n, "start": start, "init_poses": init_poses,
            "outs": outs, "timestamps": list(timestamps),
            "intensities": intensities, "depths": depths,
            # The carry as of THIS chunk's scan: its "kf" pyramid is this
            # chunk's last-switch keyframe. self._carry may already belong
            # to a later submitted chunk by collect time.
            "carry_after": self._carry,
        })

    def collect_chunk(self) -> List[np.ndarray]:
        """Fetch + walk the oldest submitted chunk; returns its poses."""
        if not self._chunk_queue:
            raise RuntimeError(
                "collect_chunk() with no submitted chunk outstanding — "
                "every submit_chunk() pairs with exactly one "
                "collect_chunk(), and the read paths (finish / reset / "
                "trajectory / export_graph / checkpoint) drain the queue "
                "themselves."
            )
        chunk_rec = self._chunk_queue.popleft()
        out_poses: List[np.ndarray] = chunk_rec["init_poses"]
        n = chunk_rec["n"]
        if n == 0:
            return out_poses
        outs = chunk_rec["outs"]
        start = chunk_rec["start"]
        timestamps = chunk_rec["timestamps"]
        intensities = chunk_rec["intensities"]
        depths = chunk_rec["depths"]
        fetch = (outs["rel_pose"], outs["switch"], outs["Z_switch"],
                 outs["info_switch"], outs["entropy"], outs["entropy_ratio"],
                 outs["accept"], outs["valid_ratio"],
                 outs["window_miss_frac"], outs["escalated"])
        lm_on = self.slam_cfg.local_map_optimize
        lm_extra = ()
        if lm_on or self.collect_covariance:
            # Raw dual measurements for the windowed LocalMap replay and/or
            # the per-frame covariance stream — same transfer, no extra
            # round trip.
            lm_extra = (outs["T_kf_meas"], outs["T_odo_meas"],
                        outs["info_pair"], outs["is_nan"])
        fetch = fetch + lm_extra
        stats_extra = ()
        if self.frame_logger is not None and outs.get("stats") is not None:
            # Per-iteration stats ride the same transfer (reference
            # IterationStats granularity, as in the per-frame engine).
            stats_extra = (outs["iterations"], outs["stats"])
        fetch = fetch + stats_extra
        # Piggyback pending results on the SAME transfer (separate fetches
        # cost one full round trip each on remoted devices): the async
        # graph solve's poses and the previous switch's in-flight
        # loop-closure validation batches + window refinement.
        pend_val = self._pending_validation
        if pend_val is not None:
            fetch = fetch + (pend_val.handles,)
        pend_win = self._pending_window
        if pend_win is not None:
            fetch = fetch + (pend_win["handle"],)
        if self._poses_stale:
            host = jax.device_get(fetch + (self._pending_poses,))
            self._apply_poses(host[-1])
            host = host[:-1]
        else:
            host = jax.device_get(fetch)
        if pend_win is not None:
            self._collect_pending_window(host_poses=host[-1])
            host = host[:-1]
        if pend_val is not None:
            self._collect_pending_validation(host_results=host[-1])
            host = host[:-1]
        (rel, switch, Zs, infos, entropies, ratios, accepts,
         valid_ratios, wmiss_fracs, escalated) = host[:10]
        pos = 10
        kf_meas = odo_meas = info_pair = nan_pair = None
        if lm_extra:
            kf_meas, odo_meas, info_pair, nan_pair = host[pos:pos + 4]
            pos += 4
        iters_b = stats_b = None
        if stats_extra:
            iters_b, stats_b = host[pos], host[pos + 1]

        # The chunk's scan carry already holds the pyramid of its LAST
        # in-chunk switch keyframe (the scan swapped it in on device):
        # reuse it instead of re-decoding from the raw chunk — zero extra
        # dispatches per switch in the common one-switch-per-chunk case.
        # Earlier switches in the same chunk (rare) still rebuild. NOTE
        # chunk_rec["carry_after"], not self._carry: under submit/collect
        # pipelining the live carry may belong to a later chunk.
        switch_positions = np.flatnonzero(switch[:n])
        last_switch = int(switch_positions[-1]) if len(switch_positions) else -1

        for k in range(n):
            t = float(timestamps[start + k])
            kf = self.keyframes[-1]
            if self.frame_logger is not None:
                rec = dict(
                    t=t, frame=len(self.frames), keyframe=kf.idx,
                    entropy=float(entropies[k]),
                    entropy_ratio=float(ratios[k]),
                    valid_ratio=float(valid_ratios[k]),
                    accepted=bool(accepts[k]),
                    keyframe_switch=bool(switch[k]),
                    window_miss_frac=float(wmiss_fracs[k]),
                    escalated=bool(escalated[k]),
                )
                if stats_b is not None:
                    stats_k = jax.tree.map(lambda a: a[k], stats_b)
                    rec["kf_track"] = _stats_record(stats_k, iters_b[k], 0)
                    rec["odo_track"] = _stats_record(stats_k, iters_b[k], 1)
                self.frame_logger.log(**rec)
            # Entropy bookkeeping mirrors KeyframeSlam.update exactly:
            # entropy_first is recorded for any accepted frame BEFORE the
            # switch decision (the per-frame engine sets it even on the
            # frame that triggers the switch — the constraint voters'
            # entropy_avg falls back to it), sum/count only on non-switch.
            h = float(entropies[k])
            if bool(accepts[k]) and np.isfinite(h) and kf.entropy_first is None:
                kf.entropy_first = h
            if bool(switch[k]):
                # Replay of KeyframeSlam's switch branch (shared
                # _perform_switch: window solve + loop search + graph ops
                # in one combined device round trip).
                Z_new = np.asarray(Zs[k], np.float64)
                info = np.asarray(infos[k], np.float64)
                kf_meas_k = odo_meas_k = None
                if lm_on:
                    odo_nan_k = bool(nan_pair[k][1])
                    kf_meas_k = (
                        (np.asarray(kf_meas[k], np.float64),
                         np.asarray(info_pair[k][0], np.float64))
                        if bool(accepts[k]) else None
                    )
                    odo_meas_k = (
                        None if odo_nan_k
                        else (np.asarray(odo_meas[k], np.float64),
                              np.asarray(info_pair[k][1], np.float64))
                    )
                if k == last_switch:
                    pyr = chunk_rec["carry_after"]["kf"]
                else:
                    pyr = keyframe_scan.pyramid_from_stack(
                        intensities, depths, start + k,
                        self.tracker_cfg.num_levels,
                    )
                new_kf = self._perform_switch(
                    pyr, t, Z_new, info, kf_meas_k, odo_meas_k
                )
                self.frames.append(FrameRecord(t, new_kf.idx, np.eye(4)))
                if self.collect_covariance:
                    # info_switch already followed the per-frame engine's
                    # measurement-selection fallback chain.
                    self.covariances.append((t, _cov_from_info(infos[k])))
                out_poses.append(self._world_pose(new_kf.idx, np.eye(4)))
                continue

            if bool(accepts[k]) and np.isfinite(h):
                kf.entropy_sum += h
                kf.entropy_count += 1
            T_kf_cur = np.asarray(rel[k], np.float64)
            self.frames.append(FrameRecord(t, kf.idx, T_kf_cur))
            if lm_on:
                odo_nan_k = bool(nan_pair[k][1])
                self._local_map.add_frame(
                    len(self.frames) - 1,
                    T_kf_cur,
                    (np.asarray(kf_meas[k], np.float64),
                     np.asarray(info_pair[k][0], np.float64)),
                    None if odo_nan_k
                    else (np.asarray(odo_meas[k], np.float64),
                          np.asarray(info_pair[k][1], np.float64)),
                )
            if self.collect_covariance:
                self.covariances.append(
                    (t, _cov_from_info(info_pair[k][0]))
                )
            out_poses.append(self._world_pose(kf.idx, T_kf_cur))
        return out_poses

    # -- pipelining bookkeeping -----------------------------------------

    def _drain_chunks(self) -> None:
        """Collect every submitted-but-unwalked chunk (results land in
        frames/trajectory; the per-chunk pose lists are not returned)."""
        while self._chunk_queue:
            self.collect_chunk()

    def reset(self, T0=None):
        self._drain_chunks()
        super().reset(T0)

    def finish(self):
        self._drain_chunks()
        return super().finish()

    def trajectory(self):
        self._drain_chunks()
        return super().trajectory()

    def export_graph(self, path: str) -> None:
        self._drain_chunks()
        super().export_graph(path)

    def force_keyframe(self):
        """Applies to the next SUBMITTED chunk (under pipelining, submit
        order — not collect order — is the frame order)."""
        super().force_keyframe()
