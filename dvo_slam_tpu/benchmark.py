"""Offline benchmark harness: TUM sequences end-to-end.

TPU-native equivalent of the reference's dvo_benchmark package
(dvo_benchmark/src/benchmark_slam.cpp + launch/benchmark.launch; SURVEY.md
§3.1): stream a TUM RGB-D sequence, run odometry or full SLAM, write the
TUM-format trajectory, and report ATE/RPE against groundtruth plus wall-
clock fps. This is THE reproducibility entry point.

Also runs on synthetic sequences (--synthetic) since the machine may not
have the dataset.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Optional

import numpy as np

from dvo_slam_tpu.config import SlamConfig, TrackerConfig
from dvo_slam_tpu.models.keyframe_tracker import KeyframeSlam
from dvo_slam_tpu.utils import evaluate, se3_np, tum


@dataclasses.dataclass
class BenchmarkResult:
    num_frames: int
    fps: float
    elapsed_s: float
    ate_rmse_m: Optional[float]
    rpe_trans_m: Optional[float]
    rpe_rot_rad: Optional[float]
    num_keyframes: int
    num_loop_edges: int

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def _write_covariances(path: str, covariances) -> None:
    """'timestamp v00 .. v55' per line (PoseWithCovarianceStamped payload)."""
    with open(path, "w") as fh:
        for ts, cov in covariances:
            vals = " ".join(f"{v:.9e}" for v in np.asarray(cov).reshape(-1))
            fh.write(f"{ts:.6f} {vals}\n")


def _relaxed_warm_cfg(slam_cfg: SlamConfig) -> SlamConfig:
    """Warmup SlamConfig: host-side-only relaxations that make a 2-frame
    repeated warm run hit every compile unit (keyframe switches, the
    loop-closure validation batch) — traced compile keys are unchanged
    (the scan keys on ScanConfig; validators key on tracker configs)."""
    return dataclasses.replace(
        slam_cfg,
        min_constraint_distance=1,
        new_constraint_search_radius=1e9,
        min_entropy_ratio_coarse=-1e9,
        min_entropy_ratio_fine=-1e9,
        cross_validation_threshold=1e9,
    )


def run_sequence(
    frame_iter,
    K,
    tracker_cfg: TrackerConfig = TrackerConfig(),
    slam_cfg: SlamConfig = SlamConfig(),
    groundtruth=None,
    mode: str = "slam",
    trajectory_out: Optional[str] = None,
    warmup: int = 1,
    covariance_out: Optional[str] = None,
    checkpoint_out: Optional[str] = None,
    resume: Optional[str] = None,
    chunk_size: Optional[int] = None,
    graph_out: Optional[str] = None,
) -> BenchmarkResult:
    """Run SLAM/odometry over an iterable of (timestamp, intensity, depth).

    mode: "slam" (keyframes + graph + loop closure), "keyframe" (no loop
    closure), "odometry" (frame-to-frame only — the reference
    camera_tracker node; no keyframe store, no pose graph, unbounded
    sequence length).

    chunk_size: slam/keyframe modes — process frames through the chunked
    device-resident front-end (models/chunked_slam.py: one dispatch + one
    transfer per chunk instead of per frame; the remoted-device fast path;
    full feature parity incl. the windowed LocalMap solve on switches).
    Checkpoints written here carry the scan state and resume only with
    chunk_size set (and vice versa).

    groundtruth: optional per-frame list aligned with the sequence; entries
    may be None for frames without a groundtruth match (mocap dropouts) —
    those frames are EXCLUDED from ATE/RPE, as the TUM evaluation tools do.

    covariance_out: write per-frame 6x6 pose covariances
    (Information^{-1}; the reference publishes these as
    PoseWithCovarianceStamped) as 'timestamp v00 .. v55' lines — all
    modes (odometry and the keyframe engines). Covariances are a live
    observability stream, not checkpointed state: a resumed run's file
    covers only the frames processed after the resume.

    checkpoint_out / resume: slam/keyframe modes — save the full SLAM
    state (.npz) after the frame loop (pre-finish, i.e. the resumable
    streaming state) / start from a saved state instead of fresh.

    graph_out: slam/keyframe modes — write the final optimized pose graph
    as .g2o (the reference backend's native interchange format).

    The sequence is consumed as a STREAM: only the 2-frame warmup buffer
    (plus, in chunked mode, one chunk) is resident at a time, so hour-long
    sequences don't need gigabytes of host RAM. `groundtruth` may be a
    per-frame list (None entries excluded) or a callable timestamp -> pose
    (None when unmatched) — the callable form pairs with streaming input.
    """
    import itertools

    it = iter(frame_iter)
    head = list(itertools.islice(it, 2))  # warmup buffer
    if not head:
        raise ValueError("empty sequence")
    stream = itertools.chain(head, it)
    gt_fn = groundtruth if callable(groundtruth) else None

    t0_pose = None
    if gt_fn is not None:
        t0_pose = gt_fn(head[0][0])
    elif groundtruth is not None and groundtruth[0] is not None:
        t0_pose = groundtruth[0]

    num_frames = 0

    if mode == "odometry" and chunk_size:
        # The chunked device-resident front-end is a keyframe-SLAM engine;
        # silently running the per-frame path here would let users publish
        # "chunked odometry" fps numbers that never exercised it.
        raise ValueError(
            "chunk_size applies to the keyframe engines (mode='slam'/"
            "'keyframe'); plain odometry has no chunked path"
        )

    if mode == "odometry":
        from dvo_slam_tpu.models.odometry import OdometryTracker

        odo = OdometryTracker(K, tracker_cfg,
                              collect_covariance=covariance_out is not None)
        odo.init(t0_pose)
        if warmup and len(head) >= 2:
            warm = OdometryTracker(K, tracker_cfg)
            for ts, intensity, depth in head:
                warm.update(intensity, depth, ts)
        # Time the engine only: the stream may be decoding synchronously
        # (cv2 fallback), and ingest is I/O, not odometry — chunked mode
        # times update_chunk the same way.
        elapsed = 0.0
        for ts, intensity, depth in stream:
            t_f = time.perf_counter()
            odo.update(intensity, depth, ts)
            elapsed += time.perf_counter() - t_f
            num_frames += 1
        traj = odo.trajectory
        num_keyframes = 0
        num_loop_edges = 0
        if covariance_out:
            _write_covariances(covariance_out, odo.covariances)
    elif chunk_size:
        from dvo_slam_tpu.models.chunked_slam import ChunkedKeyframeSlam

        if resume:
            from dvo_slam_tpu.utils import checkpoint

            slam = checkpoint.load_slam(
                resume, K, tracker_cfg, slam_cfg,
                enable_loop_closure=(mode == "slam"), chunked=True,
            )
            slam.collect_covariance = covariance_out is not None
        else:
            slam = ChunkedKeyframeSlam(
                K, tracker_cfg, slam_cfg,
                enable_loop_closure=(mode == "slam"),
                collect_covariance=covariance_out is not None,
            )
            slam.init(t0_pose)

        warm = None
        warmed_scans = set()

        def _warm_chunk(n, t0):
            sel = [head[i % len(head)] for i in range(n)]
            return (np.stack([f[1] for f in sel]),
                    np.stack([f[2] for f in sel]),
                    [t0 + i / 30.0 for i in range(n)])

        if warmup and len(head) >= 2:
            warm = ChunkedKeyframeSlam(K, tracker_cfg,
                                       _relaxed_warm_cfg(slam_cfg),
                                       enable_loop_closure=(mode == "slam"))
            warm.init()
            warm.update_chunk(*_warm_chunk(1, 0.0))  # consume init frame
            # Steady-state scan length + the keyframe-switch replay:
            # pyramid build + graph solve (+ the loop-closure validation
            # batch at 3 keyframes in slam mode).
            warm.update_chunk(*_warm_chunk(chunk_size, 1.0))
            warm.force_keyframe()
            warm.update_chunk(*_warm_chunk(chunk_size, 2.0))
            warm.force_keyframe()
            warm.update_chunk(*_warm_chunk(chunk_size, 3.0))
            warm.finish()
            warmed_scans.add(chunk_size)

        # Per-chunk timing so non-steady scan lengths (the fresh first
        # chunk — init consumes a frame, scan n-1 — and the short tail)
        # can be compiled OUTSIDE the timed region right before their
        # chunk. A single start/stop timer would charge those XLA
        # compiles to the benchmark.
        #
        # Depth-2 submit/collect pipelining (same as bench.py): chunk
        # k+1's device scan is dispatched before chunk k's results are
        # fetched + walked, so the fetch round trip, the host graph walk
        # AND the next chunk's ingest/decode ride under chunk k's chip
        # compute (the reference's ROS pipeline overlapped ingest the
        # same way). Results are bit-identical to the sequential loop.
        elapsed = 0.0
        fresh_first = resume is None
        warm_t = 10.0
        buf = []
        in_flight = 0
        for frame in itertools.chain(stream, [None]):
            if frame is not None:
                buf.append(frame)
                if len(buf) < chunk_size:
                    continue
            if not buf:
                continue
            scan_len = len(buf) - 1 if fresh_first else len(buf)
            fresh_first = False
            if warm is not None and scan_len > 0 and scan_len not in warmed_scans:
                # Warm the switch path too at this chunk shape: the
                # switch replay's pyramid build slices out of the chunk
                # inside its jit, so its compile key includes (n, H, W).
                # NOTE: like the stream ingest, this warmup (typically the
                # TAIL chunk's odd length) overlaps any in-flight pipelined
                # chunk on device, so the reported fps is overlapped
                # throughput — in-flight compute hiding under untimed host
                # work is the pipeline working as designed, but it is not
                # a pure engine-time measurement.
                warm.force_keyframe()
                warm.update_chunk(*_warm_chunk(scan_len, warm_t))
                warm_t += 1.0
                warmed_scans.add(scan_len)
            t_chunk = time.perf_counter()
            slam.submit_chunk(
                np.stack([f[1] for f in buf]),
                np.stack([f[2] for f in buf]),
                [f[0] for f in buf],
            )
            in_flight += 1
            if in_flight == 2:
                slam.collect_chunk()
                in_flight -= 1
            elapsed += time.perf_counter() - t_chunk
            num_frames += len(buf)
            buf = []
        t_chunk = time.perf_counter()
        while in_flight:
            slam.collect_chunk()
            in_flight -= 1
        elapsed += time.perf_counter() - t_chunk
        if checkpoint_out:
            from dvo_slam_tpu.utils import checkpoint

            checkpoint.save_slam(checkpoint_out, slam)
        traj = slam.finish()
        if graph_out:
            slam.export_graph(graph_out)
        if covariance_out:
            _write_covariances(covariance_out, slam.covariances)
        num_keyframes = len(slam.keyframes)
        num_loop_edges = slam.num_loop_edges
    else:
        if resume:
            from dvo_slam_tpu.utils import checkpoint

            slam = checkpoint.load_slam(
                resume, K, tracker_cfg, slam_cfg,
                enable_loop_closure=(mode == "slam"),
            )
            slam.collect_covariance = covariance_out is not None
        else:
            slam = KeyframeSlam(
                K, tracker_cfg, slam_cfg,
                enable_loop_closure=(mode == "slam"),
                collect_covariance=covariance_out is not None,
            )
            slam.init(t0_pose)
        # Warm EVERY compile unit the timed loop can hit — dual tracking,
        # the local-map and pose-graph solves (keyframe switch), the
        # coarse+fine loop-closure validators, and the final optimization
        # (the reference amortizes nothing, but its first frame costs
        # microseconds, not an XLA compile).
        if warmup and len(head) >= 2:
            warm = KeyframeSlam(K, tracker_cfg, _relaxed_warm_cfg(slam_cfg),
                                enable_loop_closure=(mode == "slam"))
            warm.init()
            (_, i0, d0), (_, i1, d1) = head[0], head[1]
            warm.update(i0, d0, 0.0)
            warm.update(i1, d1, 1 / 30.0)
            warm.force_keyframe()
            warm.update(i0, d0, 2 / 30.0)  # switch: local map + graph solve
            warm.force_keyframe()
            warm.update(i1, d1, 3 / 30.0)  # 3rd keyframe: validation batch
            warm.finish()  # final-optimization variant
        # Engine-only timing (ingest excluded), as in the other modes.
        elapsed = 0.0
        for ts, intensity, depth in stream:
            t_f = time.perf_counter()
            slam.update(intensity, depth, ts)
            elapsed += time.perf_counter() - t_f
            num_frames += 1
        if checkpoint_out:
            from dvo_slam_tpu.utils import checkpoint

            checkpoint.save_slam(checkpoint_out, slam)
        traj = slam.finish()
        if graph_out:
            slam.export_graph(graph_out)
        if covariance_out:
            _write_covariances(covariance_out, slam.covariances)
        num_keyframes = len(slam.keyframes)
        num_loop_edges = slam.num_loop_edges

    timestamps = [t for t, _ in traj]
    est = [T for _, T in traj]
    if trajectory_out:
        tum.write_trajectory(trajectory_out, timestamps, est)

    if gt_fn is not None:
        # Streaming groundtruth: look up per actually-processed frame (the
        # trajectory's own timestamps), robust to frames the loader skipped.
        groundtruth = [gt_fn(t) for t in timestamps[-num_frames:]]

    ate = rpe_t = rpe_r = None
    if groundtruth is not None:
        # Resumed runs: finish() returns checkpointed frames too, but
        # groundtruth covers only THIS run's frames — align from the tail
        # (a no-op for fresh runs, where the lengths match).
        est_eval = est[-len(groundtruth):] if len(groundtruth) else []
        pairs = [(e, g) for e, g in zip(est_eval, groundtruth) if g is not None]
        if len(pairs) >= 2:
            est_m = [p[0] for p in pairs]
            gt_m = [p[1] for p in pairs]
            ate = evaluate.ate_rmse(est_m, gt_m)
            rpe_t, rpe_r = evaluate.rpe(est_m, gt_m)

    return BenchmarkResult(
        num_frames=num_frames,
        fps=num_frames / elapsed,
        elapsed_s=elapsed,
        ate_rmse_m=ate,
        rpe_trans_m=rpe_t,
        rpe_rot_rad=rpe_r,
        num_keyframes=num_keyframes,
        num_loop_edges=num_loop_edges,
    )


def run_tum_dataset(
    dataset_dir: str,
    tracker_cfg: TrackerConfig = TrackerConfig(),
    slam_cfg: SlamConfig = SlamConfig(),
    mode: str = "slam",
    trajectory_out: Optional[str] = None,
    max_frames: Optional[int] = None,
    intrinsics=None,
    covariance_out: Optional[str] = None,
    checkpoint_out: Optional[str] = None,
    resume: Optional[str] = None,
    chunk_size: Optional[int] = None,
    graph_out: Optional[str] = None,
) -> BenchmarkResult:
    """Benchmark a TUM RGB-D directory (reference benchmark_slam main)."""
    from dvo_slam_tpu.ops import camera

    ds = tum.TumDataset(dataset_dir)
    K = intrinsics or camera.TUM_FR1
    n = len(ds) if max_frames is None else min(max_frames, len(ds))

    # Streamed frames with background decode (native C++ prefetch thread
    # when available) — run_sequence never holds the decoded sequence in
    # RAM. Groundtruth is a timestamp lookup: frames without a close match
    # evaluate to None and are excluded from ATE/RPE (the TUM
    # evaluate_ate/evaluate_rpe behaviour), and lookup-by-timestamp stays
    # aligned even when the loader skips a corrupt frame.
    gt = ds.groundtruth_pose if ds.groundtruth is not None else None

    return run_sequence(
        ds.prefetch_iter(limit=n), K, tracker_cfg, slam_cfg,
        groundtruth=gt, mode=mode, trajectory_out=trajectory_out,
        covariance_out=covariance_out,
        checkpoint_out=checkpoint_out, resume=resume,
        chunk_size=chunk_size, graph_out=graph_out,
    )


def run_synthetic(
    num_frames: int = 30,
    width: int = 320,
    height: int = 240,
    tracker_cfg: TrackerConfig = TrackerConfig(),
    slam_cfg: SlamConfig = SlamConfig(),
    mode: str = "slam",
    trajectory_out: Optional[str] = None,
    chunk_size: Optional[int] = None,
) -> BenchmarkResult:
    """Benchmark on the exact-geometry synthetic orbit sequence."""
    from dvo_slam_tpu.utils import synthetic

    K = (width * 0.8, width * 0.8, (width - 1) / 2.0, (height - 1) / 2.0)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(num_frames, radius=0.06)
    frames = synthetic.render_sequence(scene, np.asarray(K), width, height, poses)
    frame_iter = ((i / 30.0, f[0], f[1]) for i, f in enumerate(frames))
    return run_sequence(
        frame_iter, K, tracker_cfg, slam_cfg,
        groundtruth=poses, mode=mode, trajectory_out=trajectory_out,
        chunk_size=chunk_size,
    )
