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


def run_sequence(
    frame_iter,
    K,
    tracker_cfg: TrackerConfig = TrackerConfig(),
    slam_cfg: SlamConfig = SlamConfig(),
    groundtruth=None,
    mode: str = "slam",
    trajectory_out: Optional[str] = None,
    warmup: int = 1,
) -> BenchmarkResult:
    """Run SLAM/odometry over an iterable of (timestamp, intensity, depth).

    mode: "slam" (keyframes + graph + loop closure), "keyframe" (no loop
    closure), "odometry" (frame-to-frame only, reference camera_tracker
    node semantics).
    """
    slam = KeyframeSlam(
        K,
        tracker_cfg,
        slam_cfg,
        enable_loop_closure=(mode == "slam"),
    )
    # mode == "odometry": frame-to-frame tracking is realized by forcing a
    # keyframe switch every frame in the loop below (reference
    # camera_tracker semantics).

    frames = list(frame_iter)
    if not frames:
        raise ValueError("empty sequence")

    t0_pose = None
    if groundtruth is not None:
        t0_pose = groundtruth[0]
    slam.init(t0_pose)

    # Warmup on the first frame pair to amortize compile out of the fps
    # number (the reference amortizes nothing, but its first frame costs
    # microseconds, not an XLA compile).
    if warmup and len(frames) >= 2:
        warm = KeyframeSlam(K, tracker_cfg, slam_cfg, enable_loop_closure=False)
        warm.init()
        for ts, intensity, depth in frames[:2]:
            warm.update(intensity, depth, ts)

    start = time.perf_counter()
    for i, (ts, intensity, depth) in enumerate(frames):
        if mode == "odometry" and i > 0:
            slam.force_keyframe()
        slam.update(intensity, depth, ts)
    elapsed = time.perf_counter() - start

    traj = slam.finish()
    timestamps = [t for t, _ in traj]
    est = [T for _, T in traj]
    if trajectory_out:
        tum.write_trajectory(trajectory_out, timestamps, est)

    ate = rpe_t = rpe_r = None
    if groundtruth is not None:
        ate = evaluate.ate_rmse(est, groundtruth)
        rpe_t, rpe_r = evaluate.rpe(est, groundtruth)

    return BenchmarkResult(
        num_frames=len(frames),
        fps=len(frames) / elapsed,
        elapsed_s=elapsed,
        ate_rmse_m=ate,
        rpe_trans_m=rpe_t,
        rpe_rot_rad=rpe_r,
        num_keyframes=len(slam.keyframes),
        num_loop_edges=slam.num_loop_edges,
    )


def run_tum_dataset(
    dataset_dir: str,
    tracker_cfg: TrackerConfig = TrackerConfig(),
    slam_cfg: SlamConfig = SlamConfig(),
    mode: str = "slam",
    trajectory_out: Optional[str] = None,
    max_frames: Optional[int] = None,
    intrinsics=None,
) -> BenchmarkResult:
    """Benchmark a TUM RGB-D directory (reference benchmark_slam main)."""
    from dvo_slam_tpu.ops import camera

    ds = tum.TumDataset(dataset_dir)
    K = intrinsics or camera.TUM_FR1

    def frame_iter():
        n = len(ds) if max_frames is None else min(max_frames, len(ds))
        for i in range(n):
            ts, intensity, depth = ds[i]
            yield ts, intensity, depth

    gt = None
    if ds.groundtruth is not None:
        gt = []
        n = len(ds) if max_frames is None else min(max_frames, len(ds))
        for i in range(n):
            pose = ds.groundtruth_pose(ds.timestamp(i))
            gt.append(pose if pose is not None else np.eye(4))

    return run_sequence(
        frame_iter(), K, tracker_cfg, slam_cfg,
        groundtruth=gt, mode=mode, trajectory_out=trajectory_out,
    )


def run_synthetic(
    num_frames: int = 30,
    width: int = 320,
    height: int = 240,
    tracker_cfg: TrackerConfig = TrackerConfig(),
    slam_cfg: SlamConfig = SlamConfig(),
    mode: str = "slam",
    trajectory_out: Optional[str] = None,
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
    )
