"""Soak benchmark: the continuous-operation story, end to end.

The reference runs indefinitely — keyframes and g2o edges grow without
bound while the background thread keeps optimizing (SURVEY.md §2.5 P3,
dvo_slam/src/keyframe_graph.cpp). Every headline bench in this repo stays
under ~50 keyframes / ~400 frames; this harness drives THOUSANDS of
frames through the chunked full-SLAM engine (loop closure ON) so the
scale machinery is actually crossed in one run, not just unit-tested:

  - pose-graph capacity re-pads (max_keyframes doubles past 256),
  - the resident_keyframes HBM budget (async pyramid spill to host RAM +
    validation-batch re-upload of evicted candidates),
  - >= 512 active-vertex interleaved solves (solve-frequency backoff,
    SlamConfig.optimization_backoff_vertices).

Frames are rendered per chunk on the fly (a pre-rendered 4k-frame 640x480
sequence would be ~4 GB of host RAM) along a multi-cycle orbit, so
revisits — and therefore loop-closure proposals against an ever-growing
candidate set — happen throughout. One keyframe is forced per chunk
(bench.py's chunked cadence): chunk 8 x 4000 frames = ~500 keyframes.

Timing convention matches benchmark.py: the reported fps counts ENGINE
time only (submit/collect/force calls; host rendering is synthetic-data
overhead the real pipeline doesn't have). Per-1k-frame window fps exposes
degradation with scale; solver-bucket recompiles (O(log N) per run) stay
inside the timed region — continuous operation includes them.

Gates (printed as one JSON line):
  fps_stable : median of the last 2 windows >= 0.8 x median of windows
               2..3 (window 1 absorbs the scan + first-bucket compiles).
               Tightened from 0.6 in round 5: with the validation cache
               + level-trimmed uploads the measured tail/mid ratio is
               ~1.05 (windows [4.1, 5.5, 4.2, 6.0]); 0.8 leaves room
               for tunnel variance while failing any real decline of
               the pre-fix kind (pre-fix ratio was 0.85 and falling)
  ate        : final trajectory ATE RMSE below --ate-gate (loop closure
               must keep multi-cycle drift bounded)
  scale      : capacity re-padded AND evictions happened AND the active
               vertex count crossed --min-keyframes
  memory     : peak RSS below --rss-gate-mb

Run: python bench/soak.py [--frames 4000] [--chunk 8] [--width 640 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4000)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--window", type=int, default=1000,
                    help="frames per fps-curve window")
    ap.add_argument("--resident", type=int, default=None,
                    help="override SlamConfig.resident_keyframes")
    ap.add_argument("--backoff", type=int, default=None,
                    help="override optimization_backoff_vertices "
                         "(0 = reference solve-every-switch)")
    ap.add_argument("--noise", action="store_true",
                    help="add Kinect-style sensor noise")
    ap.add_argument("--ate-gate", type=float, default=30.0,
                    help="final ATE RMSE gate, millimeters")
    ap.add_argument("--rss-gate-mb", type=float, default=32768.0)
    ap.add_argument("--min-keyframes", type=int, default=300)
    ap.add_argument("--jsonl-out", default=None,
                    help="write per-chunk timing records here")
    args = ap.parse_args()

    import jax

    from dvo_slam_tpu.config import SlamConfig, TrackerConfig
    from dvo_slam_tpu.models.chunked_slam import ChunkedKeyframeSlam
    from dvo_slam_tpu.utils import evaluate, synthetic

    W, H = args.width, args.height
    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = TrackerConfig(sampler_backend="pallas" if on_tpu else "gather")
    # Nearest-16 candidate cap: on this revisit-every-cycle orbit the
    # radius census otherwise grows linearly with the map (hundreds of
    # validation tracks per switch by keyframe 500).
    slam_kw = {"max_loop_candidates": 16}
    if args.resident is not None:
        slam_kw["resident_keyframes"] = args.resident
    if args.backoff is not None:
        slam_kw["optimization_backoff_vertices"] = args.backoff
    slam_cfg = SlamConfig(**slam_kw)
    K_t = (525.0 * W / 640.0, 525.0 * H / 480.0,
           (W - 1) / 2.0, (H - 1) / 2.0)

    # Multi-cycle orbit: one cycle per ~400 frames keeps consecutive-frame
    # motion sensor-like while producing a revisit (loop-closure load)
    # every cycle. One full cycle is pre-rendered and replayed — the
    # orbit's wrap-around step equals a normal step, so N replays ARE the
    # N-cycle trajectory (rendering at 640x480 costs ~0.4 s/frame on this
    # one-core host; the engine is the thing under test, not the
    # synthesizer).
    cycle = min(args.frames, 400)
    poses_cycle = synthetic.orbit_trajectory(cycle, radius=0.05,
                                             yaw_amplitude=0.05, cycles=1.0)
    poses = [poses_cycle[i % cycle] for i in range(args.frames)]
    scene = synthetic.two_plane_scene(sharpness=2.0)
    rng = np.random.default_rng(7)
    K_np = np.asarray(K_t)
    cycle_i, cycle_d = [], []
    for p in poses_cycle:
        ii, zz = scene.render(K_np, W, H, p)
        if args.noise:
            ii, zz = synthetic.add_sensor_noise(ii, zz, rng)
        cycle_i.append(np.asarray(ii, np.float32))
        cycle_d.append(np.asarray(zz, np.float32))

    def render_chunk(c0, n):
        idx = [i % cycle for i in range(c0, min(c0 + n, args.frames))]
        return (np.stack([cycle_i[i] for i in idx]),
                np.stack([cycle_d[i] for i in idx]))

    slam = ChunkedKeyframeSlam(K_t, cfg, slam_cfg, enable_loop_closure=True)
    slam.init(poses[0])

    # Warm the chunk-length scan compile outside the timed region (the
    # solver-bucket recompiles that come with GRAPH GROWTH stay inside —
    # they are part of continuous operation).
    warm_i, warm_d = render_chunk(0, args.chunk)
    slam.update_chunk(warm_i, warm_d, [float(j) for j in range(args.chunk)])
    slam.reset(poses[0])
    slam.finish()
    slam = ChunkedKeyframeSlam(K_t, cfg, slam_cfg, enable_loop_closure=True)
    slam.init(poses[0])

    n_chunks = (args.frames + args.chunk - 1) // args.chunk
    engine_s = 0.0
    chunk_records = []
    submitted = 0
    pending_render = render_chunk(0, args.chunk)
    c0 = 0
    for c in range(n_chunks):
        ints, deps = pending_render
        ts = [100.0 + (c0 + j) / 30.0 for j in range(len(ints))]
        t0 = time.perf_counter()
        if c > 0:
            slam.force_keyframe()
        slam.submit_chunk(ints, deps, ts)
        submitted += 1
        engine_s += time.perf_counter() - t0
        c0 += len(ints)
        # Render the NEXT chunk while the submitted scan runs on device
        # (the depth-2 pipeline's natural overlap slot).
        if c + 1 < n_chunks:
            pending_render = render_chunk(c0, args.chunk)
        t0 = time.perf_counter()
        if submitted > 1:
            slam.collect_chunk()
        engine_s += time.perf_counter() - t0
        vstats = slam.validation_cache_stats
        chunk_records.append({
            "frame": c0, "engine_s": engine_s,
            "keyframes": len(slam.keyframes),
            "loop_edges": slam.num_loop_edges,
            "rss_mb": round(_rss_mb(), 1),
            "cache_hits": vstats["hits"],
            "cache_misses": vstats["misses"],
            "reupload_mb": round(vstats["uploaded_bytes"] / 2**20, 1),
        })
    t0 = time.perf_counter()
    slam.collect_chunk()
    traj = slam.finish()
    engine_s += time.perf_counter() - t0

    # Per-window fps from the cumulative engine-time curve.
    win = args.window
    window_fps = []
    prev_f, prev_s = 0, 0.0
    for rec in chunk_records:
        if rec["frame"] - prev_f >= win:
            window_fps.append(
                round((rec["frame"] - prev_f) / (rec["engine_s"] - prev_s), 1)
            )
            prev_f, prev_s = rec["frame"], rec["engine_s"]
    if args.frames - prev_f >= win // 2:
        window_fps.append(
            round((args.frames - prev_f) / (engine_s - prev_s), 1)
        )

    est = [T for _, T in traj]
    ate_mm = 1000.0 * evaluate.ate_rmse(est, poses[: len(est)])
    evicted = sum(1 for k in slam.keyframes if not k.resident)
    capacity = int(slam.graph.poses.shape[0])
    peak_rss = _rss_mb()

    mid = window_fps[1:3] if len(window_fps) > 3 else window_fps[:1]
    tail = window_fps[-2:] if len(window_fps) >= 2 else window_fps
    fps_stable = (np.median(tail) >= 0.8 * np.median(mid)) if window_fps else False
    gates = {
        "fps_stable": bool(fps_stable),
        "ate": bool(ate_mm < args.ate_gate),
        "scale": bool(capacity > slam_cfg.max_keyframes and evicted > 0
                      and len(slam.keyframes) >= args.min_keyframes),
        "memory": bool(peak_rss < args.rss_gate_mb),
    }
    out = {
        "frames": args.frames, "chunk": args.chunk,
        "engine_fps": round(args.frames / engine_s, 1),
        "window_fps": window_fps,
        "ate_mm": round(ate_mm, 2),
        "keyframes": len(slam.keyframes),
        "loop_edges": int(slam.num_loop_edges),
        "capacity": capacity,
        "evicted": evicted,
        "backoff": slam_cfg.optimization_backoff_vertices,
        "resident_budget": slam_cfg.resident_keyframes,
        # Re-upload observability (the round-4 finding was "switches are
        # re-upload-bound"; these verify the level-trim + LRU fixes fire
        # at soak scale): hit_rate over host-resident candidates, and the
        # actual MB shipped to the device for validation.
        "cache_hit_rate": round(slam.validation_cache_stats["hit_rate"], 3),
        "cache_hits": slam.validation_cache_stats["hits"],
        "cache_misses": slam.validation_cache_stats["misses"],
        "reupload_mb": round(
            slam.validation_cache_stats["uploaded_bytes"] / 2**20, 1),
        "peak_rss_mb": round(peak_rss, 1),
        "gates": gates,
        "ok": all(gates.values()),
    }
    if args.jsonl_out:
        with open(args.jsonl_out, "w") as f:
            for rec in chunk_records:
                f.write(json.dumps(rec) + "\n")
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
