"""Benchmark: tracked frames/sec at 640x480 RGB-D dense odometry.

Driver contract: prints ONE JSON line
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}
vs_baseline is against the reference's ~30 Hz on a 2013 desktop CPU
(BASELINE.md; IROS13 real-time claim). North star: >500 fps on one v5e chip.

Measures the reference-equivalent per-frame work (SURVEY.md §3.2): pyramid
build for the incoming frame + DenseTracker::match against the previous
frame at default levels (coarsest 80x60 .. finest tracked 320x240), default
bivariate t-distribution IRLS, per-iteration stats collection on (reference
parity). The workload is a pre-rendered RING of frames along a smooth
trajectory — every dispatch sees different pixels and consumes the previous
step's pyramid and pose (constant-velocity warm start, the reference's
UseInitialEstimate semantics), so the runtime can neither elide nor
deduplicate work and iteration counts vary realistically across pairs.

Modes:
  odometry (default) — frame-to-frame tracking, the headline number
  cold               — same ring but identity initialization every frame
                       (no warm start; round-1-comparable upper-bound work)
  dual               — the SLAM dual-alignment step (batch 2: keyframe +
                       previous frame per incoming frame)
  slam               — full KeyframeSlam.update loop (includes per-frame
                       host round trips and keyframe switches; on remoted
                       devices this is dominated by tunnel latency)
  chunked            — full SLAM via ChunkedKeyframeSlam (device-resident
                       front-end, one dispatch + one transfer per 16-frame
                       chunk, graph backend per switch): the remoted-device
                       fast path for the slam workload
  kfscan             — device-resident keyframe odometry (dual alignment +
                       entropy-ratio switching inside lax.scan): the SLAM
                       front-end with ZERO per-frame host round trips
  slam-lc / chunked-lc — the same workloads with LOOP CLOSURE ON: radius
                       candidate search + batched two-stage validation +
                       interleaved graph solves inside the timed loop
                       (the complete IROS13 system, SURVEY.md §3.4)
  stream / stream-lc — chunked full SLAM with UPLOAD INCLUDED: raw u8/u16
                       chunks double-buffered from host memory (the
                       deployable pipeline number, not just the chip)

Run: python bench.py [--mode M] [--frames N] [--width W --height H]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _render_ring(W, H, K_t, n=8, radius=0.06):
    """n frames along a closed orbit; consecutive (and wrap-around) motions
    are realistic inter-frame steps."""
    from dvo_slam_tpu.utils import synthetic

    scene = synthetic.two_plane_scene(sharpness=2.0)
    poses = synthetic.orbit_trajectory(n + 1, radius=radius)[:n]
    frames = synthetic.render_sequence(scene, np.asarray(K_t), W, H, poses)
    return frames, poses


def main():
    # Debug aid for remoted-device hangs: DVO_HANG_DUMP=<seconds> dumps
    # every thread's stack and exits if the run wedges (e.g. a tunnel
    # transfer that never completes).
    if os.environ.get("DVO_HANG_DUMP"):
        import faulthandler

        faulthandler.dump_traceback_later(
            int(os.environ["DVO_HANG_DUMP"]), exit=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="odometry",
                    choices=["odometry", "cold", "dual", "slam", "chunked",
                             "kfscan", "slam-lc", "chunked-lc", "stream",
                             "stream-lc", "live", "live-lc"])
    ap.add_argument("--chunk", type=int, default=16,
                    help="chunked mode: frames per dispatch")
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--ring", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--margin", type=int, default=None,
                    help="override pallas window margin (rows)")
    ap.add_argument("--scale-warm", type=int, default=None,
                    help="override tdist_scale_warm_iters")
    ap.add_argument("--rows-tile", type=int, default=None,
                    help="override pallas_rows_per_tile")
    ap.add_argument("--pack12", action="store_true",
                    help="stream modes: upload depth as 12-bit packed "
                    "ticks (pack_depth12, 2.5 B/px total instead of 3)")
    ap.add_argument("--enc", default="f32",
                    choices=["f32", "raw", "raw12"],
                    help="live modes: wire/upload encoding (f32 8 B/px, "
                    "raw u8+u16 3 B/px, raw12 2.5 B/px)")
    ap.add_argument("--stage-eager", action="store_true",
                    help="live modes: per-frame eager device staging in "
                    "the chunked node (opt-in; can wedge over the tunnel "
                    "- see node.SlamNode.stage_eagerly)")
    ap.add_argument("--rate", type=float, default=0.0,
                    help="live modes: pace frame sends at this Hz (0 = "
                    "unpaced firehose). Paced runs make the reported pose "
                    "latency meaningful (sensor-rate deployment); unpaced "
                    "runs measure throughput and their latency is "
                    "queueing-dominated")
    ap.add_argument("--gradient-source", default=None,
                    choices=["current", "reference"],
                    help="Jacobian gradient source (reference-frame "
                    "gradients sample 2.3x fewer channels per iteration)")
    ap.add_argument("--point-budget", type=float, default=None,
                    help="point_budget_fraction: compact selected points "
                    "to this fraction of each level (0 = full-grid mask)")
    ap.add_argument("--grad-threshold", type=float, default=None,
                    help="intensity_grad_threshold: select only pixels "
                    "with |grad I| above this (the real-data sparse-"
                    "selection regime compaction exists for)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dvo_slam_tpu.config import SlamConfig, TrackerConfig
    from dvo_slam_tpu.models import dense_tracker
    from dvo_slam_tpu.ops import camera, pyramid

    W, H = args.width, args.height
    # Reference defaults: levels 3..1 of a 4-level pyramid. On TPU use the
    # fused Pallas sampling kernel (NaN-safe mask channel included);
    # elsewhere the portable XLA gather path.
    on_tpu = jax.devices()[0].platform == "tpu"
    kw = {}
    if args.margin is not None:
        kw["pallas_margin"] = args.margin
    if args.scale_warm is not None:
        kw["tdist_scale_warm_iters"] = args.scale_warm
    if args.rows_tile is not None:
        kw["pallas_rows_per_tile"] = args.rows_tile
    if args.gradient_source is not None:
        kw["gradient_source"] = args.gradient_source
    if args.point_budget is not None:
        kw["point_budget_fraction"] = args.point_budget
    if args.grad_threshold is not None:
        kw["intensity_grad_threshold"] = args.grad_threshold
    cfg = TrackerConfig(sampler_backend="pallas" if on_tpu else "gather", **kw)
    K_t = (525.0 * W / 640.0, 525.0 * H / 480.0, (W - 1) / 2.0, (H - 1) / 2.0)
    Ks = camera.pyramid_intrinsics(camera.intrinsics(*K_t), cfg.num_levels)

    frames, _ = _render_ring(W, H, K_t, n=args.ring)
    ring = [(jnp.asarray(i), jnp.asarray(z)) for i, z in frames]

    if args.mode in ("slam", "slam-lc"):
        fps, note = _bench_slam(args, cfg, K_t, frames,
                                lc=args.mode == "slam-lc")
    elif args.mode in ("chunked", "chunked-lc"):
        fps, note = _bench_chunked(args, cfg, K_t, frames,
                                   lc=args.mode == "chunked-lc")
    elif args.mode in ("stream", "stream-lc"):
        fps, note = _bench_stream(args, cfg, K_t, frames,
                                  lc=args.mode == "stream-lc")
    elif args.mode in ("live", "live-lc"):
        fps, note = _bench_live(args, cfg, K_t, frames,
                                lc=args.mode == "live-lc")
    elif args.mode == "kfscan":
        fps, note = _bench_kfscan(args, cfg, K_t, ring, jax, jnp)
    else:
        fps, note = _bench_tracking(args, cfg, Ks, ring, jax, jnp,
                                    dense_tracker, pyramid)

    out = {
        "metric": f"tracked_fps_{W}x{H}"
        + ("" if args.mode == "odometry" else f"_{args.mode}"),
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 2),
    }
    print(json.dumps(out))
    print(f"# device={jax.devices()[0].platform} mode={args.mode} "
          f"frames={args.frames} ring={args.ring} {note}", file=sys.stderr)


def _bench_tracking(args, cfg, Ks, ring, jax, jnp, dense_tracker, pyramid):
    n_ring = len(ring)
    warm_start = args.mode != "cold"
    batch = 2 if args.mode == "dual" else 0

    if batch:
        @jax.jit
        def step(int_c, dep_c, ref_pyrs, T0s):
            cur = pyramid.build_pyramid(int_c, dep_c, cfg.num_levels)

            def track(ref, T0):
                return dense_tracker.track(ref, cur, Ks, T0, cfg)

            # Next step's stacked reference is produced INSIDE the jit:
            # host-side per-level jnp.stack calls cost a dispatch each —
            # several tunnel round trips per frame on remoted devices.
            nxt = tuple(jnp.stack([l] * batch) for l in cur)
            return nxt, jax.vmap(track)(ref_pyrs, T0s)
    else:
        @jax.jit
        def step(int_c, dep_c, ref_pyr, T0):
            cur = pyramid.build_pyramid(int_c, dep_c, cfg.num_levels)
            return cur, dense_tracker.track(ref_pyr, cur, Ks, T0, cfg)

    build = jax.jit(lambda i, d: pyramid.build_pyramid(i, d, cfg.num_levels))
    ref_pyr = build(*ring[0])
    eye = jnp.eye(4)
    if batch:
        ref_pyr = tuple(jnp.stack([l, l]) for l in ref_pyr)
        T_init = jnp.stack([eye, eye])
    else:
        T_init = eye

    def run(n, ref_pyr, T0):
        iters = []
        for k in range(n):
            int_c, dep_c = ring[(k + 1) % n_ring]
            cur, res = step(int_c, dep_c, ref_pyr, T0)
            ref_pyr = cur  # already stacked in-jit for dual mode
            if warm_start:
                # Constant-velocity warm start: consume the previous pose
                # ON DEVICE (no host sync; chains real data dependencies).
                T0 = res.transformation
            iters.append(res.iterations)
        jax.block_until_ready(res.transformation)
        return res, iters

    res, _ = run(max(args.warmup, 2 * n_ring), ref_pyr, T_init)  # compile+warm
    t0 = time.perf_counter()
    res, iters = run(args.frames, ref_pyr, T_init)
    elapsed = time.perf_counter() - t0

    mean_iters = np.mean([np.asarray(i) for i in iters], axis=0)
    if mean_iters.ndim > 1:  # dual: (B, L)
        mean_iters = mean_iters.mean(axis=0)
    note = (f"elapsed={elapsed:.3f}s warm_start={warm_start} "
            f"mean_iters_per_level={np.round(mean_iters, 2).tolist()} "
            f"ms_per_frame={1000 * elapsed / args.frames:.2f}")
    if cfg.point_budget_fraction > 0.0:
        # Budgeted runs must show the flat-tile window held: points lost
        # to window misses would make the fps number hollow.
        note += (f" valid_px={float(res.valid_pixels):.0f}"
                 f" window_miss_frac={float(res.window_miss_frac):.4f}")
    return args.frames / elapsed, note


def _bench_kfscan(args, cfg, K_t, ring, jax, jnp):
    """Device-resident keyframe odometry throughput (one dispatch for the
    whole sequence; dual alignment + entropy switching inside the scan)."""
    from dvo_slam_tpu.config import SlamConfig
    from dvo_slam_tpu.models import keyframe_scan
    from dvo_slam_tpu.ops import camera

    n = min(args.frames, 64)  # sequence lives in HBM: 64 frames ~ 150 MB
    reps = min(4, max(1, args.frames // n))
    # Pre-materialized DISTINCT sequences per rep (ring-rotated): repeated
    # identical dispatches get elided/deduplicated by the runtime and read
    # arbitrarily fast; per-rep jnp.roll dispatches distort timing instead.
    seqs = []
    for r in range(reps + 1):
        seqs.append((
            jnp.stack([ring[(k + r) % len(ring)][0] for k in range(n)]),
            jnp.stack([ring[(k + r) % len(ring)][1] for k in range(n)]),
        ))
    K = camera.intrinsics(*K_t)
    slam_cfg = SlamConfig(local_map_optimize=False)
    # Realistic keyframe cadence: the synthetic ring never degrades
    # tracking, so without switches every frame aligns against an
    # ever-more-distant keyframe at max iterations.
    force = jnp.asarray(np.arange(n) % 8 == 0)

    def run(r):
        outs = keyframe_scan.track_keyframe_sequence(
            seqs[r][0], seqs[r][1], K, cfg, slam_cfg, force_keyframe=force,
        )
        # Force a real value fetch: on remoted devices block_until_ready
        # does not reliably drain a whole-sequence dispatch — only reading
        # a result does.
        np.asarray(outs["rel_pose"])
        return outs

    outs = run(0)  # compile
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        outs = run(r)
    elapsed = time.perf_counter() - t0
    frames_done = reps * (n - 1)
    switches = int(np.asarray(outs["switch"]).sum())
    mean_iters = np.asarray(outs["iterations"]).mean(axis=0).mean(axis=0)
    note = (f"elapsed={elapsed:.3f}s seq={n} reps={reps} "
            f"switches_per_seq={switches} "
            f"mean_iters_per_level={np.round(mean_iters, 2).tolist()} "
            f"ms_per_frame={1000 * elapsed / frames_done:.2f} "
            "(zero per-frame host round trips)")
    return frames_done / elapsed, note


def _run_pipelined(slam, chunks, chunk, t_base):
    """Drive a ChunkedKeyframeSlam through (intensity, depth) chunk pairs
    with the depth-2 submit/collect pipeline: chunk c+1's scan is
    dispatched BEFORE chunk c's results are fetched + walked, so the fetch
    round trip and the host graph walk hide under the next chunk's chip
    compute (results are bit-identical to the sequential loop —
    tests/test_chunked_slam.py). One forced keyframe per chunk (same
    cadence as slam mode)."""
    submitted = 0
    for c, (ints, deps) in enumerate(chunks):
        if c > 0:
            slam.force_keyframe()
        slam.submit_chunk(
            ints, deps,
            [t_base + (c * chunk + j) / 30.0 for j in range(chunk)],
        )
        submitted += 1
        if submitted > 1:
            slam.collect_chunk()  # chunk c-1: depth-2 pipeline
    if submitted:
        slam.collect_chunk()  # the final chunk


def _bench_chunked(args, cfg, K_t, frames, lc=False):
    """Full SLAM via the chunked device-resident front-end: one dispatch +
    one transfer per chunk (models/chunked_slam.py); keyframe switches
    (forced once per chunk, matching slam mode's cadence) replay through
    the graph backend on the host.

    lc=True (mode chunked-lc) runs the COMPLETE IROS13 system: radius
    candidate search + batched two-stage validation + interleaved graph
    solves, all inside the timed loop. The orbit ring keeps every keyframe
    inside the search radius, so candidate counts grow with the map — the
    worst-case (and realistic revisiting) load."""
    from dvo_slam_tpu.config import SlamConfig
    from dvo_slam_tpu.models.chunked_slam import ChunkedKeyframeSlam

    import jax.numpy as jnp

    slam_cfg = SlamConfig()  # defaults incl. the windowed LocalMap solve
    n_ring = len(frames)
    chunk = args.chunk

    # Pre-stage per-chunk device tensors (ring-rotated so chunks differ):
    # raw-frame upload is I/O, not SLAM — the other modes pre-upload the
    # ring for the same reason (and over the axon tunnel a 16-frame chunk
    # upload costs more than tracking it).
    n_chunks = (args.frames + chunk - 1) // chunk
    staged = []
    for c in range(n_chunks):
        sel = [frames[(c * chunk + j) % n_ring] for j in range(chunk)]
        staged.append((
            jnp.asarray(np.stack([s[0] for s in sel])),
            jnp.asarray(np.stack([s[1] for s in sel])),
        ))

    def run(slam, chunks, t_base):
        _run_pipelined(slam, chunks, chunk, t_base)

    def make():
        return ChunkedKeyframeSlam(K_t, cfg, slam_cfg, enable_loop_closure=lc)

    # Warmup over the FULL workload: the pose-graph solver is cropped to
    # power-of-two buckets of the ACTIVE graph, so keyframe growth crosses
    # bucket boundaries mid-run (one recompile each, O(log N) per run) —
    # and with loop closure the candidate buckets grow too. A short warm
    # run would leave those compiles inside the timed region.
    warm = make()
    warm.init()
    run(warm, staged, 0.0)
    warm.finish()

    slam = make()
    slam.init()
    t0 = time.perf_counter()
    run(slam, staged, 100.0)
    elapsed = time.perf_counter() - t0
    args_frames = n_chunks * chunk
    note = (f"elapsed={elapsed:.3f}s chunk={chunk} "
            f"keyframes={len(slam.keyframes)} "
            f"loop_edges={slam.num_loop_edges} "
            f"ms_per_frame={1000 * elapsed / args_frames:.2f} "
            "(one host round trip per chunk"
            + (", loop closure ON)" if lc else ")"))
    return args_frames / elapsed, note


def _bench_live(args, cfg, K_t, frames, lc=False):
    """The deployable LIVE surface end to end: a real socket session
    against the node (unix socket, chunked engine via serve(chunk=N)) —
    f32 frames over the wire, chunked dispatches to the device, pose
    messages back, finish() trajectory. Timed from first frame sent to
    trajectory received; includes socket transport, host buffering, and
    every device transfer. This is VERDICT r3 #2's row: the node is no
    longer limited to the 9.9 fps per-frame path over the tunnel.

    Pose LATENCY (the chunk knob's other axis) is measured per frame: a
    reader thread timestamps every pose message as it leaves the socket,
    and latency = arrival - send of the frame with the same timestamp.
    With --rate R sends are paced (deployment-shaped: latency is
    buffering + engine lag); unpaced sends measure throughput, so their
    latency is queueing against the engine — reported, but not a
    deployment number."""
    import socket
    import tempfile
    import threading

    from dvo_slam_tpu import node as node_mod
    from dvo_slam_tpu.config import SlamConfig

    slam_cfg = SlamConfig()
    n_ring = len(frames)
    chunk = args.chunk

    if args.enc == "f32":
        send_frames = frames
    else:
        # Sensor-native wire payloads (u8 intensity + u16/12-bit-packed
        # depth ticks) stay raw through the socket AND the device upload.
        from dvo_slam_tpu.ops.pyramid import pack_depth12

        send_frames = []
        for ii, zz in frames:
            raw_z = np.nan_to_num(zz * 5000.0, nan=0.0).astype(np.uint16)
            if args.enc == "raw12":
                raw_z = pack_depth12(raw_z)
            send_frames.append(
                (np.clip(ii, 0, 255).astype(np.uint8), raw_z))

    def run_session(sock_path):
        client = None
        for _ in range(200):
            try:
                client = node_mod.StreamClient.connect_unix(sock_path)
                break
            except (FileNotFoundError, ConnectionRefusedError):
                time.sleep(0.05)
        assert client is not None, "node did not come up"

        # All socket reads happen in ONE thread (timestamping pose
        # arrivals); the finish command is sent raw so the main thread
        # never touches the read file.
        recv: list = []  # (arrival perf_counter, msg)
        import json as _json

        def reader():
            while True:
                line = client._rfile.readline()
                if not line:
                    return
                msg = _json.loads(line)
                recv.append((time.perf_counter(), msg))
                if "trajectory" in msg:
                    return

        th = threading.Thread(target=reader, daemon=True)
        th.start()

        send_t = {}
        period = 1.0 / args.rate if args.rate > 0 else 0.0
        t0 = time.perf_counter()
        for i in range(args.frames):
            if period:
                # Sensor pacing against the SCHEDULE, not the previous
                # send (a real camera does not slow down when we lag).
                due = t0 + i * period
                now = time.perf_counter()
                if due > now:
                    time.sleep(due - now)
            ii, zz = send_frames[i % n_ring]
            ts = 100.0 + i / 30.0
            send_t[ts] = time.perf_counter()
            client.send_frame_nowait(ts, ii, zz, enc=args.enc)
        client.sock.sendall(b'{"cmd": "finish"}\n')
        th.join(timeout=300)
        assert recv and "trajectory" in recv[-1][1], "no trajectory reply"
        elapsed = recv[-1][0] - t0
        poses = [(at, m) for at, m in recv if "pose" in m]
        lat = sorted(at - send_t[m["t"]] for at, m in poses
                     if m["t"] in send_t)
        n_traj = len(recv[-1][1].get("trajectory", []))
        client.close()
        lat_stats = ((lat[len(lat) // 2], lat[int(len(lat) * 0.95)],
                      lat[-1]) if lat else (0.0, 0.0, 0.0))
        return elapsed, len(poses), n_traj, lat_stats

    results = {}
    for tag in ("warm", "timed"):
        sock_path = tempfile.mktemp(suffix=".dvo.sock")
        server = threading.Thread(
            target=node_mod.serve,
            args=(sock_path, K_t),
            kwargs=dict(tracker_cfg=cfg, slam_cfg=slam_cfg,
                        mode="slam" if lc else "keyframe",
                        unix=True, max_sessions=1, chunk=chunk,
                        stage_eagerly=args.stage_eager),
            daemon=True,
        )
        server.start()
        results[tag] = run_session(sock_path)
        server.join(timeout=60)

    elapsed, n_msgs, n_traj, (lat_p50, lat_p95, lat_max) = results["timed"]
    assert n_msgs == args.frames, (n_msgs, args.frames)
    assert n_traj == args.frames, n_traj
    note = (f"elapsed={elapsed:.3f}s chunk={chunk} socket-session "
            f"pose_msgs={n_msgs} enc={args.enc} "
            f"rate={args.rate or 'unpaced'} "
            f"{'stage=eager ' if args.stage_eager else ''}"
            f"latency_ms p50={1000 * lat_p50:.0f} p95={1000 * lat_p95:.0f} "
            f"max={1000 * lat_max:.0f} "
            f"ms_per_frame={1000 * elapsed / args.frames:.2f} "
            "(full live node: socket + chunked engine"
            + (", loop closure ON)" if lc else ")"))
    return args.frames / elapsed, note


def _bench_stream(args, cfg, K_t, frames, lc=False):
    """Full SLAM pipeline fps INCLUDING host->device frame upload.

    The other modes pre-stage frames on device (upload is I/O, not SLAM);
    this mode measures the deployable streaming pipeline instead: chunks
    live on the host as RAW sensor data (uint8 intensity + uint16 depth —
    3 bytes/pixel instead of the f32 pair's 8; conversion happens on
    device inside the scan), and chunk k+1's `jax.device_put` is issued
    BEFORE chunk k is consumed, so the transfer rides under the chunk's
    compute + backend walk (the reference's ROS ingest pipeline gave it
    the same ingest/compute overlap for free; SURVEY.md §2.5 P4 / R1)."""
    import jax

    from dvo_slam_tpu.config import SlamConfig
    from dvo_slam_tpu.models.chunked_slam import ChunkedKeyframeSlam

    slam_cfg = SlamConfig()
    n_ring = len(frames)
    chunk = args.chunk
    n_chunks = (args.frames + chunk - 1) // chunk

    # Host-side RAW chunks (what a sensor/dataset loader produces).
    from dvo_slam_tpu.ops.pyramid import pack_depth12

    raw = []
    for c in range(n_chunks):
        sel = [frames[(c * chunk + j) % n_ring] for j in range(chunk)]
        ints = np.stack([s[0] for s in sel])
        deps = np.stack([s[1] for s in sel])
        raw_z = np.nan_to_num(deps * 5000.0, nan=0.0).astype(np.uint16)
        if args.pack12:
            # 12-bit packed ticks: 1.5 B/px depth on the wire (+-1.6 mm
            # quantization, far below sensor noise); device-side unpack
            # fuses into build_pyramid.
            raw_z = pack_depth12(raw_z)
        raw.append((np.clip(ints, 0, 255).astype(np.uint8), raw_z))

    def staged_chunks():
        # Double-buffered upload: chunk c+1's jax.device_put is issued
        # when chunk c is pulled for submission, so the transfer rides
        # under chunk c's compute + backend walk.
        staged = jax.device_put(raw[0])
        for c in range(n_chunks):
            cur = staged
            if c + 1 < n_chunks:
                staged = jax.device_put(raw[c + 1])
            yield cur

    def run(slam, t_base):
        _run_pipelined(slam, staged_chunks(), chunk, t_base)

    warm = ChunkedKeyframeSlam(K_t, cfg, slam_cfg, enable_loop_closure=lc)
    warm.init()
    run(warm, 0.0)
    warm.finish()

    slam = ChunkedKeyframeSlam(K_t, cfg, slam_cfg, enable_loop_closure=lc)
    slam.init()
    t0 = time.perf_counter()
    run(slam, 100.0)
    elapsed = time.perf_counter() - t0
    total = n_chunks * chunk
    note = (f"elapsed={elapsed:.3f}s chunk={chunk} "
            f"keyframes={len(slam.keyframes)} "
            f"loop_edges={slam.num_loop_edges} "
            f"ms_per_frame={1000 * elapsed / total:.2f} "
            "(UPLOAD INCLUDED: raw u8/"
            + ("u12-packed" if args.pack12 else "u16")
            + " chunks, double-buffered"
            + (", loop closure ON)" if lc else ")"))
    return total / elapsed, note


def _bench_slam(args, cfg, K_t, frames, lc=False):
    """Full SLAM orchestration fps: dual alignment + entropy-ratio keyframe
    decisions + (async) pose-graph upkeep, host loop included. lc=True
    adds radius search + batched two-stage loop-closure validation."""
    from dvo_slam_tpu.config import SlamConfig
    from dvo_slam_tpu.models.keyframe_tracker import KeyframeSlam

    slam_cfg = SlamConfig()
    n_ring = len(frames)

    def run(slam, n, t_base):
        for k in range(n):
            i, z = frames[k % n_ring]
            if k > 0 and k % 16 == 0:
                slam.force_keyframe()  # exercise switch + graph + local map
            slam.update(i, z, t_base + k / 30.0)

    warm = KeyframeSlam(K_t, cfg, slam_cfg, enable_loop_closure=lc)
    warm.init()
    # Candidate counts / solver buckets grow over the run — warm the full
    # workload (see _bench_chunked).
    run(warm, args.frames, 0.0)

    slam = KeyframeSlam(K_t, cfg, slam_cfg, enable_loop_closure=lc)
    slam.init()
    t0 = time.perf_counter()
    run(slam, args.frames, 100.0)
    elapsed = time.perf_counter() - t0
    note = (f"elapsed={elapsed:.3f}s keyframes={len(slam.keyframes)} "
            f"loop_edges={slam.num_loop_edges} "
            f"ms_per_frame={1000 * elapsed / args.frames:.2f} "
            "(includes per-frame host round trips"
            + (", loop closure ON)" if lc else ")"))
    return args.frames / elapsed, note


if __name__ == "__main__":
    main()
