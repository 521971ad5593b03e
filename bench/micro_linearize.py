"""Microbenchmark: where does an IRLS iteration's time go at level 1?

Ablates ops/linearize.py stage by stage on the real device. Every variant
chains K iterations inside ONE jitted scan with the pose perturbed by the
previous output (elision-proof: the runtime can neither skip nor
deduplicate any step), and the timed loop feeds distinct pre-staged
slabs. Levels: L1 = 320x240 (the dominant tracked level at the default
first_level=3..last_level=1 schedule).

Usage: python bench/micro_linearize.py [--level 1] [--iters 50] [--reps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# Runnable as `python bench/micro_linearize.py` without installing the
# package: script mode puts bench/ (not the repo root) on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument("--iters", type=int, default=50,
                    help="chained linearize iterations per dispatch")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dvo_slam_tpu.config import TrackerConfig
    from dvo_slam_tpu.ops import camera, linearize as lin_mod, pyramid, se3
    from dvo_slam_tpu.ops.pallas import sampler as pallas_sampler
    from dvo_slam_tpu.utils import se3_np, synthetic

    W, H = args.width, args.height
    lvl = args.level
    on_tpu = jax.devices()[0].platform == "tpu"
    backend = "pallas" if on_tpu else "gather"

    K_t = (525.0 * W / 640.0, 525.0 * H / 480.0, (W - 1) / 2.0, (H - 1) / 2.0)
    Ks = camera.pyramid_intrinsics(camera.intrinsics(*K_t), 4)
    scene = synthetic.two_plane_scene()
    i0, z0 = scene.render(np.asarray(K_t), W, H, np.eye(4))
    xi = np.array([0.004, -0.003, 0.002, 0.002, -0.001, 0.002])
    i1, z1 = scene.render(np.asarray(K_t), W, H,
                          se3_np.inverse(se3_np.exp(xi)))

    ref_pyr = pyramid.build_pyramid(jnp.asarray(i0), jnp.asarray(z0), 4)
    cur_pyr = pyramid.build_pyramid(jnp.asarray(i1), jnp.asarray(z1), 4)
    ref_slab, cur_slab = ref_pyr[lvl], cur_pyr[lvl]
    Klvl = Ks[lvl]
    Hl, Wl = ref_slab.shape[1], ref_slab.shape[2]
    N = Hl * Wl
    print(f"# level {lvl}: {Wl}x{Hl} ({N} pts), backend={backend}",
          file=sys.stderr)

    def make_cfg(**kw):
        base = dict(sampler_backend=backend)
        base.update(kw)
        return TrackerConfig(**base)

    def run_variant(name, cfg, mode="full"):
        ref = lin_mod.prepare_reference(ref_slab, Klvl, cfg)
        cmajor = None
        if cfg.sampler_backend == "pallas":
            dt = (jnp.bfloat16 if cfg.pallas_precision == "default"
                  else None)
            if cfg.gradient_source == "reference":
                n_s = 2 if cfg.use_depth else 1
                cmajor = pallas_sampler.slab_to_cmajor(cur_slab[:n_s],
                                                       dtype=dt)
            else:
                cmajor = pallas_sampler.slab_to_cmajor(cur_slab, dtype=dt)

        T0 = jnp.eye(4, dtype=jnp.float32)

        if mode == "sample_only":
            # Just warp + sample + reduce: isolates the sampler+warp cost.
            def step(T, _):
                K = Klvl
                fx, fy, cx, cy = K[0], K[1], K[2], K[3]
                R, t = T[:3, :3], T[:3, 3]
                X = R[0, 0] * ref.px + R[0, 1] * ref.py + R[0, 2] * ref.pz + t[0]
                Y = R[1, 0] * ref.px + R[1, 1] * ref.py + R[1, 2] * ref.pz + t[1]
                Z = R[2, 0] * ref.px + R[2, 1] * ref.py + R[2, 2] * ref.pz + t[2]
                zi = 1.0 / jnp.where(jnp.abs(Z) < 1e-8, 1e-8, Z)
                u = fx * X * zi + cx
                v = fy * Y * zi + cy
                if cfg.sampler_backend == "pallas":
                    C = (cur_slab.shape[0]
                         if cfg.gradient_source == "current"
                         else (2 if cfg.use_depth else 1))
                    rpt, cpt = pallas_sampler.select_tiling(
                        Hl, Wl, cfg.pallas_rows_per_tile,
                        cfg.pallas_cols_per_tile, cfg.pallas_margin)
                    smp, inb, _ = pallas_sampler.sample_slab(
                        cmajor, u, v, height=Hl, width=Wl, channels=C,
                        rows_per_tile=rpt, cols_per_tile=cpt,
                        margin=cfg.pallas_margin,
                        interpret=not on_tpu)
                    s = smp.sum() + inb.sum()
                else:
                    chans, inb = lin_mod._sample_gather(cur_slab, u, v)
                    s = sum(c.sum() for c in chans) + inb.sum()
                # Chain: perturb T by a value derived from the sample sum.
                dT = se3.exp(jnp.full((6,), 1e-12) * (s % 1.0))
                return T @ dT, s

            fn = jax.jit(lambda T: jax.lax.scan(
                step, T, None, length=args.iters)[1][-1])
        else:
            def step(T, _):
                lin = lin_mod.linearize(ref, cur_slab, Klvl, T, cfg,
                                        cur_cmajor=cmajor)
                # Solve + retraction, like the real IRLS loop.
                xi = jnp.linalg.solve(
                    lin.A + 1e-6 * jnp.eye(6), lin.b[:, None])[:, 0]
                return T @ se3.exp(-1e-6 * xi), lin.err_mean

            fn = jax.jit(lambda T: jax.lax.scan(
                step, T, None, length=args.iters)[1][-1])

        # Warm up (compile), then time with a real value fetch per rep.
        _ = np.asarray(fn(T0))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = np.asarray(fn(T0))
        dt_s = (time.perf_counter() - t0) / args.reps
        us_per_iter = dt_s / args.iters * 1e6
        print(f"{name:42s} {us_per_iter:8.1f} us/iter   "
              f"(dispatch {dt_s*1e3:.2f} ms, out={float(out):.3g})")
        return us_per_iter

    print(f"# chained x{args.iters} per dispatch, {args.reps} reps")
    run_variant("full (default cfg)", make_cfg())
    run_variant("gradient_source=reference", make_cfg(
        gradient_source="reference"))
    run_variant("scale_iters=1", make_cfg(tdist_scale_iters=1))
    run_variant("scale_iters=0", make_cfg(tdist_scale_iters=0))
    run_variant("no weighting", make_cfg(use_weighting=False))
    run_variant("no depth (photometric)", make_cfg(use_depth=False))
    run_variant("no depth + ref grads", make_cfg(
        use_depth=False, gradient_source="reference"))
    run_variant("sample+warp only", make_cfg(), mode="sample_only")
    run_variant("sample+warp only (ref grads)",
                make_cfg(gradient_source="reference"), mode="sample_only")
    # Fewer sampled channels shrink the per-band matmul, so the grid-step
    # count (≈ per-band fixed overhead) may become the binding constraint:
    # sweep the band size in both modes.
    for rpt in (4, 16, 24):
        for gs in ("current", "reference"):
            run_variant(f"sample only rpt={rpt} ({gs[:3]} grads)",
                        make_cfg(pallas_rows_per_tile=rpt,
                                 gradient_source=gs),
                        mode="sample_only")
    # Column-window tile-shape sweep (round 4: 2-D windowed tiles).
    for rpt, cpt in ((8, 0), (8, 40), (8, 64), (8, 80), (8, 160),
                     (16, 40), (16, 80)):
        run_variant(f"sample only rpt={rpt} cpt={cpt}",
                    make_cfg(pallas_rows_per_tile=rpt,
                             pallas_cols_per_tile=cpt),
                    mode="sample_only")
        run_variant(f"full iter rpt={rpt} cpt={cpt}",
                    make_cfg(pallas_rows_per_tile=rpt,
                             pallas_cols_per_tile=cpt))


if __name__ == "__main__":
    main()
