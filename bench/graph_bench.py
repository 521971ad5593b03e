"""Pose-graph solve-time scaling benchmark.

Measures `pose_graph.optimize` wall time vs graph size (a noisy keyframe
ring with chain + loop-closure edges, the shape real runs produce) and the
padded-vs-cropped cost gap the orchestrator's `_solve_view` removes
(reference analog: g2o factorizes exactly the active sparse system every
time — CSparse/Cholmod in dvo_slam/src/keyframe_graph.cpp, SURVEY.md §4.6).

Run: python bench/graph_bench.py [--sizes 64 128 256 512 1024] [--iters 20]
Prints one line per configuration; results belong in docs/performance.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# script mode puts bench/ (not the repo root) on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_ring_graph(M, loop_every=8, noise=0.01, seed=0):
    """Noisy ring of M keyframes: M-1 chain edges + ~M/loop_every loop
    edges, ground-truth poses on a circle (drifted initialization)."""
    import jax.numpy as jnp

    from dvo_slam_tpu.models import pose_graph
    from dvo_slam_tpu.utils import se3_np

    rng = np.random.default_rng(seed)
    gt = []
    for k in range(M):
        a = 2 * np.pi * k / M
        T = np.eye(4)
        T[:3, 3] = (np.cos(a), np.sin(a), 0.0)
        c, s = np.cos(a), np.sin(a)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        gt.append(T)

    ei, ej, Z = [], [], []
    for k in range(M - 1):
        ei.append(k); ej.append(k + 1)
        Z.append(se3_np.inverse(gt[k]) @ gt[k + 1])
    for k in range(loop_every, M, loop_every):
        i = k - loop_every
        ei.append(i); ej.append(k)
        Z.append(se3_np.inverse(gt[i]) @ gt[k])
    E = len(ei)

    g = pose_graph.empty_graph(M, max(64, 1 << (E - 1).bit_length()))
    # Drifted initialization: accumulate chain edges with noise.
    poses = np.tile(np.eye(4, dtype=np.float32), (M, 1, 1))
    T = np.eye(4)
    for k in range(M):
        if k > 0:
            d = rng.normal(scale=noise, size=6)
            T = T @ Z[k - 1] @ se3_np.exp(d)
        poses[k] = T.astype(np.float32)
    g = g._replace(
        poses=jnp.asarray(poses),
        num_vertices=jnp.asarray(M, jnp.int32),
        edge_i=g.edge_i.at[:E].set(jnp.asarray(ei)),
        edge_j=g.edge_j.at[:E].set(jnp.asarray(ej)),
        measurements=g.measurements.at[:E].set(
            jnp.asarray(np.stack(Z).astype(np.float32))
        ),
        edge_mask=g.edge_mask.at[:E].set(True),
        num_edges=jnp.asarray(E, jnp.int32),
    )
    return g


def time_solve(graph, iters, reps=3, solver="dense"):
    import jax
    import jax.numpy as jnp

    from dvo_slam_tpu.models import pose_graph

    # Distinct inputs per rep: repeated identical dispatches get elided by
    # the runtime and read arbitrarily fast (same guard as bench.py).
    rng = np.random.default_rng(1)
    variants = []
    for _ in range(reps + 1):
        d = rng.normal(scale=1e-4, size=(graph.poses.shape[0], 3))
        p = np.asarray(graph.poses).copy()
        p[:, :3, 3] += d.astype(np.float32)
        variants.append(graph._replace(poses=jnp.asarray(p)))

    _, chi2, _ = pose_graph.optimize(variants[0], iterations=iters,
                                     solver=solver)  # compile
    jax.block_until_ready(chi2)
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        _, chi2, _ = pose_graph.optimize(variants[r], iterations=iters,
                                         solver=solver)
        jax.block_until_ready(chi2)
    return (time.perf_counter() - t0) / reps, float(chi2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[64, 128, 256, 512, 1024])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--solver", choices=["dense", "cg"], default="dense")
    ap.add_argument("--active", type=int, default=30,
                    help="active size for the padded-vs-cropped comparison")
    args = ap.parse_args()

    import jax

    from dvo_slam_tpu.models import pose_graph

    print(f"# device={jax.devices()[0].platform} iters={args.iters}")
    print(f"{'M':>6} {'E':>6} {'ms/solve':>10} {'ms/LM-iter':>10} {'chi2':>12}")
    for M in args.sizes:
        g = make_ring_graph(M)
        dt, chi2 = time_solve(g, args.iters, solver=args.solver)
        E = int(g.num_edges)
        print(f"{M:>6} {E:>6} {1000 * dt:>10.1f} "
              f"{1000 * dt / args.iters:>10.2f} {chi2:>12.4g}")

    # Padded-vs-cropped: the same ACTIVE graph solved inside each pad.
    n = args.active
    print(f"\n# active graph: {n} vertices solved inside each padded capacity")
    print(f"{'pad M':>6} {'ms/solve':>10}")
    base = make_ring_graph(n)
    for M in args.sizes:
        if M < n:
            continue
        g = pose_graph.grow(base, max_vertices=M, max_edges=4 * M)
        dt, _ = time_solve(g, args.iters, solver=args.solver)
        print(f"{M:>6} {1000 * dt:>10.1f}")
    Mb = pose_graph.bucket(n, 16)
    g = pose_graph.grow(base, max_vertices=Mb)
    dt, _ = time_solve(g, args.iters, solver=args.solver)
    print(f"# cropped bucket ({Mb}): {1000 * dt:.1f} ms "
          "(what the orchestrator's _solve_view dispatches)")


if __name__ == "__main__":
    main()
