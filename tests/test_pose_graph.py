"""Pose-graph optimizer tests (the g2o replacement)."""

import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.models import pose_graph
from dvo_slam_tpu.utils import se3_np


def _chain_graph(n=8, drift=0.02, seed=0, max_v=16, max_e=32, loop=True):
    """Ground-truth circle of poses; odometry edges corrupted by drift;
    one exact loop-closure edge from last to first."""
    rng = np.random.default_rng(seed)
    gt = []
    for k in range(n):
        a = 2 * np.pi * k / n
        gt.append(se3_np.exp(np.array([np.sin(a), 1 - np.cos(a), 0.1 * np.sin(a),
                                       0, 0, a * 0.0])))
    g = pose_graph.empty_graph(max_v, max_e)
    poses = g.poses
    # Initialize vertices by integrating the NOISY odometry.
    T_est = [np.eye(4)]
    edges = []
    for k in range(n - 1):
        Z_true = se3_np.inverse(gt[k]) @ gt[k + 1]
        noise = se3_np.exp(rng.normal(scale=drift, size=6))
        Z_noisy = Z_true @ noise
        T_est.append(T_est[-1] @ Z_noisy)
        edges.append((k, k + 1, Z_noisy, np.eye(6) * 1e2))
    if loop:
        Z_loop = se3_np.inverse(gt[-1]) @ gt[0]
        edges.append((n - 1, 0, Z_loop, np.eye(6) * 1e4))

    for k in range(n):
        poses = poses.at[k].set(jnp.asarray(T_est[k] if k else np.eye(4), jnp.float32))
    ei = g.edge_i
    ej = g.edge_j
    Z = g.measurements
    info = g.information
    mask = g.edge_mask
    for e, (i, j, Zm, I) in enumerate(edges):
        ei = ei.at[e].set(i)
        ej = ej.at[e].set(j)
        Z = Z.at[e].set(jnp.asarray(Zm, jnp.float32))
        info = info.at[e].set(jnp.asarray(I, jnp.float32))
        mask = mask.at[e].set(True)
    g = g._replace(
        poses=poses, num_vertices=jnp.asarray(n, jnp.int32),
        edge_i=ei, edge_j=ej, measurements=Z, information=info,
        edge_mask=mask, num_edges=jnp.asarray(len(edges), jnp.int32),
    )
    return g, gt, T_est


def test_residual_zero_for_consistent_edge():
    T_i = jnp.asarray(se3_np.exp(np.array([0.1, 0.2, -0.1, 0.05, 0.0, 0.1])), jnp.float32)
    T_j = jnp.asarray(se3_np.exp(np.array([-0.2, 0.1, 0.3, 0.0, 0.1, -0.05])), jnp.float32)
    Z = jnp.asarray(
        se3_np.inverse(np.asarray(T_i, np.float64)) @ np.asarray(T_j, np.float64),
        jnp.float32,
    )
    e = pose_graph.edge_residual(T_i, T_j, Z)
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-5)


def test_optimize_reduces_chi2_and_closes_loop():
    g, gt, T_init = _chain_graph(n=8, drift=0.03)
    chi2_before = float(
        (np.asarray(pose_graph.edge_chi2(g)) * np.asarray(g.edge_mask)).sum()
    )
    # Batch solve of a whole drifted chain: anneal the robust kernel so the
    # (correct, large-residual) loop edge is not crushed at initialization.
    g_opt, chi2_after, _ = pose_graph.optimize(g, iterations=30, gnc_init=64.0)
    assert float(chi2_after) < chi2_before

    # Loop closure must pull the end of the chain back: the optimized
    # last-to-first relative pose should match the exact loop measurement
    # much better than the drifted initialization did.
    def loop_err(poses):
        T_last = np.asarray(poses[7], np.float64)
        T_first = np.asarray(poses[0], np.float64)
        Z_loop = se3_np.inverse(gt[-1]) @ gt[0]
        return np.linalg.norm(
            se3_np.log(se3_np.inverse(Z_loop) @ se3_np.inverse(T_last) @ T_first)
        )

    err_before = loop_err(np.asarray(g.poses))
    err_after = loop_err(np.asarray(g_opt.poses))
    assert err_after < 0.3 * err_before, (err_before, err_after)
    # Gauge: vertex 0 stays (approximately) fixed.
    np.testing.assert_allclose(np.asarray(g_opt.poses[0]), np.eye(4), atol=1e-3)


def test_optimize_noop_on_consistent_graph():
    """A graph whose edges exactly match its poses must stay put."""
    g, gt, _ = _chain_graph(n=6, drift=0.0, loop=True)
    g_opt, chi2, _ = pose_graph.optimize(g, iterations=10)
    assert float(chi2) < 1e-4
    for k in range(6):
        np.testing.assert_allclose(
            np.asarray(g_opt.poses[k]), np.asarray(g.poses[k]), atol=5e-3
        )


def test_padding_invariance():
    """Padded (inactive) vertices/edges must not change the solution."""
    g_small, _, _ = _chain_graph(n=6, drift=0.02, max_v=8, max_e=16)
    g_big, _, _ = _chain_graph(n=6, drift=0.02, max_v=32, max_e=64)
    o_small, _, _ = pose_graph.optimize(g_small, iterations=15)
    o_big, _, _ = pose_graph.optimize(g_big, iterations=15)
    np.testing.assert_allclose(
        np.asarray(o_small.poses[:6]), np.asarray(o_big.poses[:6]), atol=2e-4
    )


def test_robust_kernel_rejects_false_loop():
    """A wildly wrong loop edge with a Cauchy kernel must not destroy the
    trajectory; its robust weight must collapse."""
    g, gt, _ = _chain_graph(n=8, drift=0.01, max_e=32)
    e = int(g.num_edges)
    bad_Z = se3_np.exp(np.array([1.5, -1.0, 0.8, 0.5, -0.4, 0.9]))
    g = g._replace(
        edge_i=g.edge_i.at[e].set(2),
        edge_j=g.edge_j.at[e].set(6),
        measurements=g.measurements.at[e].set(jnp.asarray(bad_Z, jnp.float32)),
        information=g.information.at[e].set(jnp.eye(6) * 1e4),
        edge_mask=g.edge_mask.at[e].set(True),
        num_edges=jnp.asarray(e + 1, jnp.int32),
    )
    g_opt, _, weights = pose_graph.optimize(g, iterations=30, use_robust=True)
    w = np.asarray(weights)
    assert w[e] < 0.05, f"false loop edge weight {w[e]}"
    # Odometry edges keep healthy weights.
    assert np.asarray(weights)[:7].min() > 0.3


def test_cg_solver_matches_dense():
    """The matrix-free block-Jacobi CG path (large-M scaling,
    SlamConfig.graph_cg_threshold) must reach the dense Cholesky
    solution on the same drifted chain."""
    g, gt, _ = _chain_graph(n=8, drift=0.03)
    dense, chi2_d, w_d = pose_graph.optimize(g, iterations=30, gnc_init=64.0)
    cg, chi2_c, w_c = pose_graph.optimize(g, iterations=30, gnc_init=64.0,
                                          solver="cg")
    # Same optimum: chi2 within a few percent, poses within mm/mrad.
    assert float(chi2_c) <= 1.05 * float(chi2_d) + 1e-6
    np.testing.assert_allclose(
        np.asarray(cg.poses[:8]), np.asarray(dense.poses[:8]), atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(w_c), np.asarray(w_d), atol=5e-2)


def test_cg_solver_padding_invariance():
    """CG must ignore inactive (padded) vertices/edges like dense does."""
    g_small, _, _ = _chain_graph(n=6, drift=0.02, max_v=8, max_e=16)
    g_big, _, _ = _chain_graph(n=6, drift=0.02, max_v=32, max_e=64)
    o_small, _, _ = pose_graph.optimize(g_small, iterations=15, solver="cg")
    o_big, _, _ = pose_graph.optimize(g_big, iterations=15, solver="cg")
    np.testing.assert_allclose(
        np.asarray(o_small.poses[:6]), np.asarray(o_big.poses[:6]), atol=5e-4
    )


def test_adaptive_gnc_recovers_high_information_loop():
    """Regression (round 3): tracker information scales with pixel count,
    so at 640x480 a correct loop edge carrying accumulated drift can sit
    at chi2 ~ 10^3-10^4 — a FIXED GNC anneal leaves its Cauchy weight ~0
    and the loop never closes (full SLAM silently degraded to odometry).
    gnc_adaptive must size the initial kernel width from the data."""
    g, gt, _ = _chain_graph(n=8, drift=0.05)
    # Scale ALL information to full-frame magnitudes (the tracker's
    # JTWJ over ~3e5 pixels): chi2 per edge grows ~1e4.
    g = g._replace(information=g.information * 1e4)

    fixed, _, w_fixed = pose_graph.optimize(g, iterations=30, gnc_init=16.0)
    adapt, _, w_adapt = pose_graph.optimize(g, iterations=30, gnc_init=16.0,
                                            gnc_adaptive=True)
    loop = int(np.asarray(g.num_edges)) - 1  # last edge = the loop edge

    # The fixed anneal crushes the loop edge (this is the failure mode).
    assert float(np.asarray(w_fixed)[loop]) < 0.05
    # Adaptive GNC lets it pull: healthy final weight and a closed loop.
    assert float(np.asarray(w_adapt)[loop]) > 0.5

    def loop_gap(poses):
        T_last = np.asarray(poses[7], np.float64)
        T_first = np.asarray(poses[0], np.float64)
        Z_loop = se3_np.inverse(gt[-1]) @ gt[0]
        return np.linalg.norm(se3_np.log(
            se3_np.inverse(Z_loop) @ se3_np.inverse(T_last) @ T_first
        ))

    assert loop_gap(np.asarray(adapt.poses)) < 0.3 * loop_gap(
        np.asarray(fixed.poses)
    )
