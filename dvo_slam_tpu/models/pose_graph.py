"""Batched device-resident SE(3) pose-graph optimizer — the g2o replacement.

TPU-native equivalent of the reference's global backend
(dvo_slam/src/keyframe_graph.cpp: g2o SparseOptimizer with VertexSE3 /
EdgeSE3, Levenberg-Marquardt, CSparse/Cholmod linear solver, optional Cauchy
robust kernel; SURVEY.md §4.6). Keyframe graphs here are small (tens to a
few hundred vertices), so instead of a sparse host solver the whole problem
lives on device with fixed padded shapes:

  * vertices: (M, 4, 4) poses, first vertex gauge-fixed by a strong prior;
  * edges: (E,) index pairs + (E, 4, 4) relative measurements + (E, 6, 6)
    information matrices + validity mask;
  * per-edge residual e = log(Z^{-1} T_i^{-1} T_j), Jacobians by forward-
    mode autodiff (exact, vmapped — no hand-derived approximations);
  * dense 6M x 6M Gauss-Newton system assembled by scatter-add, solved by
    Cholesky; adaptive Levenberg-Marquardt with accept/reject on robust
    chi^2 inside a lax.while_loop.

Dynamic graph growth is handled by padding (SURVEY.md §8.3.5): the jitted
solver never recompiles as keyframes/edges are added, because shapes are
fixed at (max_keyframes, max_edges).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.ops import se3

_GAUGE_WEIGHT = 1e6
_JITTER = 1e-6


class PoseGraph(NamedTuple):
    """Padded pose-graph state (a pytree; device-resident)."""

    poses: jnp.ndarray  # (M, 4, 4) vertex poses (world <- keyframe)
    num_vertices: jnp.ndarray  # () int32
    edge_i: jnp.ndarray  # (E,) int32 source vertex
    edge_j: jnp.ndarray  # (E,) int32 target vertex
    measurements: jnp.ndarray  # (E, 4, 4) Z: T_i^{-1} T_j measured
    information: jnp.ndarray  # (E, 6, 6)
    edge_mask: jnp.ndarray  # (E,) bool
    num_edges: jnp.ndarray  # () int32


def empty_graph(max_vertices: int, max_edges: int) -> PoseGraph:
    return PoseGraph(
        poses=jnp.tile(jnp.eye(4, dtype=jnp.float32), (max_vertices, 1, 1)),
        num_vertices=jnp.asarray(0, jnp.int32),
        edge_i=jnp.zeros(max_edges, jnp.int32),
        edge_j=jnp.zeros(max_edges, jnp.int32),
        measurements=jnp.tile(jnp.eye(4, dtype=jnp.float32), (max_edges, 1, 1)),
        information=jnp.tile(jnp.eye(6, dtype=jnp.float32), (max_edges, 1, 1)),
        edge_mask=jnp.zeros(max_edges, bool),
        num_edges=jnp.asarray(0, jnp.int32),
    )


def empty_graph_host(max_vertices: int, max_edges: int) -> PoseGraph:
    """Host (numpy) twin of empty_graph for the orchestrator's
    host-resident graph mirror (keyframe_tracker): constructing the
    mirror must not touch the device at all — the jnp form costs a
    dispatch + a full fetch at engine init (and that init fetch is
    where a flaky remoted transport was observed to wedge; see
    docs/performance.md "The live node")."""
    return PoseGraph(
        poses=np.tile(np.eye(4, dtype=np.float32), (max_vertices, 1, 1)),
        num_vertices=np.asarray(0, np.int32),
        edge_i=np.zeros(max_edges, np.int32),
        edge_j=np.zeros(max_edges, np.int32),
        measurements=np.tile(np.eye(4, dtype=np.float32), (max_edges, 1, 1)),
        information=np.tile(np.eye(6, dtype=np.float32), (max_edges, 1, 1)),
        edge_mask=np.zeros(max_edges, bool),
        num_edges=np.asarray(0, np.int32),
    )


def grow(graph: PoseGraph, max_vertices: int = None,
         max_edges: int = None) -> PoseGraph:
    """Re-pad the graph to larger capacities (contents preserved).

    The reference grows g2o graphs dynamically; here capacity is a static
    shape, so growth re-pads (doubling at the call site keeps recompiles
    of `optimize` to O(log N) over a run). Numpy-native: its only caller
    is the HOST-resident mirror, and re-padding must stay a host copy —
    the former jnp form paid a device upload + fetch of the whole padded
    graph per re-pad.
    """
    M_old = graph.poses.shape[0]
    E_old = graph.edge_i.shape[0]
    M = max(max_vertices or M_old, M_old)
    E = max(max_edges or E_old, E_old)
    poses = np.asarray(graph.poses)
    measurements = np.asarray(graph.measurements)
    information = np.asarray(graph.information)
    eye4 = np.eye(4, dtype=poses.dtype)
    eye6 = np.eye(6, dtype=information.dtype)
    return PoseGraph(
        poses=np.concatenate(
            [poses, np.tile(eye4, (M - M_old, 1, 1))]
        ) if M > M_old else poses.copy(),
        num_vertices=np.asarray(graph.num_vertices),
        edge_i=np.pad(np.asarray(graph.edge_i), (0, E - E_old)),
        edge_j=np.pad(np.asarray(graph.edge_j), (0, E - E_old)),
        measurements=np.concatenate(
            [measurements, np.tile(eye4, (E - E_old, 1, 1))]
        ) if E > E_old else measurements.copy(),
        information=np.concatenate(
            [information, np.tile(eye6, (E - E_old, 1, 1))]
        ) if E > E_old else information.copy(),
        edge_mask=np.pad(np.asarray(graph.edge_mask), (0, E - E_old)),
        num_edges=np.asarray(graph.num_edges),
    )


def bucket(n: int, minimum: int) -> int:
    """Next power-of-two capacity >= n (floored at `minimum`).

    Solve cost on a padded graph scales with CAPACITY, not contents (the
    dense 6M x 6M system is materialized at the padded size): callers crop
    the padded arrays to bucket(active_size) before a solve so cost tracks
    the ACTIVE graph, while power-of-two bucketing keeps the number of
    distinct compiled solver shapes O(log N) over a run (the reference's
    g2o/CSparse factorizes exactly the active sparse system every time;
    SURVEY.md §4.6)."""
    b = max(int(minimum), 1)
    while b < n:
        b *= 2
    return b


def crop(graph: PoseGraph, max_vertices: int, max_edges: int) -> PoseGraph:
    """View of the leading [0:max_vertices) x [0:max_edges) region (the
    inverse of grow(); on host-numpy graphs the slices are free views).
    Callers guarantee the active contents fit."""
    M = min(max_vertices, graph.poses.shape[0])
    E = min(max_edges, graph.edge_i.shape[0])
    if M == graph.poses.shape[0] and E == graph.edge_i.shape[0]:
        return graph
    return PoseGraph(
        poses=graph.poses[:M],
        num_vertices=graph.num_vertices,
        edge_i=graph.edge_i[:E],
        edge_j=graph.edge_j[:E],
        measurements=graph.measurements[:E],
        information=graph.information[:E],
        edge_mask=graph.edge_mask[:E],
        num_edges=graph.num_edges,
    )


def edge_residual(T_i, T_j, Z):
    """e = log(Z^{-1} T_i^{-1} T_j) in R^6 (SURVEY.md §4.6)."""
    return se3.log(se3.inverse(Z) @ se3.inverse(T_i) @ T_j)


def _edge_residual_and_jacobians(T_i, T_j, Z):
    """Residual + exact Jacobians wrt LEFT increments on T_i and T_j.

    e(d_i, d_j) = log(Z^{-1} (exp(d_i) T_i)^{-1} exp(d_j) T_j)
    Forward-mode autodiff at (0, 0) — replaces g2o's hand-approximated
    EdgeSE3 Jacobians with exact ones (12 JVP columns per edge, vmapped).
    """

    def f(d):
        d_i, d_j = d[:6], d[6:]
        return edge_residual(se3.exp(d_i) @ T_i, se3.exp(d_j) @ T_j, Z)

    e = edge_residual(T_i, T_j, Z)
    J = jax.jacfwd(f)(jnp.zeros(12, dtype=T_i.dtype))  # (6, 12)
    return e, J[:, :6], J[:, 6:]


def _robust_edge_weight(chi2, cauchy_c, use_robust):
    """Cauchy IRLS weight rho'(s) = 1 / (1 + s / c^2)."""
    w = 1.0 / (1.0 + chi2 / (cauchy_c * cauchy_c))
    return jnp.where(use_robust, w, jnp.ones_like(w))


def _build_blocks(graph: PoseGraph, use_robust, cauchy_c):
    """Per-edge Hessian blocks + per-vertex gradient — the block-sparse
    form of the GN system. Nothing of size (M, M) is materialized: the
    dense path scatters these into a 6Mx6M matrix; the CG path consumes
    them directly as a matvec (its memory is O(E + M), the CSparse-shaped
    scaling the reference gets from g2o; SURVEY.md §4.6)."""
    M = graph.poses.shape[0]

    def per_edge(i, j, Z, info, mask):
        e, Ji, Jj = _edge_residual_and_jacobians(graph.poses[i], graph.poses[j], Z)
        chi2 = e @ info @ e
        w = _robust_edge_weight(chi2, cauchy_c, use_robust) * mask
        return e, Ji, Jj, chi2, w

    e, Ji, Jj, chi2, w = jax.vmap(per_edge)(
        graph.edge_i, graph.edge_j, graph.measurements, graph.information,
        graph.edge_mask.astype(graph.poses.dtype),
    )
    winfo = w[:, None, None] * graph.information  # (E, 6, 6)

    hp = jax.lax.Precision.HIGHEST
    Hii = jnp.einsum("eai,eab,ebj->eij", Ji, winfo, Ji, precision=hp)
    Hjj = jnp.einsum("eai,eab,ebj->eij", Jj, winfo, Jj, precision=hp)
    Hij = jnp.einsum("eai,eab,ebj->eij", Ji, winfo, Jj, precision=hp)
    gi = jnp.einsum("eai,eab,eb->ei", Ji, winfo, e, precision=hp)
    gj = jnp.einsum("eai,eab,eb->ei", Jj, winfo, e, precision=hp)

    g = jnp.zeros((M, 6), dtype=graph.poses.dtype)
    g = g.at[graph.edge_i].add(gi)
    g = g.at[graph.edge_j].add(gj)

    # Extra diagonal blocks beyond the edge contributions: gauge fix on
    # vertex 0 (g2o setFixed equivalent) + identity on inactive (padded)
    # vertices so the system stays SPD.
    vid = jnp.arange(M)
    inactive = (vid >= graph.num_vertices).astype(g.dtype)
    extra = inactive[:, None, None] * jnp.eye(6, dtype=g.dtype)
    extra = extra.at[0].add(_GAUGE_WEIGHT * jnp.eye(6, dtype=g.dtype))

    total_chi2 = (w * chi2).sum()
    return (Hii, Hjj, Hij, extra), g, total_chi2, w


def _block_diag(graph: PoseGraph, blocks):
    """Per-vertex (6, 6) diagonal blocks of H (incl. gauge/inactive)."""
    Hii, Hjj, _, extra = blocks
    M = graph.poses.shape[0]
    D = jnp.zeros((M, 6, 6), dtype=Hii.dtype)
    D = D.at[graph.edge_i].add(Hii)
    D = D.at[graph.edge_j].add(Hjj)
    return D + extra


def _block_matvec(graph: PoseGraph, blocks, diag_damp, x):
    """y = (H + diag_damp) @ x without materializing H.

    x, y: (M, 6); diag_damp: (M, 6) per-coordinate diagonal addition
    (LM damping + jitter). One edge-gather + two scatter-adds — O(E)
    memory traffic per product."""
    Hii, Hjj, Hij, extra = blocks
    xi = x[graph.edge_i]
    xj = x[graph.edge_j]
    hp = jax.lax.Precision.HIGHEST
    yi = (jnp.einsum("eab,eb->ea", Hii, xi, precision=hp)
          + jnp.einsum("eab,eb->ea", Hij, xj, precision=hp))
    yj = (jnp.einsum("eba,eb->ea", Hij, xi, precision=hp)
          + jnp.einsum("eab,eb->ea", Hjj, xj, precision=hp))
    y = jnp.zeros_like(x)
    y = y.at[graph.edge_i].add(yi)
    y = y.at[graph.edge_j].add(yj)
    y = y + jnp.einsum("mab,mb->ma", extra, x, precision=hp)
    return y + diag_damp * x


def _solve_cg(graph: PoseGraph, blocks, lam, b, maxiter, tol=1e-6):
    """Block-Jacobi-preconditioned conjugate gradient for (H + damping)x = b.

    The damped H is SPD (gauge prior + inactive identities + LM damping),
    so CG applies; the preconditioner inverts the per-vertex (6, 6)
    diagonal blocks — the block structure the reference's sparse Cholesky
    exploits, spent here on making CG's iteration count ~O(graph
    diameter) instead of a factorization."""
    dtype = b.dtype
    D = _block_diag(graph, blocks)
    diag_vec = jnp.diagonal(D, axis1=-2, axis2=-1)  # (M, 6)
    diag_damp = lam * diag_vec + _JITTER
    D_damped = D + jax.vmap(jnp.diag)(diag_damp)
    # Block inverses via Cholesky of each 6x6 (SPD by construction).
    L = jax.vmap(lambda A: jax.scipy.linalg.cho_factor(A, lower=True)[0])(
        D_damped
    )
    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=dtype), D.shape)
    Minv = jax.vmap(lambda l, i: jax.scipy.linalg.cho_solve((l, True), i))(
        L, eye6
    )  # (M, 6, 6)

    def precond(r):
        return jnp.einsum("mab,mb->ma", Minv, r,
                          precision=jax.lax.Precision.HIGHEST)

    bnorm2 = jnp.maximum((b * b).sum(), jnp.asarray(1e-30, dtype))
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)

    def cond(c):
        return (c["k"] < maxiter) & (c["rr"] > tol * tol * bnorm2)

    def body(c):
        Ap = _block_matvec(graph, blocks, diag_damp, c["p"])
        pAp = (c["p"] * Ap).sum()
        alpha = jnp.where(pAp > 0, c["rz"] / pAp, 0.0)
        x = c["x"] + alpha * c["p"]
        r = c["r"] - alpha * Ap
        z = precond(r)
        rz = (r * z).sum()
        beta = jnp.where(c["rz"] > 0, rz / c["rz"], 0.0)
        p = z + beta * c["p"]
        return {"x": x, "r": r, "p": p, "rz": rz, "rr": (r * r).sum(),
                "k": c["k"] + 1}

    out = jax.lax.while_loop(cond, body, {
        "x": x0, "r": r0, "p": z0, "rz": (r0 * z0).sum(),
        "rr": (r0 * r0).sum(), "k": jnp.asarray(0, jnp.int32),
    })
    return out["x"]


def _build_system(graph: PoseGraph, use_robust, cauchy_c):
    """Assemble H (6M, 6M), g (6M,), total robust chi2, per-edge weights
    (the dense path; small M — scatter the per-edge blocks)."""
    M = graph.poses.shape[0]
    (Hii, Hjj, Hij, extra), g, total_chi2, w = _build_blocks(
        graph, use_robust, cauchy_c
    )

    H = jnp.zeros((M, M, 6, 6), dtype=graph.poses.dtype)
    H = H.at[graph.edge_i, graph.edge_i].add(Hii)
    H = H.at[graph.edge_j, graph.edge_j].add(Hjj)
    H = H.at[graph.edge_i, graph.edge_j].add(Hij)
    H = H.at[graph.edge_j, graph.edge_i].add(jnp.swapaxes(Hij, -1, -2))
    vid = jnp.arange(M)
    H = H.at[vid, vid].add(extra)

    H_flat = H.transpose(0, 2, 1, 3).reshape(6 * M, 6 * M)
    g_flat = g.reshape(6 * M)
    return H_flat, g_flat, total_chi2, w


def _total_chi2(graph: PoseGraph, use_robust, cauchy_c):
    """Robust total chi2 only — the LM accept test needs residuals, not
    Jacobians, so this skips the autodiff + 6Mx6M assembly of
    _build_system (which would double every iteration's cost)."""

    def per_edge(i, j, Z, info, mask):
        e = edge_residual(graph.poses[i], graph.poses[j], Z)
        chi2 = e @ info @ e
        return _robust_edge_weight(chi2, cauchy_c, use_robust) * mask * chi2

    return jax.vmap(per_edge)(
        graph.edge_i, graph.edge_j, graph.measurements, graph.information,
        graph.edge_mask.astype(graph.poses.dtype),
    ).sum()


def _apply_delta(poses, delta, num_vertices):
    """Left-multiply per-vertex increments, masked to active vertices."""
    M = poses.shape[0]
    active = (jnp.arange(M) < num_vertices)[:, None]
    d = jnp.where(active, delta.reshape(M, 6), 0.0)
    return jax.vmap(lambda dd, T: se3.exp(dd) @ T)(d, poses)


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "use_robust", "solver", "gnc_adaptive"),
)
def optimize(graph: PoseGraph, iterations: int = 20, use_robust: bool = True,
             cauchy_c: float = 1.0, gnc_init: float = 1.0,
             gnc_decay: float = 0.5, solver: str = "dense",
             gnc_adaptive: bool = False):
    """Levenberg-Marquardt over the padded pose graph.

    solver: "dense" materializes the 6Mx6M system and Cholesky-factors it
    (exact; O(M^2) memory, O(M^3) solve — right for the tens-to-hundreds
    of keyframes real sequences produce). "cg" never materializes H:
    block-Jacobi-preconditioned conjugate gradient over the per-edge
    blocks (O(E + M) memory per LM iteration — the scaling path for
    hour-long runs; orchestrators switch at SlamConfig.graph_cg_threshold
    vertices). Both run the same LM accept/reject loop.

    gnc_init > 1 anneals the robustness (graduated non-convexity): the
    Cauchy width starts at gnc_init * cauchy_c and decays by gnc_decay per
    iteration down to cauchy_c. Plain Cauchy (gnc_init=1, the g2o/reference
    semantics) crushes a CORRECT loop-closure edge whose residual is large
    at initialization (accumulated odometry drift — exactly what loop
    closure exists to fix); annealing lets big consistent errors pull
    early while true outliers are still rejected once the kernel tightens.
    The trade-off: annealing also lets a false edge with overwhelming
    information drag the graph before rejection kicks in, so upstream
    validation (models/constraints.py) remains the primary outlier filter
    and gnc_init should stay modest for interleaved per-insertion solves.

    gnc_adaptive=True sizes the initial anneal from the DATA instead of a
    fixed gnc_init (the standard GNC initialization, Yang et al. 2020):
    the starting Cauchy width covers the worst active edge's chi2, so its
    initial robust weight is ~0.5 no matter how large accumulated drift
    got. A fixed anneal silently fails at scale: tracker information
    matrices grow with pixel count, so a drift-sized loop residual at
    640x480 can sit at chi2 ~ 10^3-10^4 — weight ~0 under gnc_init=16,
    and the (correct) loop edge never pulls. gnc_init acts as a floor.

    Returns (optimized PoseGraph, final chi2, per-edge robust weights at
    the base cauchy_c). Equivalent of KeyframeGraph's interleaved g2o
    optimize() calls; run with a larger iteration count for
    finalOptimization().
    """
    dtype = graph.poses.dtype
    M = graph.poses.shape[0]

    anneal0 = jnp.asarray(gnc_init, dtype)
    if gnc_adaptive:
        # Start the annealed width at the worst ACTIVE edge's residual
        # scale: c_eff0^2 = max(chi2) => that edge begins at weight 0.5.
        chi2_edges = edge_chi2(graph) * graph.edge_mask.astype(dtype)
        anneal0 = jnp.maximum(
            anneal0,
            jnp.sqrt(jnp.maximum(chi2_edges.max(), 1.0)) / cauchy_c,
        )

    def cond(carry):
        return (carry["k"] < iterations) & ~carry["done"]

    def body(carry):
        g_cur = carry["graph"]
        anneal = jnp.maximum(
            1.0, anneal0 * gnc_decay ** carry["k"].astype(dtype)
        )
        c_eff = cauchy_c * anneal
        if solver == "cg":
            blocks, g, chi2, _ = _build_blocks(g_cur, use_robust, c_eff)
            delta = _solve_cg(g_cur, blocks, carry["lam"], -g,
                              maxiter=4 * M).reshape(6 * M)
            g = g.reshape(6 * M)
        else:
            H, g, chi2, _ = _build_system(g_cur, use_robust, c_eff)
            damped = (H + carry["lam"] * jnp.diag(jnp.diagonal(H))
                      + _JITTER * jnp.eye(6 * M, dtype=dtype))
            L, low = jax.scipy.linalg.cho_factor(damped, lower=True)
            delta = jax.scipy.linalg.cho_solve((L, low), -g)
        delta = jnp.where(jnp.isfinite(delta).all(), delta, jnp.zeros_like(delta))
        new_poses = _apply_delta(g_cur.poses, delta, g_cur.num_vertices)
        g_new = g_cur._replace(poses=new_poses)
        chi2_new = _total_chi2(g_new, use_robust, c_eff)

        accept = chi2_new <= chi2
        graph_next = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), g_new, g_cur
        )
        lam = jnp.where(accept, carry["lam"] * 0.5, carry["lam"] * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        step = jnp.linalg.norm(delta)
        # Don't stop while the robust kernel is still annealing.
        done = accept & (step < 1e-8) & (anneal <= 1.0)
        return {
            "graph": graph_next,
            "lam": lam,
            "k": carry["k"] + 1,
            "done": done,
        }

    init = {
        "graph": graph,
        "lam": jnp.asarray(1e-6, dtype),
        "k": jnp.asarray(0, jnp.int32),
        "done": jnp.asarray(False, bool),
    }
    out = jax.lax.while_loop(cond, body, init)
    final_graph = out["graph"]
    # Final chi2/weights need residuals only — blocks, not the 6Mx6M H.
    _, _, chi2, weights = _build_blocks(final_graph, use_robust, cauchy_c)
    return final_graph, chi2, weights


@jax.jit
def edge_chi2(graph: PoseGraph):
    """Per-edge (unweighted) chi^2 — outlier-pruning diagnostics
    (reference OptimizationRemoveOutliers path)."""

    def per_edge(i, j, Z, info):
        e = edge_residual(graph.poses[i], graph.poses[j], Z)
        return e @ info @ e

    return jax.vmap(per_edge)(
        graph.edge_i, graph.edge_j, graph.measurements, graph.information
    )
