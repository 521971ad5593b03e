"""g2o-format pose-graph serialization.

The reference's backend state is a g2o SparseOptimizer whose graphs can be
dumped/loaded as `.g2o` text (VERTEX_SE3:QUAT / EDGE_SE3:QUAT lines) —
standard interchange with g2o_viewer and other SLAM tooling. This module
writes/reads the same format from our PoseGraph pytree so graphs remain
inspectable with the reference's ecosystem tools.

Format per g2o convention:
  VERTEX_SE3:QUAT id tx ty tz qx qy qz qw
  EDGE_SE3:QUAT id1 id2 tx ty tz qx qy qz qw <21 upper-triangular info>
"""

from __future__ import annotations

import numpy as np

from dvo_slam_tpu.utils import se3_np


def save_g2o(path: str, graph) -> None:
    """Write a models.pose_graph.PoseGraph to .g2o text."""
    poses = np.asarray(graph.poses, np.float64)
    n_v = int(graph.num_vertices)
    n_e = int(graph.num_edges)
    ei = np.asarray(graph.edge_i)
    ej = np.asarray(graph.edge_j)
    Z = np.asarray(graph.measurements, np.float64)
    info = np.asarray(graph.information, np.float64)
    mask = np.asarray(graph.edge_mask)

    iu, ju = np.triu_indices(6)
    with open(path, "w") as f:
        for k in range(n_v):
            t, q = se3_np.matrix_to_pose(poses[k])
            f.write(
                f"VERTEX_SE3:QUAT {k} "
                f"{t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
                f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}\n"
            )
        f.write("FIX 0\n")
        for e in range(n_e):
            if not mask[e]:
                continue
            t, q = se3_np.matrix_to_pose(Z[e])
            upper = " ".join(f"{info[e][i, j]:.9f}" for i, j in zip(iu, ju))
            f.write(
                f"EDGE_SE3:QUAT {int(ei[e])} {int(ej[e])} "
                f"{t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
                f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {upper}\n"
            )


def load_g2o(path: str, max_vertices: int = 256, max_edges: int = 1024):
    """Read a .g2o file into a models.pose_graph.PoseGraph.

    max_vertices/max_edges are MINIMUM padded capacities: a file larger
    than either grows the graph to fit (an out-of-capacity .at[] scatter
    would be silently dropped by JAX while num_vertices still reported the
    true count — a corrupt graph with no error).

    Sparse vertex ids (g2o permits any) are compacted to 0..n-1 in sorted
    order; edge endpoints follow the remapping, so a graph written back by
    save_g2o is renumbered but structurally identical.
    """
    import jax.numpy as jnp

    from dvo_slam_tpu.models import pose_graph

    vertices = {}
    edges = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "VERTEX_SE3:QUAT":
                vid = int(parts[1])
                if vid < 0:
                    raise ValueError(f"negative vertex id {vid} in {path}")
                t = [float(x) for x in parts[2:5]]
                q = [float(x) for x in parts[5:9]]
                vertices[vid] = se3_np.pose_to_matrix(t, q)
            elif parts[0] == "EDGE_SE3:QUAT":
                i, j = int(parts[1]), int(parts[2])
                t = [float(x) for x in parts[3:6]]
                q = [float(x) for x in parts[6:10]]
                upper = [float(x) for x in parts[10:31]]
                info = np.zeros((6, 6))
                iu, ju = np.triu_indices(6)
                info[iu, ju] = upper
                info[ju, iu] = upper
                edges.append((i, j, se3_np.pose_to_matrix(t, q), info))

    # g2o permits arbitrary (sparse) vertex ids; PoseGraph indexes its
    # padded arrays densely. Remap ids to a compact 0..n-1 range in sorted
    # order — treating the largest id as the vertex count would turn every
    # id gap into a phantom identity vertex that rides through optimize()
    # and gets written back out by save_g2o.
    ids = sorted(vertices)
    id_map = {vid: k for k, vid in enumerate(ids)}
    n_v = len(ids)
    for i, j, _, _ in edges:
        # An edge referencing an undeclared vertex would be silently
        # clamped/wrapped by the device gather — a wrong solve, no error.
        if i not in id_map or j not in id_map:
            raise ValueError(
                f"edge ({i}, {j}) references an undeclared vertex in {path}"
            )
    cap_v = max(max_vertices, n_v)
    cap_e = max(max_edges, len(edges))
    # Assemble on host (numpy graph — no device traffic during the
    # parse), upload once at the end (per-element device scatters would
    # be one dispatch each).
    g = pose_graph.empty_graph_host(cap_v, cap_e)
    poses = g.poses
    for vid, T in vertices.items():
        poses[id_map[vid]] = T
    ei, ej = g.edge_i, g.edge_j
    Z, info_arr, mask = g.measurements, g.information, g.edge_mask
    for e, (i, j, Zm, I) in enumerate(edges):
        ei[e], ej[e] = id_map[i], id_map[j]
        Z[e], info_arr[e] = Zm, I
        mask[e] = True
    return g._replace(
        poses=jnp.asarray(poses),
        num_vertices=jnp.asarray(n_v, jnp.int32),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        measurements=jnp.asarray(Z), information=jnp.asarray(info_arr),
        edge_mask=jnp.asarray(mask),
        num_edges=jnp.asarray(len(edges), jnp.int32),
    )
