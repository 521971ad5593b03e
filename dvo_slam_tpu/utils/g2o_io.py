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
    """Read a .g2o file into a models.pose_graph.PoseGraph."""
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

    g = pose_graph.empty_graph(max_vertices, max_edges)
    poses = g.poses
    for vid in sorted(vertices):
        poses = poses.at[vid].set(jnp.asarray(vertices[vid], jnp.float32))
    ei, ej = g.edge_i, g.edge_j
    Z, info_arr, mask = g.measurements, g.information, g.edge_mask
    for e, (i, j, Zm, I) in enumerate(edges):
        ei = ei.at[e].set(i)
        ej = ej.at[e].set(j)
        Z = Z.at[e].set(jnp.asarray(Zm, jnp.float32))
        info_arr = info_arr.at[e].set(jnp.asarray(I, jnp.float32))
        mask = mask.at[e].set(True)
    return g._replace(
        poses=poses,
        num_vertices=jnp.asarray(len(vertices), jnp.int32),
        edge_i=ei, edge_j=ej, measurements=Z, information=info_arr,
        edge_mask=mask, num_edges=jnp.asarray(len(edges), jnp.int32),
    )
