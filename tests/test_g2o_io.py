"""g2o text serialization round-trip."""

import numpy as np

from dvo_slam_tpu.utils import g2o_io


def test_g2o_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from test_pose_graph import _chain_graph

    g, _, _ = _chain_graph(n=6, drift=0.02, max_v=16, max_e=32)
    path = str(tmp_path / "graph.g2o")
    g2o_io.save_g2o(path, g)

    text = open(path).read()
    assert text.count("VERTEX_SE3:QUAT") == 6
    assert text.count("EDGE_SE3:QUAT") == 6  # 5 odometry + 1 loop
    assert "FIX 0" in text

    g2 = g2o_io.load_g2o(path, max_vertices=16, max_edges=32)
    assert int(g2.num_vertices) == 6
    assert int(g2.num_edges) == 6
    np.testing.assert_allclose(
        np.asarray(g2.poses[:6]), np.asarray(g.poses[:6]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g2.measurements[:6]), np.asarray(g.measurements[:6]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g2.information[:6]), np.asarray(g.information[:6]), rtol=1e-5
    )


def test_g2o_optimizable_after_load(tmp_path):
    """A loaded graph must optimize exactly like the original."""
    import sys

    sys.path.insert(0, "tests")
    from test_pose_graph import _chain_graph

    from dvo_slam_tpu.models import pose_graph

    g, _, _ = _chain_graph(n=6, drift=0.02, max_v=16, max_e=32)
    path = str(tmp_path / "graph.g2o")
    g2o_io.save_g2o(path, g)
    g2 = g2o_io.load_g2o(path, max_vertices=16, max_edges=32)
    o1, chi1, _ = pose_graph.optimize(g, iterations=10, gnc_init=16.0)
    o2, chi2, _ = pose_graph.optimize(g2, iterations=10, gnc_init=16.0)
    np.testing.assert_allclose(
        np.asarray(o1.poses[:6]), np.asarray(o2.poses[:6]), atol=1e-4
    )


def test_g2o_load_grows_capacity(tmp_path):
    """A file larger than the requested padded capacities must grow the
    graph to fit — out-of-capacity scatters would be silently dropped
    while num_vertices claimed the true count."""
    import sys

    sys.path.insert(0, "tests")
    from test_pose_graph import _chain_graph

    g, _, _ = _chain_graph(n=12, drift=0.02, max_v=16, max_e=32)
    path = str(tmp_path / "big.g2o")
    g2o_io.save_g2o(path, g)
    g2 = g2o_io.load_g2o(path, max_vertices=4, max_edges=4)
    assert int(g2.num_vertices) == 12
    assert g2.poses.shape[0] >= 12
    assert g2.edge_i.shape[0] >= int(g2.num_edges)
    np.testing.assert_allclose(
        np.asarray(g2.poses[:12]), np.asarray(g.poses[:12]), atol=1e-5
    )


def test_cli_optimize_graph(tmp_path):
    """`cli optimize-graph`: standalone g2o-in -> optimized g2o-out (the
    g2o CLI optimizer equivalent) reduces chi2 on a drifted chain."""
    import sys

    sys.path.insert(0, "tests")
    from test_pose_graph import _chain_graph

    from dvo_slam_tpu import cli
    from dvo_slam_tpu.models import pose_graph

    g, _, _ = _chain_graph(n=8, drift=0.05, max_v=16, max_e=32)
    src = str(tmp_path / "in.g2o")
    dst = str(tmp_path / "out.g2o")
    g2o_io.save_g2o(src, g)
    rc = cli.main(["optimize-graph", src, "--out", dst,
                   "--iterations", "30"])
    assert rc == 0
    solved = g2o_io.load_g2o(dst)
    _, chi2_before, _ = pose_graph.optimize(g, iterations=1)
    _, chi2_after, _ = pose_graph.optimize(solved, iterations=1)
    assert float(chi2_after) < float(chi2_before)
    assert np.isfinite(np.asarray(solved.poses[:8])).all()


def test_g2o_sparse_vertex_ids_compact(tmp_path):
    """g2o permits arbitrary vertex ids; gaps must NOT become phantom
    identity vertices in the solve / the written-back file."""
    from dvo_slam_tpu.utils import se3_np

    p = tmp_path / "sparse.g2o"
    lines = []
    ids = [0, 5, 9]
    for k, vid in enumerate(ids):
        lines.append(
            f"VERTEX_SE3:QUAT {vid} {0.1 * k:.3f} 0 0 0 0 0 1"
        )
    info = " ".join(
        ["10 0 0 0 0 0", "10 0 0 0 0", "10 0 0 0", "10 0 0", "10 0", "10"]
    )
    lines.append(f"EDGE_SE3:QUAT 0 5 0.1 0 0 0 0 0 1 {info}")
    lines.append(f"EDGE_SE3:QUAT 5 9 0.1 0 0 0 0 0 1 {info}")
    p.write_text("\n".join(lines) + "\n")

    g = g2o_io.load_g2o(str(p))
    assert int(g.num_vertices) == 3  # not max(id)+1 == 10
    assert int(g.num_edges) == 2
    np.testing.assert_array_equal(np.asarray(g.edge_i[:2]), [0, 1])
    np.testing.assert_array_equal(np.asarray(g.edge_j[:2]), [1, 2])
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(g.poses[k]), se3_np.pose_to_matrix(
                [0.1 * k, 0, 0], [0, 0, 0, 1]), atol=1e-9)

    out = tmp_path / "back.g2o"
    g2o_io.save_g2o(str(out), g)
    text = out.read_text()
    assert text.count("VERTEX_SE3:QUAT") == 3  # no phantom vertices written
