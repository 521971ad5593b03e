"""LocalMap measurement-fusion tests (reference local_map.cpp optimize())."""

import numpy as np

from dvo_slam_tpu.models.keyframe_tracker import fuse_relative_poses
from dvo_slam_tpu.utils import se3_np


def test_fusion_limits():
    T_a = se3_np.exp(np.array([0.1, 0.0, 0.0, 0.0, 0.0, 0.05]))
    T_b = se3_np.exp(np.array([0.12, 0.01, 0.0, 0.0, 0.0, 0.06]))
    big = np.eye(6) * 1e8
    tiny = np.eye(6) * 1e-8
    # b has no information -> stays at a; a has none -> moves to b.
    np.testing.assert_allclose(fuse_relative_poses(T_a, big, T_b, tiny), T_a, atol=1e-6)
    np.testing.assert_allclose(fuse_relative_poses(T_a, tiny, T_b, big), T_b, atol=1e-6)


def test_fusion_midpoint():
    """Equal information: the fused pose is the geodesic midpoint."""
    T_a = np.eye(4)
    xi = np.array([0.2, -0.1, 0.05, 0.04, -0.02, 0.06])
    T_b = se3_np.exp(xi)
    fused = fuse_relative_poses(T_a, np.eye(6), T_b, np.eye(6))
    np.testing.assert_allclose(fused, se3_np.exp(xi / 2), atol=1e-6)


def test_fusion_reduces_noise():
    """Fusing two noisy estimates of the same pose beats either alone
    (statistically, over trials)."""
    rng = np.random.default_rng(0)
    T_true = se3_np.exp(np.array([0.05, -0.02, 0.03, 0.01, 0.02, -0.01]))
    errs_a, errs_f = [], []
    for _ in range(50):
        na = rng.normal(scale=0.01, size=6)
        nb = rng.normal(scale=0.01, size=6)
        T_a = se3_np.exp(na) @ T_true
        T_b = se3_np.exp(nb) @ T_true
        fused = fuse_relative_poses(T_a, np.eye(6), T_b, np.eye(6))
        errs_a.append(np.linalg.norm(se3_np.log(T_a @ se3_np.inverse(T_true))))
        errs_f.append(np.linalg.norm(se3_np.log(fused @ se3_np.inverse(T_true))))
    assert np.mean(errs_f) < np.mean(errs_a) * 0.85
