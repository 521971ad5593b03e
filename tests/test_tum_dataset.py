"""TumDataset end-to-end over a synthetic on-disk TUM-layout sequence."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dvo_slam_tpu.utils import synthetic, tum


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """Write a miniature TUM RGB-D dataset (rgb/, depth/, txt indexes)."""
    d = tmp_path_factory.mktemp("tum_seq")
    os.makedirs(d / "rgb")
    os.makedirs(d / "depth")
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(5, radius=0.04)
    K = (32.0, 32.0, 31.5, 23.5)
    frames = synthetic.render_sequence(scene, np.asarray(K), 64, 48, poses)
    rgb_lines, depth_lines = [], []
    for i, (intensity, depth) in enumerate(frames):
        ts = 1000.0 + i / 30.0
        rgb_name = f"rgb/{ts:.6f}.png"
        depth_name = f"depth/{ts:.6f}.png"
        cv2.imwrite(str(d / rgb_name), intensity.astype(np.uint8))
        raw = np.where(np.isfinite(depth), depth * tum.DEPTH_SCALE, 0.0)
        cv2.imwrite(str(d / depth_name), raw.astype(np.uint16))
        rgb_lines.append(f"{ts:.6f} {rgb_name}")
        depth_lines.append(f"{ts:.6f} {depth_name}")
    (d / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (d / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines) + "\n")
    tum.write_trajectory(str(d / "groundtruth.txt"),
                         [1000.0 + i / 30.0 for i in range(5)], poses)
    return str(d), frames, poses


def test_dataset_association_and_frames(tum_dir):
    d, frames, poses = tum_dir
    ds = tum.TumDataset(d)
    assert len(ds) == 5
    ts, intensity, depth = ds[2]
    assert intensity.shape == (48, 64) and depth.shape == (48, 64)
    # uint8 round trip: within quantization of the written PNG.
    np.testing.assert_allclose(
        intensity, frames[2][0].astype(np.uint8).astype(np.float32), atol=0.6
    )
    finite = np.isfinite(frames[2][1])
    np.testing.assert_allclose(
        depth[finite], frames[2][1][finite], atol=2.0 / tum.DEPTH_SCALE
    )
    assert ds.groundtruth_pose(ts) is not None


def test_dataset_prefetch_iter_matches_getitem(tum_dir):
    d, _, _ = tum_dir
    ds = tum.TumDataset(d)
    direct = [ds[i] for i in range(len(ds))]
    fetched = list(ds.prefetch_iter())
    assert len(fetched) == len(direct)
    for (ta, ia, za), (tb, ib, zb) in zip(direct, fetched):
        assert ta == tb
        np.testing.assert_allclose(ia, ib, atol=0.51)
        both = np.isfinite(za) & np.isfinite(zb)
        np.testing.assert_allclose(za[both], zb[both], atol=1e-4)
        np.testing.assert_array_equal(np.isfinite(za), np.isfinite(zb))


def test_benchmark_runs_on_tum_dataset(tum_dir):
    """The reference's benchmark_slam path end to end over the on-disk set."""
    from dvo_slam_tpu import benchmark
    from dvo_slam_tpu.config import SlamConfig, TrackerConfig

    d, _, _ = tum_dir
    res = benchmark.run_tum_dataset(
        d,
        tracker_cfg=TrackerConfig(num_levels=2, first_level=1, last_level=0,
                                  max_iterations=20),
        slam_cfg=SlamConfig(max_keyframes=16, max_edges=64),
        mode="keyframe",
        intrinsics=(32.0, 32.0, 31.5, 23.5),
    )
    assert res.num_frames == 5
    assert res.ate_rmse_m is not None and res.ate_rmse_m < 0.01


def test_rpe_per_second_matches_constant_drift():
    """Per-second RPE (TUM evaluate_rpe.py --fixed_delta --delta_unit s
    protocol): a constant per-frame drift of d meters at rate hz must read
    as d*hz m/s, independent of the frame-delta reading."""
    import numpy as np

    from dvo_slam_tpu.utils import evaluate

    hz, n, d = 30.0, 91, 1e-3
    ts = [i / hz for i in range(n)]
    gt, est = [], []
    for i in range(n):
        T = np.eye(4)
        T[0, 3] = 0.01 * i
        gt.append(T.copy())
        T[0, 3] += d * i  # accumulating drift
        est.append(T)
    t_sec, _ = evaluate.rpe(est, gt, delta=1.0, timestamps=ts,
                            per_second=True)
    # Within-tolerance tail pairs (gap >= 0.8 s) pull the RMSE slightly
    # below the exact 30-frame value.
    assert abs(t_sec - d * hz) / (d * hz) < 0.02
    t_frame, _ = evaluate.rpe(est, gt, delta=1)
    assert abs(t_frame - d) < 1e-12

    # Downsampling path stays deterministic and in range.
    t_a, _ = evaluate.rpe(est, gt, delta=1.0, timestamps=ts,
                          per_second=True, max_pairs=10)
    t_b, _ = evaluate.rpe(est, gt, delta=1.0, timestamps=ts,
                          per_second=True, max_pairs=10)
    assert t_a == t_b
    assert abs(t_a - d * hz) / (d * hz) < 0.05

    # Too-short trajectory: no pair spans the delta.
    import pytest

    with pytest.raises(ValueError):
        evaluate.rpe(est[:5], gt[:5], delta=1.0, timestamps=ts[:5],
                     per_second=True)
