"""TUM RGB-D dataset IO and TUM-format trajectory serialization.

TPU-native equivalent of the reference's host I/O layer:
  * dvo_benchmark/include/dvo_benchmark/file_reader.h / rgbd_pair.h /
    groundtruth.h — assoc.txt + groundtruth.txt parsing and
    closest-timestamp association.
  * dvo_core SurfacePyramid::convertRawDepthImage — uint16/5000 -> meters.
  * dvo_slam serialization/TrajectorySerializer — TUM-format trajectories
    ("timestamp tx ty tz qx qy qz qw"), the format the ATE oracle consumes.

PNG decode goes through OpenCV (native C++ decoder). The optional
dvo_slam_tpu.native prefetching loader overlaps decode with device compute.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from dvo_slam_tpu.utils import se3_np

DEPTH_SCALE = 5000.0  # TUM RGB-D: uint16 depth units per meter.


def _read_lines(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                yield line.split()


def read_trajectory(path):
    """Read a TUM-format trajectory: list of (timestamp, 4x4 T_wc)."""
    out = []
    for parts in _read_lines(path):
        ts = float(parts[0])
        t = [float(x) for x in parts[1:4]]
        q = [float(x) for x in parts[4:8]]
        out.append((ts, se3_np.pose_to_matrix(t, q)))
    return out


def write_trajectory(path, timestamps, poses):
    """Write TUM format (TrajectorySerializer equivalent)."""
    with open(path, "w") as f:
        for ts, T in zip(timestamps, poses):
            t, q = se3_np.matrix_to_pose(T)
            f.write(
                f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )


def read_assoc(path):
    """Parse assoc.txt: rows (rgb_ts, rgb_file, depth_ts, depth_file)."""
    out = []
    for parts in _read_lines(path):
        out.append((float(parts[0]), parts[1], float(parts[2]), parts[3]))
    return out


def associate(a_stamps, b_stamps, max_difference=0.02):
    """Greedy closest-timestamp association (reference findClosestEntry /
    the dataset's associate.py). Returns list of (i, j) index pairs.

    Candidates are enumerated by bisecting each a-stamp into the sorted
    b-stamps (O(N log N + K) for K in-window pairs — identical candidate
    set and therefore identical greedy result to the quadratic all-pairs
    scan, without materializing ~10M tuples on a 3k-frame sequence)."""
    import bisect

    order_b = sorted(range(len(b_stamps)), key=lambda j: b_stamps[j])
    sorted_b = [b_stamps[j] for j in order_b]
    candidates = []
    for i, ta in enumerate(a_stamps):
        lo = bisect.bisect_left(sorted_b, ta - max_difference)
        hi = bisect.bisect_right(sorted_b, ta + max_difference)
        for k in range(lo, hi):
            if abs(ta - sorted_b[k]) < max_difference:
                candidates.append((abs(ta - sorted_b[k]), i, order_b[k]))
    candidates.sort()
    pairs = []
    used_a, used_b = set(), set()
    for _, i, j in candidates:
        if i not in used_a and j not in used_b:
            used_a.add(i)
            used_b.add(j)
            pairs.append((i, j))
    return sorted(pairs)


def _native():
    """The C++ decoder (dvo_slam_tpu.native), or None if unavailable."""
    try:
        from dvo_slam_tpu import native

        if native.available():
            return native
    except Exception:
        pass
    return None


def load_image_pair(dataset_dir, rgb_file, depth_file, use_native=True):
    """Load one frame: (intensity f32 (H,W) 0..255, depth f32 meters NaN-invalid).

    Grayscale conversion + uint16/5000 depth conversion, mirroring
    cv_bridge + SurfacePyramid::convertRawDepthImage. Prefers the native
    C++ decoder (native/loader.cpp); falls back to OpenCV.
    """
    rgb_path = os.path.join(dataset_dir, rgb_file)
    depth_path = os.path.join(dataset_dir, depth_file)

    native = _native() if use_native else None
    if native is not None:
        try:
            w, h = native.png_size(rgb_path)
            intensity = native.decode_intensity(rgb_path, w, h)
            wd, hd = native.png_size(depth_path)
            depth = native.decode_depth(depth_path, wd, hd, DEPTH_SCALE)
            return intensity, depth
        except (IOError, OSError):
            pass  # fall through to OpenCV (e.g. exotic PNG variants)

    import cv2

    rgb = cv2.imread(rgb_path, cv2.IMREAD_GRAYSCALE)
    if rgb is None:
        raise FileNotFoundError(rgb_path)
    raw_depth = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
    if raw_depth is None:
        raise FileNotFoundError(depth_path)
    intensity = rgb.astype(np.float32)
    depth = raw_depth.astype(np.float32)
    depth = np.where(depth > 0, depth / DEPTH_SCALE, np.nan).astype(np.float32)
    return intensity, depth


class TumDataset:
    """Iterator over a TUM RGB-D sequence directory.

    Expects the standard layout: rgb/, depth/, rgb.txt, depth.txt (or a
    precomputed assoc.txt) and optionally groundtruth.txt. Equivalent to the
    dvo_benchmark FileReader-driven loop (SURVEY.md §3.1).
    """

    def __init__(self, dataset_dir, assoc_file=None, max_difference=0.02):
        self.dir = dataset_dir
        assoc_path = assoc_file or os.path.join(dataset_dir, "assoc.txt")
        if os.path.exists(assoc_path):
            self.pairs = read_assoc(assoc_path)
        else:
            rgb_list = list(_read_lines(os.path.join(dataset_dir, "rgb.txt")))
            depth_list = list(_read_lines(os.path.join(dataset_dir, "depth.txt")))
            rgb_ts = [float(r[0]) for r in rgb_list]
            depth_ts = [float(d[0]) for d in depth_list]
            matches = associate(rgb_ts, depth_ts, max_difference)
            self.pairs = [
                (rgb_ts[i], rgb_list[i][1], depth_ts[j], depth_list[j][1])
                for i, j in matches
            ]
        gt_path = os.path.join(dataset_dir, "groundtruth.txt")
        self.groundtruth = read_trajectory(gt_path) if os.path.exists(gt_path) else None

    def __len__(self):
        return len(self.pairs)

    def timestamp(self, idx):
        return self.pairs[idx][0]

    def __getitem__(self, idx):
        ts, rgb_file, _, depth_file = self.pairs[idx]
        intensity, depth = load_image_pair(self.dir, rgb_file, depth_file)
        return ts, intensity, depth

    def prefetch_iter(self, prefetch: int = 4, limit: Optional[int] = None):
        """Iterate (timestamp, intensity, depth) with background decoding.

        Uses the native C++ prefetch loader (decode overlaps device
        compute, reference ROS-pipeline semantics); falls back to
        synchronous decoding when the native library is unavailable. The
        sequence must be dimensionally homogeneous (TUM sequences are).
        limit: stop after the first `limit` frames (the loader only ever
        decodes that prefix).
        """
        pairs = self.pairs if limit is None else self.pairs[:limit]
        native = _native()
        if native is None or not pairs:
            for i in range(len(pairs)):
                yield self[i]
            return
        w, h = native.png_size(os.path.join(self.dir, pairs[0][1]))
        rgb_paths = [os.path.join(self.dir, p[1]) for p in pairs]
        depth_paths = [os.path.join(self.dir, p[3]) for p in pairs]
        with native.PrefetchLoader(rgb_paths, depth_paths, w, h,
                                   depth_scale=DEPTH_SCALE,
                                   prefetch=prefetch) as loader:
            for idx, intensity, depth in loader:
                yield pairs[idx][0], intensity, depth

    def groundtruth_pose(self, timestamp, max_difference=0.05) -> Optional[np.ndarray]:
        """Closest groundtruth pose to `timestamp` (reference groundtruth.h).

        Bisects the (time-sorted) groundtruth — O(log M) per query instead
        of a linear scan over the ~10k-entry mocap stream."""
        if not self.groundtruth:
            return None
        import bisect

        if not hasattr(self, "_gt_stamps"):
            self._gt_sorted = sorted(self.groundtruth, key=lambda e: e[0])
            self._gt_stamps = [e[0] for e in self._gt_sorted]
        i = bisect.bisect_left(self._gt_stamps, timestamp)
        best = min(
            (e for e in self._gt_sorted[max(0, i - 1): i + 1]),
            key=lambda e: abs(e[0] - timestamp),
        )
        if abs(best[0] - timestamp) > max_difference:
            return None
        return best[1]
