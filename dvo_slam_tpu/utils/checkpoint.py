"""SLAM state checkpoint / resume.

The reference has no mid-run checkpointing (SURVEY.md §6) — trajectories are
only serialized at the end. This is a deliberate capability upgrade: the
full KeyframeSlam state (pose graph, keyframe poses/metadata, per-frame
records, tracking state) saves to one .npz so long sequences are resumable
and results are inspectable offline. Keyframe image pyramids are included
(they are required for future loop-closure validation against resumed
keyframes).
"""

from __future__ import annotations

import numpy as np

_FORMAT_VERSION = 3


def save_slam(path: str, slam) -> None:
    """Serialize a models.keyframe_tracker.KeyframeSlam to .npz."""
    from dvo_slam_tpu.models.chunked_slam import ChunkedKeyframeSlam
    from dvo_slam_tpu.models.keyframe_tracker import KeyframeSlam

    assert isinstance(slam, KeyframeSlam)
    getattr(slam, "_drain_chunks", lambda: None)()  # walk submitted chunks
    # Land every in-flight device result (window refinement, loop-closure
    # validation, async graph solve) in one combined transfer.
    slam._drain_device_reads()
    num_levels = slam.tracker_cfg.num_levels
    data = {
        "version": np.asarray(_FORMAT_VERSION),
        "engine_chunked": np.asarray(isinstance(slam, ChunkedKeyframeSlam)),
        "num_levels": np.asarray(num_levels),
        "first_level": np.asarray(slam.tracker_cfg.first_level),
        "last_level": np.asarray(slam.tracker_cfg.last_level),
        "local_map_capacity": np.asarray(slam.slam_cfg.local_map_capacity),
        "last_odo": np.asarray(slam._last_odo),
        "force_next": np.asarray(slam._force_next),
        # The anchor pose for the next fresh keyframe: what update() uses
        # while _initialized is False (initial pose, or the pose set by
        # reset()). Without it a post-reset resume would re-anchor at the
        # FIRST keyframe's pose.
        "T0": np.asarray(getattr(slam, "_T0", np.eye(4)), np.float64),
        "num_keyframes": np.asarray(len(slam.keyframes)),
        "num_loop_edges": np.asarray(slam.num_loop_edges),
        "kf_poses": np.stack(slam.kf_poses) if slam.kf_poses else np.zeros((0, 4, 4)),
        "kf_timestamps": np.asarray([k.timestamp for k in slam.keyframes]),
        "kf_entropy_first": np.asarray(
            [k.entropy_first if k.entropy_first is not None else np.nan
             for k in slam.keyframes]
        ),
        "kf_entropy_sum": np.asarray([k.entropy_sum for k in slam.keyframes]),
        "kf_entropy_count": np.asarray([k.entropy_count for k in slam.keyframes]),
        "frame_timestamps": np.asarray([f.timestamp for f in slam.frames]),
        "frame_kf_idx": np.asarray([f.keyframe_idx for f in slam.frames]),
        "frame_rel_poses": (
            np.stack([f.T_kf_frame for f in slam.frames])
            if slam.frames else np.zeros((0, 4, 4))
        ),
        "T_kf_prev": np.asarray(slam._T_kf_prev),
        "initialized": np.asarray(slam._initialized),
    }
    # Active local-map window (resume-equivalence requires the pending
    # measurements so the next keyframe switch refines the same window).
    lm = slam._local_map
    n_lm = len(lm)
    eye4, eye6 = np.eye(4), np.eye(6)
    data["lm_frame_indices"] = np.asarray(lm.frame_indices, np.int64).reshape(n_lm)
    data["lm_estimates"] = (
        np.stack(lm.estimates) if n_lm else np.zeros((0, 4, 4))
    )
    for name, meas in (("kf", lm.kf_meas), ("odo", lm.odo_meas)):
        data[f"lm_{name}_valid"] = np.asarray([m is not None for m in meas], bool)
        data[f"lm_{name}_T"] = np.stack(
            [eye4 if m is None else m[0] for m in meas]
        ) if n_lm else np.zeros((0, 4, 4))
        data[f"lm_{name}_info"] = np.stack(
            [eye6 if m is None else m[1] for m in meas]
        ) if n_lm else np.zeros((0, 6, 6))
    # Pose graph (device pytree -> host arrays).
    for name in ["poses", "num_vertices", "edge_i", "edge_j", "measurements",
                 "information", "edge_mask", "num_edges"]:
        data[f"graph_{name}"] = np.asarray(getattr(slam.graph, name))
    # Keyframe pyramids per level (stacked) + prev-frame pyramid.
    for lvl in range(num_levels):
        if slam.keyframes:
            data[f"kf_pyr_{lvl}"] = np.stack(
                [np.asarray(k.pyramid[lvl]) for k in slam.keyframes]
            )
        if slam._prev_pyr is not None:
            data[f"prev_pyr_{lvl}"] = np.asarray(slam._prev_pyr[lvl])
    # Chunked engine: the device scan carry (models/chunked_slam.py).
    # carry_present is False for a chunked engine checkpointed before its
    # first chunk — engine identity is carried by engine_chunked above.
    carry = getattr(slam, "_carry", None)
    data["carry_present"] = np.asarray(carry is not None)
    if carry is not None:
        for lvl in range(num_levels):
            data[f"carry_kf_{lvl}"] = np.asarray(carry["kf"][lvl])
            data[f"carry_prev_{lvl}"] = np.asarray(carry["prev"][lvl])
        data["carry_T_kf_prev"] = np.asarray(carry["T_kf_prev"])
        data["carry_last_odo"] = np.asarray(carry["last_odo"])
        data["carry_H_first"] = np.asarray(carry["H_first"])
        data["carry_has_first"] = np.asarray(carry["has_first"])
    # Write through an open handle: np.savez_compressed(path_str) silently
    # APPENDS ".npz" to other extensions, so `--checkpoint-out state.ckpt`
    # would write state.ckpt.npz and the later `--resume state.ckpt` would
    # FileNotFoundError on the exact path the user was told succeeded.
    with open(path, "wb") as f:
        np.savez_compressed(f, **data)


def load_slam(path: str, K, tracker_cfg=None, slam_cfg=None,
              enable_loop_closure=True, chunked=False):
    """Restore a KeyframeSlam from .npz; returns a ready-to-update instance.

    chunked=True restores a models.chunked_slam.ChunkedKeyframeSlam
    (requires a checkpoint written by one — the scan carry must be
    present)."""
    import jax.numpy as jnp

    from dvo_slam_tpu.config import SlamConfig, TrackerConfig
    from dvo_slam_tpu.models.keyframe_tracker import (
        FrameRecord, Keyframe, KeyframeSlam,
    )

    z = np.load(path, allow_pickle=False)
    if int(z["version"]) != _FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format version {int(z['version'])} != "
            f"{_FORMAT_VERSION} (this reader)"
        )
    tracker_cfg = tracker_cfg or TrackerConfig()
    slam_cfg = slam_cfg or SlamConfig()
    for field in ("num_levels", "first_level", "last_level"):
        stored = int(z[field])
        passed = getattr(tracker_cfg, field)
        if stored != passed:
            raise ValueError(
                f"checkpoint was written with tracker_cfg.{field}={stored} "
                f"but loading with {field}={passed}; pass a matching "
                "TrackerConfig"
            )
    stored_lm = int(z["local_map_capacity"])
    n_lm = len(z["lm_frame_indices"])
    if n_lm + 1 > slam_cfg.local_map_capacity:
        # LocalMap.add_frame silently drops frames once full — a smaller
        # capacity would truncate the pending window instead of resuming it.
        raise ValueError(
            f"checkpoint has a {n_lm}-frame pending local-map window "
            f"(written with local_map_capacity={stored_lm}) but loading "
            f"with local_map_capacity={slam_cfg.local_map_capacity}; pass "
            "a SlamConfig whose window can hold it"
        )
    if bool(z["engine_chunked"]) != bool(chunked):
        raise ValueError(
            "checkpoint was written by the "
            + ("chunked" if bool(z["engine_chunked"]) else "per-frame")
            + f" engine — load with chunked={bool(z['engine_chunked'])}"
        )
    if chunked:
        from dvo_slam_tpu.models.chunked_slam import ChunkedKeyframeSlam

        slam = ChunkedKeyframeSlam(K, tracker_cfg, slam_cfg,
                                   enable_loop_closure=enable_loop_closure)
    else:
        slam = KeyframeSlam(K, tracker_cfg, slam_cfg, enable_loop_closure)
    slam.init(np.asarray(z["T0"], np.float64))

    n_kf = int(z["num_keyframes"])
    num_levels = tracker_cfg.num_levels
    # Respect the HBM residency budget while restoring: only the newest
    # `resident_keyframes` pyramids go to the device; older ones stay host
    # numpy (exactly where eviction would put them) — otherwise resuming a
    # long run would stage EVERY pyramid through HBM before evicting.
    first_resident = max(0, n_kf - slam_cfg.resident_keyframes)
    for k in range(n_kf):
        levels = [z[f"kf_pyr_{lvl}"][k] for lvl in range(num_levels)]
        resident = k >= first_resident
        pyr = tuple(
            jnp.asarray(a) if resident else np.asarray(a) for a in levels
        )
        ef = float(z["kf_entropy_first"][k])
        slam.keyframes.append(
            Keyframe(
                idx=k,
                timestamp=float(z["kf_timestamps"][k]),
                pyramid=pyr,
                entropy_first=None if np.isnan(ef) else ef,
                entropy_sum=float(z["kf_entropy_sum"][k]),
                entropy_count=int(z["kf_entropy_count"][k]),
                resident=resident,
            )
        )
        slam.kf_poses.append(np.asarray(z["kf_poses"][k], np.float64))

    from dvo_slam_tpu.models import pose_graph

    # The orchestrator's graph is host-resident numpy (keyframe_tracker):
    # restore writable host arrays, not device uploads.
    slam.graph = pose_graph.PoseGraph(
        poses=np.asarray(z["graph_poses"]).copy(),
        num_vertices=np.asarray(z["graph_num_vertices"]),
        edge_i=np.asarray(z["graph_edge_i"]).copy(),
        edge_j=np.asarray(z["graph_edge_j"]).copy(),
        measurements=np.asarray(z["graph_measurements"]).copy(),
        information=np.asarray(z["graph_information"]).copy(),
        edge_mask=np.asarray(z["graph_edge_mask"]).copy(),
        num_edges=np.asarray(z["graph_num_edges"]),
    )
    slam.num_loop_edges = int(z["num_loop_edges"])
    for i in range(len(z["frame_timestamps"])):
        slam.frames.append(
            FrameRecord(
                timestamp=float(z["frame_timestamps"][i]),
                keyframe_idx=int(z["frame_kf_idx"][i]),
                T_kf_frame=np.asarray(z["frame_rel_poses"][i], np.float64),
            )
        )
    if f"prev_pyr_0" in z:
        slam._prev_pyr = tuple(
            jnp.asarray(z[f"prev_pyr_{lvl}"]) for lvl in range(num_levels)
        )
    for i in range(len(z["lm_frame_indices"])):
        slam._local_map.add_frame(
            int(z["lm_frame_indices"][i]),
            np.asarray(z["lm_estimates"][i], np.float64),
            (np.asarray(z["lm_kf_T"][i], np.float64),
             np.asarray(z["lm_kf_info"][i], np.float64))
            if bool(z["lm_kf_valid"][i]) else None,
            (np.asarray(z["lm_odo_T"][i], np.float64),
             np.asarray(z["lm_odo_info"][i], np.float64))
            if bool(z["lm_odo_valid"][i]) else None,
        )
    slam._T_kf_prev = np.asarray(z["T_kf_prev"], np.float64)
    slam._last_odo = np.asarray(z["last_odo"], np.float64)
    slam._force_next = bool(z["force_next"])
    slam._initialized = bool(z["initialized"])
    if chunked and bool(z["carry_present"]):
        num_levels = tracker_cfg.num_levels
        slam._carry = {
            "kf": tuple(jnp.asarray(z[f"carry_kf_{lvl}"])
                        for lvl in range(num_levels)),
            "prev": tuple(jnp.asarray(z[f"carry_prev_{lvl}"])
                          for lvl in range(num_levels)),
            "T_kf_prev": jnp.asarray(z["carry_T_kf_prev"]),
            "last_odo": jnp.asarray(z["carry_last_odo"]),
            "H_first": jnp.asarray(z["carry_H_first"]),
            "has_first": jnp.asarray(z["carry_has_first"]),
        }
    slam._evict_keyframe_pyramids()  # re-apply the HBM residency budget
    return slam
