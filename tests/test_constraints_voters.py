"""Loop-closure voter logic on mocked batch results (host-side unit tests
for models/constraints.vote_validation — the reference's voter set,
dvo_slam/src/constraints/*, SURVEY.md S7).

These run the voters directly on crafted tracker outputs, so each rejection
path is exercised deterministically — including the near-pi
CrossValidationVoter case that the arccos-based SE(3) log used to FAIL
OPEN on (a ~180-degree-inconsistent fwd/bwd pair read as consistency 0).
"""

import numpy as np

from dvo_slam_tpu.config import SlamConfig
from dvo_slam_tpu.models import constraints
from dvo_slam_tpu.utils import se3_np

SLAM = SlamConfig()
H_KF = -12.0  # plausible keyframe reference entropy (nats)


def _passing_results(T_init):
    """Batch results (B=1) crafted so EVERY voter passes."""
    T_f = np.asarray(T_init, np.float64)
    return {
        "fwd_nan": np.array([False]),
        "bwd_nan": np.array([False]),
        "fwd_T": T_f[None].astype(np.float32),
        "bwd_T": se3_np.inverse(T_f)[None].astype(np.float32),
        "fwd_H": np.array([H_KF], np.float32),
        "fwd_vr": np.array([0.9], np.float32),
        "fine_nan": np.array([False]),
        "fine_wmiss": np.array([0.0], np.float32),
        "fine_H": np.array([H_KF], np.float32),
        "fine_vr": np.array([0.9], np.float32),
        "fine_T": T_f[None].astype(np.float32),
        "fine_info": np.eye(6, dtype=np.float32)[None] * 1e4,
    }


def _vote(results, T_init):
    chunk = [
        constraints.ConstraintCandidate(keyframe_idx=0, new_idx=3,
                                        T_init=np.asarray(T_init))
    ]
    return constraints.vote_validation(
        [chunk], [results], [H_KF, H_KF, H_KF], SLAM, 0.02
    )


def test_all_voters_pass():
    T_init = se3_np.exp(np.array([0.05, -0.02, 0.01, 0.02, -0.01, 0.03]))
    accepted = _vote(_passing_results(T_init), T_init)
    assert len(accepted) == 1
    a = accepted[0]
    assert a.keyframe_idx == 0 and a.new_idx == 3
    # Edge convention: Z = inv(T_fine).
    np.testing.assert_allclose(a.measurement, se3_np.inverse(T_init),
                               atol=1e-6)


def test_cross_validation_rejects_near_pi_inconsistency():
    """fwd o bwd = ~180-deg rotation: the maximally inconsistent pair.
    The old log() returned a ZERO rotation vector here, so the voter
    passed the pair (fail open) — it must reject."""
    T_init = se3_np.exp(np.array([0.05, 0.0, 0.0, 0.0, 0.0, 0.0]))
    for theta in [np.pi, np.pi - 1e-4, 3.0]:
        r = _passing_results(T_init)
        R_bad = se3_np.exp(np.concatenate([np.zeros(3),
                                           [0.0, theta, 0.0]]))
        r["bwd_T"] = (se3_np.inverse(np.asarray(T_init, np.float64))
                      @ R_bad)[None].astype(np.float32)
        assert _vote(r, T_init) == [], theta


def test_cross_validation_rejects_moderate_inconsistency():
    """A garden-variety inconsistency just above threshold still rejects
    (the pre-fix behaviour — regression guard for the log() change)."""
    T_init = se3_np.exp(np.array([0.05, 0.0, 0.0, 0.0, 0.0, 0.0]))
    r = _passing_results(T_init)
    wobble = se3_np.exp(np.array([0.0, 0.0, 0.0, 0.0,
                                  2.0 * SLAM.cross_validation_threshold,
                                  0.0]))
    r["bwd_T"] = (se3_np.inverse(np.asarray(T_init, np.float64))
                  @ wobble)[None].astype(np.float32)
    assert _vote(r, T_init) == []


def test_nan_voter_rejects():
    T_init = np.eye(4)
    for key in ["fwd_nan", "bwd_nan", "fine_nan"]:
        r = _passing_results(T_init)
        r[key] = np.array([True])
        assert _vote(r, T_init) == [], key


def test_entropy_ratio_voter_rejects_degraded_track():
    T_init = np.eye(4)
    r = _passing_results(T_init)
    # Much worse (higher) entropy than the keyframe's history => low ratio.
    r["fwd_H"] = np.array([H_KF + 0.6 * abs(H_KF)], np.float32)
    assert _vote(r, T_init) == []
    r = _passing_results(T_init)
    r["fine_H"] = np.array([H_KF + 0.4 * abs(H_KF)], np.float32)
    assert _vote(r, T_init) == []


def test_constraint_ratio_voter_rejects():
    T_init = np.eye(4)
    for key in ["fwd_vr", "fine_vr"]:
        r = _passing_results(T_init)
        r[key] = np.array([0.5 * SLAM.min_constraint_ratio], np.float32)
        assert _vote(r, T_init) == [], key


def test_odometry_voter_rejects_far_from_seed():
    """Fine result far from the graph prediction it was seeded from is a
    self-similarity false positive, not refinement."""
    T_init = np.eye(4)
    r = _passing_results(T_init)
    T_far = se3_np.exp(np.concatenate([
        np.full(3, SLAM.odometry_constraint_threshold),
        np.zeros(3),
    ]))
    r["fine_T"] = np.asarray(T_far, np.float64)[None].astype(np.float32)
    assert _vote(r, T_init) == []


def test_window_miss_voter_rejects():
    T_init = np.eye(4)
    r = _passing_results(T_init)
    r["fine_wmiss"] = np.array([0.5], np.float32)
    assert _vote(r, T_init) == []


def test_missing_history_rejects_conservatively():
    """A keyframe with no usable tracking history cannot vouch for the
    candidate: reject, never auto-pass."""
    T_init = np.eye(4)
    chunk = [
        constraints.ConstraintCandidate(keyframe_idx=0, new_idx=3,
                                        T_init=T_init)
    ]
    accepted = constraints.vote_validation(
        [chunk], [_passing_results(T_init)], [None, H_KF, H_KF], SLAM, 0.02
    )
    assert accepted == []


def test_candidate_cap_keeps_nearest():
    """max_loop_candidates caps the radius census to the N nearest by
    metric distance (0 = unbounded, reference semantics)."""
    import dataclasses

    # Keyframe translations along a line; new keyframe at the origin.
    n = 12
    positions = np.zeros((n + 1, 3))
    for k in range(n):
        positions[k, 0] = 0.1 * (n - k)  # older keyframes farther away
    cfg = dataclasses.replace(SLAM, new_constraint_search_radius=100.0,
                              min_constraint_distance=2)
    unbounded = constraints.propose_candidates(positions, n, cfg)
    assert len(unbounded) == n - 1  # all but the min-distance exclusion

    capped_cfg = dataclasses.replace(cfg, max_loop_candidates=3)
    capped = constraints.propose_candidates(positions, n, capped_cfg)
    assert len(capped) == 3
    # Nearest three by distance are the newest eligible indices.
    assert capped == sorted(unbounded[-3:])


def test_validation_level_trim_equivalence():
    """dispatch_validation trims pyramid levels below everything the
    coarse/fine schedules track (level 0 is ~75% of the upload bytes and
    never touched at default schedules). Accepted constraints must be
    IDENTICAL to passing pre-trimmed pyramids with shifted configs (the
    lvl0 == 0 path): same levels, same math, same jit program."""
    import dataclasses

    import jax.numpy as jnp

    from dvo_slam_tpu.config import TrackerConfig
    from dvo_slam_tpu.ops import camera, pyramid
    from dvo_slam_tpu.utils import synthetic

    W, H = 64, 48
    Kt = (32.0, 32.0, (W - 1) / 2.0, (H - 1) / 2.0)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(4, radius=0.04)
    frames = synthetic.render_sequence(scene, np.asarray(Kt), W, H, poses)
    nl = 3
    pyrs = [pyramid.build_pyramid(jnp.asarray(i), jnp.asarray(z), nl)
            for i, z in frames]
    Ks = camera.pyramid_intrinsics(camera.intrinsics(*Kt), nl)
    # fine tracks 2..1, coarse 2..2 -> level 0 is dead weight (lvl0=1).
    fine = TrackerConfig(num_levels=nl, first_level=2, last_level=1,
                         max_iterations=20)
    coarse = dataclasses.replace(fine, first_level=2, last_level=2)
    slam_cfg = dataclasses.replace(SLAM, min_constraint_distance=1)
    cands = [constraints.ConstraintCandidate(
        keyframe_idx=k, new_idx=3,
        T_init=se3_np.inverse(poses[3]) @ poses[k]) for k in range(3)]
    entropies = [H_KF] * 4

    accepted = constraints.validate_candidates(
        cands, pyrs[:3], entropies, pyrs[3], Ks, coarse, fine, slam_cfg
    )

    # Reference: hand-trimmed inputs through the lvl0 == 0 path.
    shift = dict(num_levels=nl - 1, first_level=1)
    fine_t = dataclasses.replace(fine, last_level=0, **shift)
    coarse_t = dataclasses.replace(coarse, last_level=1, **shift)
    accepted_ref = constraints.validate_candidates(
        cands, [tuple(p[1:]) for p in pyrs[:3]], entropies,
        tuple(pyrs[3][1:]), tuple(Ks[1:]), coarse_t, fine_t, slam_cfg
    )

    assert len(accepted) == len(accepted_ref) > 0
    for a, b in zip(accepted, accepted_ref):
        assert a.keyframe_idx == b.keyframe_idx
        np.testing.assert_array_equal(a.measurement, b.measurement)
        np.testing.assert_array_equal(a.information, b.information)
