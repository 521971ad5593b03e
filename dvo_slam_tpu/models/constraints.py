"""Loop-closure constraint proposal and batched two-stage validation.

TPU-native equivalent of the reference's constraint machinery
(dvo_slam/include/dvo_slam/constraints/constraint_proposal.h,
constraint_proposal_validator.h, constraint_proposal_voter.h; SURVEY.md S7
and §3.4): candidate keyframes within a metric search radius are tracked at
COARSE pyramid levels in both directions, filtered by voters (NaN result,
cross-validation T_fwd o T_bwd ~ I, entropy ratio vs the keyframe's own
tracking history, constraint ratio), then survivors are re-tracked at FINE
levels and re-voted.

The reference validates proposals serially with a dedicated DenseTracker;
here every stage is ONE vmapped batched tracker call over a padded
candidate batch (SURVEY.md §8.1), including both directions at once: the
forward and backward problems are just rows of the batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.config import SlamConfig, TrackerConfig
from dvo_slam_tpu.models import dense_tracker
from dvo_slam_tpu.utils import se3_np


@dataclasses.dataclass
class ConstraintCandidate:
    """A proposed loop-closure edge (reference ConstraintProposal)."""

    keyframe_idx: int  # existing keyframe (vertex i)
    new_idx: int  # the newly added keyframe (vertex j)
    T_init: np.ndarray  # (4, 4) initial estimate: candidate-cam -> new-cam


@dataclasses.dataclass
class AcceptedConstraint:
    keyframe_idx: int
    new_idx: int
    measurement: np.ndarray  # (4, 4) Z = T_i^{-1} T_j convention of the graph
    information: np.ndarray  # (6, 6)


def propose_candidates(positions, new_idx, slam_cfg: SlamConfig) -> List[int]:
    """Radius search over keyframe translations (reference candidate search
    in KeyframeGraph; SURVEY.md §3.4). Excludes keyframes closer than
    min_constraint_distance in graph index (those are covered by odometry
    edges)."""
    new_pos = positions[new_idx]
    out = []
    for k in range(new_idx):
        if new_idx - k < slam_cfg.min_constraint_distance:
            continue
        if np.linalg.norm(positions[k] - new_pos) <= slam_cfg.new_constraint_search_radius:
            out.append(k)
    return out


def _pad_batch(pyrs, T_inits, batch):
    """Stack candidate pyramids to a fixed batch (pad by repeating row 0)."""
    n = len(pyrs)
    idx = list(range(n)) + [0] * (batch - n)
    stacked = tuple(
        jnp.stack([pyrs[i][lvl] for i in idx]) for lvl in range(len(pyrs[0]))
    )
    T = jnp.stack([jnp.asarray(T_inits[i], jnp.float32) for i in idx])
    return stacked, T


def _odometry_vote(T_measured, T_init, slam_cfg: SlamConfig) -> bool:
    """OdometryConstraintVoter: a validated constraint must not wildly
    contradict the current graph estimate it was seeded from. The initial
    T comes from composing the (odometry-chained, partially optimized)
    keyframe poses; a measured pose further than the plausible accumulated
    drift from that prediction is more likely a self-similarity false
    positive than a real loop (reference dvo_slam/src/constraints/*)."""
    delta = np.linalg.norm(
        se3_np.log(np.asarray(T_measured, np.float64) @ se3_np.inverse(T_init))
    )
    return delta <= slam_cfg.odometry_constraint_threshold


def _entropy_ratio(entropy, denominator):
    """Sign-safe entropy ratio (SURVEY.md §4.5; dense_tracker.entropy_ratio).

    A keyframe with no usable tracking history (None / non-finite
    denominator) CANNOT vouch for the candidate's quality — the voter
    rejects conservatively instead of auto-passing (a silently-passed
    false loop closure corrupts the whole graph; a missed true one only
    costs a little drift)."""
    if denominator is None:
        return -np.inf
    return dense_tracker.entropy_ratio(entropy, denominator)


@functools.partial(jax.jit, static_argnames=("coarse_cfg", "fine_cfg"))
def _validate_batch_jit(refs, new_pyramid, Ks, Tf, Tb,
                        coarse_cfg: TrackerConfig, fine_cfg: TrackerConfig):
    """The WHOLE two-stage validation of one padded candidate batch as ONE
    dispatch: coarse forward + coarse backward + fine re-track (seeded by
    the coarse forward pose), vmapped over the batch.

    The staged reference pipeline fine-tracks only stage-1 survivors; here
    the fine stage runs on every padded row — identical device cost
    (batches are padded to validation_batch regardless) but it removes two
    dispatch+fetch round trips per batch, and all voting moves to the host
    after a single transfer. Rows that fail stage-1 voters are discarded on
    the host, so the accepted set is unchanged.
    """
    B = Tf.shape[0]
    curs = tuple(
        jnp.broadcast_to(lvl, (B,) + lvl.shape) for lvl in new_pyramid
    )
    coarse = lambda r, c, t: dense_tracker.track(r, c, Ks, t, coarse_cfg)
    fwd = jax.vmap(coarse)(refs, curs, Tf)
    bwd = jax.vmap(coarse)(curs, refs, Tb)
    # Fine stage seeded by the coarse forward pose; a NaN coarse row yields
    # a NaN fine row, rejected by the host NaN voter like before.
    seed = jnp.where(
        jnp.isfinite(fwd.transformation).all(axis=(-2, -1), keepdims=True),
        fwd.transformation,
        jnp.broadcast_to(jnp.eye(4, dtype=Tf.dtype), Tf.shape),
    )
    fine = jax.vmap(
        lambda r, c, t: dense_tracker.track(r, c, Ks, t, fine_cfg)
    )(refs, curs, seed)
    return {
        "fwd_T": fwd.transformation, "fwd_nan": fwd.is_nan(),
        "fwd_H": fwd.entropy, "fwd_vr": fwd.valid_ratio,
        "bwd_T": bwd.transformation, "bwd_nan": bwd.is_nan(),
        "fine_T": fine.transformation, "fine_nan": fine.is_nan(),
        "fine_H": fine.entropy, "fine_vr": fine.valid_ratio,
        "fine_info": fine.information,
    }


@dataclasses.dataclass
class PendingValidation:
    """In-flight validation batches: device handles + candidate metadata.

    The reference validates constraints on the background graph thread
    (dvo_slam/src/keyframe_graph.cpp); here the batched dispatch plays that
    role — the host is free between dispatch_validation and
    collect_validation while the chip works."""

    chunks: List[List[ConstraintCandidate]]
    handles: List[dict]


def dispatch_validation(
    candidates: List[ConstraintCandidate],
    keyframe_pyramids,
    new_pyramid,
    Ks,
    coarse_cfg: TrackerConfig,
    fine_cfg: TrackerConfig,
    slam_cfg: SlamConfig,
) -> Optional[PendingValidation]:
    """Dispatch every validation batch WITHOUT fetching results."""
    if not candidates:
        return None
    B = slam_cfg.validation_batch
    chunks, handles = [], []
    for start in range(0, len(candidates), B):
        chunk = candidates[start : start + B]
        pyrs = [keyframe_pyramids[c.keyframe_idx] for c in chunk]
        refs, Tf = _pad_batch(pyrs, [c.T_init for c in chunk], B)
        _, Tb = _pad_batch(
            pyrs, [se3_np.inverse(c.T_init) for c in chunk], B
        )
        handles.append(
            _validate_batch_jit(refs, new_pyramid, Ks, Tf, Tb,
                                coarse_cfg, fine_cfg)
        )
        chunks.append(chunk)
    return PendingValidation(chunks=chunks, handles=handles)


def collect_validation(
    pending: Optional[PendingValidation],
    keyframe_entropies,
    slam_cfg: SlamConfig,
) -> List[AcceptedConstraint]:
    """Fetch dispatched validation batches (one transfer) and apply the
    voters on host. keyframe_entropies is read at COLLECT time, matching
    the synchronous pipeline (history up to the proposing switch)."""
    if pending is None:
        return []
    host = jax.device_get(pending.handles)
    accepted: List[AcceptedConstraint] = []
    for chunk, r in zip(pending.chunks, host):
        for k, c in enumerate(chunk):
            # --- stage 1 voters (coarse results) ---
            if bool(r["fwd_nan"][k]) or bool(r["bwd_nan"][k]):
                continue  # NaNResultVoter
            T_f = np.asarray(r["fwd_T"][k], np.float64)
            T_b = np.asarray(r["bwd_T"][k], np.float64)
            # CrossValidationVoter: forward o backward ~ identity.
            consistency = np.linalg.norm(se3_np.log(T_f @ T_b))
            if consistency > slam_cfg.cross_validation_threshold:
                continue
            # TrackingResultEvaluationVoter (coarse threshold).
            ratio = _entropy_ratio(
                float(r["fwd_H"][k]), keyframe_entropies[c.keyframe_idx]
            )
            if ratio < slam_cfg.min_entropy_ratio_coarse:
                continue
            if float(r["fwd_vr"][k]) < slam_cfg.min_constraint_ratio:
                continue  # ConstraintRatioVoter
            if not _odometry_vote(T_f, c.T_init, slam_cfg):
                continue  # OdometryConstraintVoter

            # --- stage 2 voters (fine re-track seeded by the coarse pose) ---
            if bool(r["fine_nan"][k]):
                continue
            ratio = _entropy_ratio(
                float(r["fine_H"][k]), keyframe_entropies[c.keyframe_idx]
            )
            if ratio < slam_cfg.min_entropy_ratio_fine:
                continue
            if float(r["fine_vr"][k]) < slam_cfg.min_constraint_ratio:
                continue
            # OdometryConstraintVoter on the FINE result too: a fine
            # re-track can converge into a different (self-similarity)
            # basin than the cross-validated coarse pose; a fine pose far
            # from both the graph prediction and the coarse estimate is a
            # false positive, not refinement.
            T_fine = np.asarray(r["fine_T"][k], np.float64)
            if not _odometry_vote(T_fine, c.T_init, slam_cfg):
                continue
            fine_step = np.linalg.norm(se3_np.log(T_fine @ se3_np.inverse(T_f)))
            if fine_step > slam_cfg.cross_validation_threshold:
                continue
            # Tracker returns T: candidate-cam -> new-cam, i.e.
            # p_new = T p_cand. Graph edge convention: Z = T_i^{-1} T_j with
            # i = candidate, j = new, poses world<-cam: Z = inv(T).
            accepted.append(
                AcceptedConstraint(
                    keyframe_idx=c.keyframe_idx,
                    new_idx=c.new_idx,
                    measurement=se3_np.inverse(T_fine),
                    information=np.asarray(r["fine_info"][k], np.float64),
                )
            )
    return accepted


def validate_candidates(
    candidates: List[ConstraintCandidate],
    keyframe_pyramids,
    keyframe_entropies,
    new_pyramid,
    Ks,
    coarse_cfg: TrackerConfig,
    fine_cfg: TrackerConfig,
    slam_cfg: SlamConfig,
) -> List[AcceptedConstraint]:
    """Two-stage batched validation (reference ConstraintProposalValidator).

    Args:
      candidates: proposals from propose_candidates.
      keyframe_pyramids: list of per-keyframe slab-pyramid tuples.
      keyframe_entropies: per-keyframe reference entropy (tracking-history
        average; the TrackingResultEvaluationVoter denominator).
      new_pyramid: the new keyframe's pyramid.
      Ks: per-level intrinsics.

    Voters applied (reference dvo_slam/src/constraints/*): NaN result,
    cross-validation (T_fwd o T_bwd ~ I), entropy ratio (coarse + fine),
    constraint ratio, and the odometry-constraint voter (_odometry_vote).

    Synchronous form: dispatch_validation + collect_validation back to
    back. One fused dispatch and one transfer per candidate batch.
    """
    pending = dispatch_validation(
        candidates, keyframe_pyramids, new_pyramid, Ks,
        coarse_cfg, fine_cfg, slam_cfg,
    )
    return collect_validation(pending, keyframe_entropies, slam_cfg)
