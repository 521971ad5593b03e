"""Sharded tracking and pose-graph steps over a device mesh.

Design (SURVEY.md §2.5 P4, "How to Scale Your Model" recipe): pick a mesh,
annotate shardings with shard_map, let collectives ride ICI.

  * Dual/batched dense tracking: mesh ('batch', 'pixel'). Reference
    pyramids are sharded over 'batch' (independent alignments) and row-
    sharded over 'pixel'; the current pyramid is replicated over 'pixel'
    (warped lookups cross row boundaries). Every reduction inside the IRLS
    loop (Sigma fixed point, JtWJ/JtWr, counts, log-likelihood) is a psum
    over 'pixel' — the tracker itself is shard-agnostic via its axis_name
    hook (models/dense_tracker.py).

  * Pose-graph optimization: edges sharded over a mesh axis; each shard
    assembles its partial 6Mx6M Hessian, psum combines, the (small) solve
    is replicated — the multi-chip g2o replacement.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models import dense_tracker


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              sp: Optional[int] = None) -> Mesh:
    """Build a ('batch', 'pixel') mesh over the available devices."""
    devices = np.asarray(jax.devices())
    n = n_devices or len(devices)
    # Derive only the missing axis — a caller-supplied dp or sp is honored
    # (make_mesh(dp=8) means pure batch-parallel, not a (4,2) mesh).
    if dp is None and sp is None:
        sp = 2 if n % 2 == 0 and n > 1 else 1
        dp = n // sp
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    if dp * sp != n:
        raise ValueError(f"dp*sp must equal n_devices: {dp}*{sp} != {n}")
    return Mesh(devices[:n].reshape(dp, sp), ("batch", "pixel"))


def shard_pyramid_specs(num_levels: int, batch: bool = True, pixel: bool = True):
    """PartitionSpecs for a stacked pyramid tuple: (B, 6, H, W) per level —
    pixel rows are axis 2 (slabs are channel-major)."""
    b = "batch" if batch else None
    p = "pixel" if pixel else None
    return tuple(P(b, None, p) for _ in range(num_levels))


def sharded_track_pairs(mesh: Mesh, cfg: TrackerConfig):
    """Compile a batched tracker with dp over pairs and sp over pixel rows.

    Returns fn(ref_pyrs, cur_pyrs, Ks, T_inits) -> TrackResult where
    ref_pyrs/cur_pyrs are tuples of (B, 6, H, W) with B divisible by the
    'batch' axis and each level's H divisible by the 'pixel' axis.
    """
    n_lvl = cfg.num_levels
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            shard_pyramid_specs(n_lvl, batch=True, pixel=True),  # ref
            shard_pyramid_specs(n_lvl, batch=True, pixel=False),  # cur (replicated rows)
            tuple(P() for _ in range(n_lvl)),  # intrinsics
            P("batch"),  # T_init
        ),
        out_specs=P("batch"),
        check_vma=False,
    )
    def fn(ref_pyrs, cur_pyrs, Ks, T_inits):
        track = lambda r, c, t: dense_tracker.track(
            r, c, Ks, t, cfg, axis_name="pixel"
        )
        return jax.vmap(track, in_axes=(0, 0, 0))(ref_pyrs, cur_pyrs, T_inits)

    return jax.jit(fn)


def sharded_validation_fleet(mesh: Mesh, cfg: TrackerConfig):
    """Loop-closure validation fleet sharded over the mesh (SURVEY.md §8.1).

    The reference validates constraint proposals serially with a dedicated
    tracker (ConstraintProposalValidator); models/constraints.py batches
    them on one chip; this spreads the fleet over devices: candidates x
    directions ride the 'batch' axis (forward cand->new alignments are
    rows [0, B), backward new->cand rows [B, 2B)), pixel rows the 'pixel'
    axis. Returns fn(cand_pyrs, new_pyr, Ks, T_inits) -> (fwd, bwd)
    TrackResults with leading dim B; 2B must be divisible by the batch
    axis (pad candidates like models/constraints._pad_batch does).
    """
    from dvo_slam_tpu.ops import se3

    track = sharded_track_pairs(mesh, cfg)

    @jax.jit
    def prepare(cand_pyrs, new_pyr, T_inits):
        B = T_inits.shape[0]
        news = tuple(jnp.broadcast_to(l, (B,) + l.shape) for l in new_pyr)
        refs = tuple(jnp.concatenate([c, n]) for c, n in zip(cand_pyrs, news))
        curs = tuple(jnp.concatenate([n, c]) for c, n in zip(cand_pyrs, news))
        T2 = jnp.concatenate([T_inits, jax.vmap(se3.inverse)(T_inits)])
        return refs, curs, T2

    def fn(cand_pyrs, new_pyr, Ks, T_inits):
        B = T_inits.shape[0]
        refs, curs, T2 = prepare(cand_pyrs, new_pyr, T_inits)
        res = track(refs, curs, Ks, T2)
        fwd = jax.tree.map(lambda x: x[:B], res)
        bwd = jax.tree.map(lambda x: x[B:], res)
        return fwd, bwd

    return fn


def sharded_pose_graph_build(mesh: Mesh):
    """Edge-sharded pose-graph Hessian assembly (psum over 'batch' axis).

    Demonstrates the edge-parallel path of the g2o replacement: each shard
    linearizes its slice of the edge list and the global 6Mx6M system is a
    psum. Returns fn(poses, edge_i, edge_j, Z, info, mask) -> (H, g).
    """
    from dvo_slam_tpu.models import pose_graph as pg

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("batch"), P("batch"), P("batch"), P("batch"), P("batch")),
        out_specs=P(),
        check_vma=False,
    )
    def fn(poses, edge_i, edge_j, Z, info, mask):
        def per_edge(i, j, Zm, I, m):
            e, Ji, Jj = pg._edge_residual_and_jacobians(poses[i], poses[j], Zm)
            return e, Ji, Jj, m.astype(poses.dtype)

        e, Ji, Jj, m = jax.vmap(per_edge)(edge_i, edge_j, Z, info, mask)
        winfo = m[:, None, None] * info
        hp = jax.lax.Precision.HIGHEST
        M = poses.shape[0]
        Hii = jnp.einsum("eai,eab,ebj->eij", Ji, winfo, Ji, precision=hp)
        Hjj = jnp.einsum("eai,eab,ebj->eij", Jj, winfo, Jj, precision=hp)
        Hij = jnp.einsum("eai,eab,ebj->eij", Ji, winfo, Jj, precision=hp)
        gi = jnp.einsum("eai,eab,eb->ei", Ji, winfo, e, precision=hp)
        gj = jnp.einsum("eai,eab,eb->ei", Jj, winfo, e, precision=hp)
        H = jnp.zeros((M, M, 6, 6), dtype=poses.dtype)
        H = H.at[edge_i, edge_i].add(Hii)
        H = H.at[edge_j, edge_j].add(Hjj)
        H = H.at[edge_i, edge_j].add(Hij)
        H = H.at[edge_j, edge_i].add(jnp.swapaxes(Hij, -1, -2))
        g = jnp.zeros((M, 6), dtype=poses.dtype)
        g = g.at[edge_i].add(gi)
        g = g.at[edge_j].add(gj)
        H = jax.lax.psum(H, "batch")
        g = jax.lax.psum(g, "batch")
        # 'pixel' axis unused for edges; values are already replicated there.
        return H.transpose(0, 2, 1, 3).reshape(6 * M, 6 * M), g.reshape(6 * M)

    return jax.jit(fn)
