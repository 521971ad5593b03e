"""Fused channel-major IRLS linearization — the tracker's hot path.

TPU-native equivalent of the reference's fused SSE inner loop
(dvo_core/src/dense_tracking_impl.cpp computeResidualsSse +
computeScaleSse/computeWeightsSse + math_sse.cpp
OptimizedSelfAdjointMatrix6x6f::rankUpdate; SURVEY.md §3.2/§4): one pose
linearization = warp -> project -> bilinear sample -> bivariate residual ->
t-distribution scale/weights -> weighted 6x6 normal equations.

Layout is the whole point of this module. The naive formulation keeps
per-point quantities in trailing small dimensions ((N, 2, 6) Jacobians,
(N, 8) samples); on TPU those pad the minor dimension to 128 lanes, so
every materialized intermediate costs up to 16-21x its logical bandwidth —
measured 3.45 ms per level-1 iteration. This module keeps every per-point
quantity as a flat (N,) array (lane-major), builds the Jacobian as 12
scalar planes, and reduces JtWJ/JtWr with a single (6, 2N) x (2N, 6)
MXU contraction — measured 1.71 ms per iteration, bit-matching the
reference formulation to ~1e-5 relative.

All reductions honor `axis_name` (pixel-sharded meshes, see parallel/).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.ops import pyramid as pyr
from dvo_slam_tpu.ops import robust

_EPS = 1e-12


class RefData(NamedTuple):
    """Per-level reference-frame arrays (all (N,), channel-major).

    The gradient planes are populated only for
    cfg.gradient_source == "reference" (constant-Jacobian-gradient mode);
    they are None otherwise so "current"-mode carries stay lean."""

    px: jnp.ndarray
    py: jnp.ndarray
    pz: jnp.ndarray
    i1: jnp.ndarray
    selected: jnp.ndarray  # bool
    gix: Optional[jnp.ndarray] = None
    giy: Optional[jnp.ndarray] = None
    gzx: Optional[jnp.ndarray] = None
    gzy: Optional[jnp.ndarray] = None


class Linearization(NamedTuple):
    A: jnp.ndarray  # (6, 6)
    b: jnp.ndarray  # (6,)
    err_mean: jnp.ndarray  # scalar acceptance metric
    n_valid: jnp.ndarray  # scalar, floored at 1 (safe divisor)
    n_raw: jnp.ndarray  # scalar, TRUE valid count (0 possible) — use for
    #                     acceptance ratios, never the floored n_valid
    sigma: jnp.ndarray  # (2, 2)
    log1p_sum: jnp.ndarray  # sum over valid of log1p(maha/dof) (for loglik)
    err_raw: jnp.ndarray  # sum of w * maha (diagnostics)
    # Selected in-bounds points masked ONLY by the pallas sampler's row
    # window (0 on the gather path) — the kernel's silent failure mode,
    # surfaced so trackers can detect/escalate (TrackStats.window_miss).
    # The default is a numpy scalar, NOT a device array: a jnp value here
    # would initialize the JAX backend at import time (pinning the
    # platform before callers can configure it) — same rule as
    # TrackResult's defaults in models/dense_tracker.py.
    n_window_miss: jnp.ndarray = np.float32(0.0)


def prepare_reference(ref_slab, K, cfg: TrackerConfig, row_offset=0) -> RefData:
    """Back-project + select reference pixels (PointSelection equivalent)."""
    _, H, W = ref_slab.shape
    dtype = ref_slab.dtype
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    v, u = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
    )
    u = u.reshape(-1)
    v = v.reshape(-1) + row_offset
    z = ref_slab[pyr.CH_Z].reshape(-1)
    i1 = ref_slab[pyr.CH_I].reshape(-1)
    selected = jnp.isfinite(z)
    if cfg.intensity_grad_threshold > 0.0:
        gi = jnp.hypot(
            ref_slab[pyr.CH_IDX].reshape(-1),
            ref_slab[pyr.CH_IDY].reshape(-1),
        )
        selected &= gi >= cfg.intensity_grad_threshold
    if cfg.depth_grad_threshold > 0.0:
        gz = jnp.hypot(
            ref_slab[pyr.CH_ZDX].reshape(-1),
            ref_slab[pyr.CH_ZDY].reshape(-1),
        )
        selected &= jnp.isfinite(gz) & (gz >= cfg.depth_grad_threshold)
    grads = {}
    if cfg.gradient_source == "reference":
        gix = ref_slab[pyr.CH_IDX].reshape(-1)
        giy = ref_slab[pyr.CH_IDY].reshape(-1)
        grads["gix"] = jnp.where(jnp.isfinite(gix), gix, 0.0)
        grads["giy"] = jnp.where(jnp.isfinite(giy), giy, 0.0)
        if cfg.use_depth:
            # The depth-residual Jacobian needs finite depth gradients; in
            # "current" mode that check runs on the SAMPLED gradients per
            # iteration — here the gradients are reference-side constants,
            # so the finiteness requirement folds into point selection.
            gzx = ref_slab[pyr.CH_ZDX].reshape(-1)
            gzy = ref_slab[pyr.CH_ZDY].reshape(-1)
            selected &= jnp.isfinite(gzx) & jnp.isfinite(gzy)
            grads["gzx"] = jnp.where(jnp.isfinite(gzx), gzx, 0.0)
            grads["gzy"] = jnp.where(jnp.isfinite(gzy), gzy, 0.0)
    z_safe = jnp.where(selected, z, 1.0)
    px = (u - cx) / fx * z_safe
    py = (v - cy) / fy * z_safe
    ref = RefData(px=px, py=py, pz=z_safe, i1=i1, selected=selected, **grads)
    if cfg.point_budget_fraction > 0.0:
        tile = (_COMPACT_TILE_PALLAS if cfg.sampler_backend == "pallas"
                else _COMPACT_TILE_GATHER)
        ref = compact_reference(
            ref, compact_budget(px.shape[0], cfg.point_budget_fraction, tile)
        )
    return ref


# Points per flat sampling tile under compaction (pallas path): 16
# sublanes x 128 lanes of output per grid step; the gather path only
# needs lane alignment.
_COMPACT_TILE_PALLAS = 2048
_COMPACT_TILE_GATHER = 128


def _muldiv_floor(r, b: int, c):
    """floor(r * b / c) for int32 r without 64-bit intermediates.

    Split arithmetic (r = rh*2^10 + rl): exact while r, c < 2^19 and
    b <= c + one tile (the compact_reference operating range; asserted
    by the caller). Negative r clamps to 0 — the only negative inputs
    are rank-1 sentinels whose results are masked out by the caller.
    """
    r = jnp.maximum(r, 0)
    rh = r >> 10
    rl = r & 1023
    a = rh * b  # < 2^9 * 2^19.1
    q1 = a // c
    num = ((a % c) << 10) + rl * b  # < 2^29 + 2^29
    return (q1 << 10) + num // c


def compact_budget(n_points: int, frac: float, tile: int) -> int:
    """Static slot count for compact_reference: round_up(frac * n) to a
    tile multiple, at least one tile, never more than a tile-rounded n."""
    want = max(int(np.ceil(frac * n_points)), 1)
    up = lambda x: ((x + tile - 1) // tile) * tile
    return min(up(want), up(n_points))


def compact_reference(ref: RefData, budget: int) -> RefData:
    """Compact a full-grid RefData to `budget` slots of selected points.

    The reference materializes compacted per-level arrays of selected
    points (dvo_core/src/core/point_selection.cpp PointSelection); this
    rebuild's default is a mask over the full grid (SURVEY.md §8.1) — an
    O(N)-per-iteration cost even when thresholds select a small fraction.
    This is the bridge: a STABLE compaction (one direct cumsum-rank
    scatter), so points stay in row-major order and consecutive points
    still span few image rows — the locality the pallas flat-tile window
    sampler needs.

    Formulation (round 5, measured on v5e): fields pack into ONE (N, F)
    table and scatter DIRECTLY to their slot — in-tracker context this
    is several times cheaper than the gather formulation (rank scatter
    into an order array + per-field gathers): XLA fuses the field
    producers into each gather and re-evaluates them per fetched
    element, while the single scatter consumes the already-fused table
    once. Two correctness rules learned the hard way (round 5, both
    measured as multi-thousand zero-point slots on v5e at 640x480):
      * NO index hints: non-writers carry the out-of-bounds slot
        `budget` interspersed between the monotone writer slots, so
        `indices_are_sorted`/`unique_indices` would be lies — XLA TPU
        lowers hinted scatters to code that silently drops writes when
        the hints are false (CPU ignores them, which is why small CPU
        tests never caught it).
      * The decimation map rank*budget//count MUST NOT overflow int32:
        at 320x240 with budget 0.5 the product reaches 2.5e9 > 2^31.
        _muldiv_floor computes it exactly in split int32 arithmetic
        (valid for N < 2^19 points per level — asserted).

    Semantics vs the full grid (deviation ledger, fr1_desk_protocol.md):
      * selected count <= budget: identical point set, reductions merely
        reordered (results equal to accumulation tolerance).
      * selected count >  budget: points are decimated UNIFORMLY in
        row-major order (slot j takes the FIRST selected point whose
        uniform slot map floor(rank*budget/count) lands on j — monotone,
        spatially even; never a top-of-image truncation).
    Unused tail slots replicate the LAST filled slot, masked
    unselected — replicas keep per-tile mean warped coordinates (the
    pallas window origins) anchored to real data instead of dragging
    them toward an arbitrary fill value.
    """
    sel = ref.selected
    n = sel.shape[0]
    # _muldiv_floor's split arithmetic is exact for n < 2^19 (covers
    # 640x480 level 0); widen the split before lifting this.
    assert n < (1 << 19), f"compact_reference: {n} points overflow int32 map"
    ranks = jnp.cumsum(sel.astype(jnp.int32))
    count = ranks[-1]
    rank = ranks - 1
    over = count > budget
    cnt = jnp.maximum(count, 1)
    slot = jnp.where(over, _muldiv_floor(rank, budget, cnt), rank)
    # Scatter semantics for duplicate indices are unspecified; keep the
    # writes unique by letting only the FIRST point mapping to a slot
    # write it (elementwise computable from the rank alone).
    first = jnp.where(
        over, slot != _muldiv_floor(rank - 1, budget, cnt), True
    )
    write = sel & ((rank == 0) | first)
    slot = jnp.where(write, slot, budget)  # non-writers drop out of bounds

    fields = [ref.px, ref.py, ref.pz, ref.i1,
              ref.gix, ref.giy, ref.gzx, ref.gzy]
    present = [k for k, f in enumerate(fields) if f is not None]
    table = jnp.stack([fields[k] for k in present], axis=1)  # (N, F)
    out = jnp.zeros((budget, len(present)), table.dtype).at[slot].set(
        table, mode="drop"
    )
    # Tail fill: replicate the last filled slot into the unused tail.
    nfill = jnp.minimum(count, budget)
    last = jax.lax.dynamic_slice_in_dim(out, jnp.maximum(nfill - 1, 0), 1, 0)
    j = jnp.arange(budget, dtype=jnp.int32)
    slot_sel = j < nfill
    out = jnp.where(slot_sel[:, None], out, last)
    cols = {k: out[:, i] for i, k in enumerate(present)}
    return RefData(
        px=cols[0], py=cols[1], pz=cols[2], i1=cols[3],
        selected=slot_sel,
        gix=cols.get(4), giy=cols.get(5),
        gzx=cols.get(6), gzy=cols.get(7),
    )


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _sample_gather(cur_slab, u, v):
    """XLA row-gather bilinear sample. Returns (channels tuple, inbounds).

    cur_slab is channel-major (C, H, W); the row-gather table wants
    point-major (H*W, C) — this transpose materializes a lane-padded array
    once per call, which is acceptable on the portable path only (the
    pallas sampler consumes the channel-major layout directly)."""
    C, H, W = cur_slab.shape
    dtype = cur_slab.dtype
    u0f = jnp.floor(u)
    v0f = jnp.floor(v)
    inb = (u0f >= 0) & (v0f >= 0) & (u0f <= W - 2) & (v0f <= H - 2)
    u0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 2)
    v0 = jnp.clip(v0f.astype(jnp.int32), 0, H - 2)
    fu = (u - u0.astype(dtype))[:, None]
    fv = (v - v0.astype(dtype))[:, None]
    table = jnp.transpose(cur_slab, (1, 2, 0)).reshape(H * W, C)
    base = v0 * W + u0
    s00 = jnp.take(table, base, axis=0, mode="clip")
    s01 = jnp.take(table, base + 1, axis=0, mode="clip")
    s10 = jnp.take(table, base + W, axis=0, mode="clip")
    s11 = jnp.take(table, base + W + 1, axis=0, mode="clip")
    top = s00 + fu * (s01 - s00)
    bot = s10 + fu * (s11 - s10)
    smp = top + fv * (bot - top)
    chans = tuple(smp[:, c] for c in range(C))
    return chans, inb


def linearize(ref: RefData, cur_slab, K, T, cfg: TrackerConfig,
              axis_name: Optional[str] = None,
              cur_cmajor=None, sigma_init=None,
              sigma_warm=None) -> Linearization:
    """One fused IRLS linearization at pose T. See module docstring.

    `cur_cmajor`: channel-block layout of the slab (pallas sampler input,
    from ops.pallas.sampler.slab_to_cmajor) — required when
    cfg.sampler_backend == "pallas".

    `sigma_init` / `sigma_warm`: with cfg.tdist_scale_warm_iters > 0, a
    (2, 2) scale matrix from the previous IRLS iteration and a traced
    boolean gating it (False on a level's first iteration): the fixed
    point seeds from sigma_init instead of the moment estimate and runs
    only tdist_scale_warm_iters steps (the reference scale estimator
    also carries its estimate across iterations).
    """
    C, H, W = cur_slab.shape
    dtype = cur_slab.dtype
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    R, t = T[:3, :3], T[:3, 3]
    px, py, pz = ref.px, ref.py, ref.pz

    # --- warp + project (all (N,)) ---
    X = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0]
    Y = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1]
    Z = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2]
    # Sign-preserving guard (validity requires Z > 1e-6 anyway, but never
    # flip a behind-the-camera point to the front).
    zi = 1.0 / jnp.where(
        jnp.abs(Z) < 1e-8, jnp.where(Z < 0, -1e-8, 1e-8), Z
    )
    u = fx * X * zi + cx
    v = fy * Y * zi + cy

    # --- bilinear sample of the packed slab ---
    # "reference" gradient mode samples only [I] / [I, Z] (+ the mask
    # channel) — the Jacobian's gradient terms come from RefData instead,
    # so the per-iteration one-hot matmul shrinks with the channel count.
    ref_grad = cfg.gradient_source == "reference"
    n_smp = ((2 if cfg.use_depth else 1) if ref_grad else C)
    if cfg.sampler_backend == "pallas":
        from dvo_slam_tpu.ops.pallas import sampler as pallas_sampler

        assert cur_cmajor is not None, "pallas backend needs cur_cmajor"
        prec = (jax.lax.Precision.HIGHEST if cfg.pallas_precision == "highest"
                else jax.lax.Precision.DEFAULT)
        if cfg.point_budget_fraction > 0.0:
            # Compacted points (prepare_reference): flat tiles of
            # consecutive points; the assumed per-tile row span follows
            # from the budget density (stable compaction keeps row-major
            # order, so ~tile/(density*W) reference rows back one tile).
            span = cfg.pallas_compact_window_rows or int(
                np.ceil(_COMPACT_TILE_PALLAS
                        / max(cfg.point_budget_fraction * W, 1.0))
            )
            smp_cm, inb, win_miss = pallas_sampler.sample_slab(
                cur_cmajor, u, v, height=H, width=W, channels=n_smp,
                flat_points_per_tile=_COMPACT_TILE_PALLAS,
                window_rows=span,
                margin=cfg.pallas_margin,
                precision=prec,
                interpret=(jax.devices()[0].platform != "tpu"),
            )
        else:
            # Tile geometry: rows_per_tile must divide the REFERENCE rows
            # behind the points (H unless the reference grid is
            # row-sharded, parallel/sharded.py); cols_per_tile bounds each
            # tile's warped column span so the kernel's one-hot stays a
            # narrow window (select_tiling falls back to full-width bands
            # / whole-shard tiles where the constraints don't hold —
            # coarse levels).
            Hr = ref.px.shape[0] // W
            rpt, cpt = pallas_sampler.select_tiling(
                Hr, W, cfg.pallas_rows_per_tile, cfg.pallas_cols_per_tile,
                cfg.pallas_margin,
            )
            smp_cm, inb, win_miss = pallas_sampler.sample_slab(
                cur_cmajor, u, v, height=H, width=W, channels=n_smp,
                rows_per_tile=rpt,
                cols_per_tile=cpt,
                margin=cfg.pallas_margin,
                precision=prec,
                interpret=(jax.devices()[0].platform != "tpu"),
            )
        chans = tuple(smp_cm[c] for c in range(n_smp))
    else:
        chans, inb = _sample_gather(cur_slab[:n_smp], u, v)
        win_miss = None

    i2 = chans[pyr.CH_I]
    z2 = (chans[pyr.CH_Z] if cfg.use_depth or not ref_grad
          else jnp.zeros_like(i2))
    if ref_grad:
        gix, giy = ref.gix, ref.giy
        zero_g = jnp.zeros_like(i2)
        gzx = ref.gzx if cfg.use_depth else zero_g
        gzy = ref.gzy if cfg.use_depth else zero_g
    else:
        gix = chans[pyr.CH_IDX]
        giy = chans[pyr.CH_IDY]
        gzx = chans[pyr.CH_ZDX]
        gzy = chans[pyr.CH_ZDY]

    # --- residuals + validity ---
    rI = i2 - ref.i1
    rZ = z2 - Z
    valid = ref.selected & inb & (Z > 1e-6) & jnp.isfinite(rI)
    if cfg.use_depth:
        # Photometric-only tracking must NOT require finite current-frame
        # depth: pixels warping onto depth holes are exactly the ones the
        # intensity-only mode exists to keep. (In "reference" gradient
        # mode the gradient-finiteness requirement already folded into
        # point selection at prepare_reference.)
        valid &= jnp.isfinite(rZ) & jnp.isfinite(gzx) & jnp.isfinite(gzy)
    vF = valid.astype(dtype)
    rI = jnp.where(valid, rI, 0.0)
    rZ = jnp.where(valid, rZ, 0.0) if cfg.use_depth else jnp.zeros_like(rI)
    n_raw = _psum(vF.sum(), axis_name)
    n = jnp.maximum(n_raw, 1.0)
    if win_miss is not None:
        n_window_miss = _psum(
            (ref.selected & (Z > 1e-6) & win_miss).astype(dtype).sum(),
            axis_name,
        )
    else:
        n_window_miss = jnp.asarray(0.0, dtype)

    # --- robust scale + weights (bivariate t-distribution default) ---
    floor_II = cfg.min_intensity_sigma**2
    floor_ZZ = cfg.min_depth_sigma**2
    sII = rI * rI
    sIZ = rI * rZ
    sZZ = rZ * rZ

    if cfg.use_weighting and cfg.scale_estimator == "tdist":
        nu = cfg.tdist_dof
        a = _psum(sII.sum(), axis_name) / n + floor_II
        bq = _psum(sIZ.sum(), axis_name) / n
        c = _psum(sZZ.sum(), axis_name) / n + floor_ZZ
        n_fp = cfg.tdist_scale_iters
        if sigma_init is not None and cfg.tdist_scale_warm_iters > 0:
            warm = (jnp.asarray(False) if sigma_warm is None
                    else sigma_warm) & jnp.isfinite(sigma_init).all()
            a = jnp.where(warm, jnp.maximum(sigma_init[0, 0], floor_II), a)
            bq = jnp.where(warm, sigma_init[0, 1], bq)
            c = jnp.where(warm, jnp.maximum(sigma_init[1, 1], floor_ZZ), c)
            # Traced trip count: full count on the (cold) first iteration,
            # the short warm count afterwards.
            n_fp = jnp.where(warm, cfg.tdist_scale_warm_iters,
                             cfg.tdist_scale_iters)

        def fp(_, s):
            a, bq, c = s
            det = jnp.maximum(a * c - bq * bq, _EPS)
            p00, p01, p11 = c / det, -bq / det, a / det
            maha = p00 * sII + 2.0 * p01 * sIZ + p11 * sZZ
            w = (nu + 2.0) / (nu + maha) * vF
            return (
                _psum((w * sII).sum(), axis_name) / n + floor_II,
                _psum((w * sIZ).sum(), axis_name) / n,
                _psum((w * sZZ).sum(), axis_name) / n + floor_ZZ,
            )

        a, bq, c = jax.lax.fori_loop(0, n_fp, fp, (a, bq, c))
        det = jnp.maximum(a * c - bq * bq, _EPS)
        p00, p01, p11 = c / det, -bq / det, a / det
        maha = p00 * sII + 2.0 * p01 * sIZ + p11 * sZZ
        w = (nu + 2.0) / (nu + maha) * vF
        log1p_sum = _psum((jnp.log1p(maha / nu) * vF).sum(), axis_name)
        err_mean = 0.5 * jnp.log(det) + (nu + 2.0) / 2.0 * log1p_sum / n
    else:
        if cfg.use_weighting:
            scale_fn = robust.SCALE_FNS[cfg.scale_estimator]
            s_i = jnp.maximum(scale_fn(rI, valid), cfg.min_intensity_sigma)
            s_z = jnp.maximum(scale_fn(rZ, valid), cfg.min_depth_sigma)
        else:
            s_i = jnp.asarray(1.0, dtype)
            s_z = jnp.asarray(1.0, dtype)
        a, bq, c = s_i * s_i, jnp.asarray(0.0, dtype), s_z * s_z
        p00, p01, p11 = 1.0 / a, jnp.asarray(0.0, dtype), 1.0 / c
        maha = p00 * sII + p11 * sZZ
        if cfg.use_weighting:
            x = jnp.sqrt(maha)
            inf_fn = robust.INFLUENCE_FNS[cfg.influence]
            if cfg.influence == "huber":
                w = inf_fn(x, k=cfg.huber_k)
            elif cfg.influence == "tukey":
                w = inf_fn(x, b=cfg.tukey_b)
            elif cfg.influence == "tdist":
                w = inf_fn(x, dof=cfg.tdist_dof)
            else:
                w = inf_fn(x)
            w = w * vF
        else:
            w = vF
        log1p_sum = _psum((jnp.log1p(maha / cfg.tdist_dof) * vF).sum(), axis_name)
        err_sum = _psum((w * maha).sum(), axis_name)
        if cfg.use_weighting:
            err_mean = err_sum / n + jnp.log(jnp.maximum(a * c, _EPS))
        else:
            err_mean = err_sum / n

    if not cfg.use_depth:
        # Keep the depth channel inert: precision row/col zero.
        p01 = jnp.zeros_like(p01)
        p11 = jnp.zeros_like(p11)

    # --- analytic Jacobian planes (SURVEY.md §4.2) ---
    # J_pi = [[A, 0, C], [0, B, D]]; dp'/dxi = [I3 | -hat(p')].
    A_ = fx * zi
    B_ = fy * zi
    C_ = -fx * X * zi * zi
    D_ = -fy * Y * zi * zi
    zero = jnp.zeros_like(A_)
    Ju = (A_, zero, C_, C_ * Y, A_ * Z - C_ * X, -A_ * Y)
    Jv = (zero, B_, D_, -B_ * Z + D_ * Y, -D_ * X, B_ * X)
    # d p'_z / d xi = row 3 of [I3 | -hat(p')] = [0, 0, 1, Y, -X, 0]
    Jg3 = (zero, zero, jnp.ones_like(Z), Y, -X, zero)

    gix = jnp.where(valid, gix, 0.0)
    giy = jnp.where(valid, giy, 0.0)
    gzx = jnp.where(valid, gzx, 0.0)
    gzy = jnp.where(valid, gzy, 0.0)
    JI = [gix * Ju[k] + giy * Jv[k] for k in range(6)]
    if cfg.use_depth:
        JZ = [
            jnp.where(valid, gzx * Ju[k] + gzy * Jv[k] - Jg3[k], 0.0)
            for k in range(6)
        ]
    else:
        JZ = [zero] * 6

    # --- weighted normal equations as one MXU contraction ---
    wI = w * p00
    wX = w * p01
    wZ = w * p11
    GI = [wI * JI[k] + wX * JZ[k] for k in range(6)]
    GZ = [wX * JI[k] + wZ * JZ[k] for k in range(6)]
    J6 = jnp.stack([jnp.concatenate([JI[k], JZ[k]]) for k in range(6)])  # (6, 2N)
    G6 = jnp.stack([jnp.concatenate([GI[k], GZ[k]]) for k in range(6)])  # (6, 2N)
    Amat = jax.lax.dot_general(
        J6, G6, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    rvec = jnp.concatenate([rI, rZ])
    bvec = jax.lax.dot_general(
        G6, rvec[:, None], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, 0]
    Amat = _psum(Amat, axis_name)
    bvec = _psum(bvec, axis_name)
    err_raw = _psum((w * maha).sum(), axis_name)

    sigma = jnp.stack([jnp.stack([a, bq]), jnp.stack([bq, c])])
    return Linearization(
        A=Amat, b=bvec, err_mean=err_mean, n_valid=n, n_raw=n_raw,
        sigma=sigma, log1p_sum=log1p_sum, err_raw=err_raw,
        n_window_miss=n_window_miss,
    )


def tdist_loglik(lin: Linearization, cfg: TrackerConfig):
    """Bivariate t log-likelihood from a Linearization (Result.LogLikelihood)."""
    nu = cfg.tdist_dof
    p = 2.0
    det = jnp.maximum(
        lin.sigma[0, 0] * lin.sigma[1, 1] - lin.sigma[0, 1] * lin.sigma[1, 0], _EPS
    )
    log_norm = (
        jax.scipy.special.gammaln((nu + p) / 2.0)
        - jax.scipy.special.gammaln(nu / 2.0)
        - (p / 2.0) * jnp.log(nu * jnp.pi)
        - 0.5 * jnp.log(det)
    )
    return lin.n_valid * log_norm - (nu + p) / 2.0 * lin.log1p_sum
