"""Point compaction (ops/linearize.compact_reference + the pallas flat-tile
sampler mode) — the reference's PointSelection shape
(dvo_core/src/core/point_selection.cpp materializes COMPACTED per-level
arrays of selected points; this rebuild's default is a full-grid mask,
SURVEY.md §8.1, and compaction is the opt-in bridge to the reference's
O(selected)-per-iteration cost, TrackerConfig.point_budget_fraction).

Covers, per VERDICT r4 #2a:
  * equivalence vs the full-grid mask when selected <= budget, on the
    gather AND pallas-interpret backends;
  * decimation semantics when selected > budget (uniform, monotone,
    row-major);
  * flat-window behavior under CLUSTERED vs SPREAD selection, including
    the window-miss surface and the gather-escalation rescue path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models import dense_tracker
from dvo_slam_tpu.ops import camera, interp, pyramid
from dvo_slam_tpu.ops import linearize as lin_ops
from dvo_slam_tpu.ops.pallas import sampler
from dvo_slam_tpu.utils import se3_np, synthetic

W, H = 128, 32  # N = 4096: level-0 budgets stay one or two pallas tiles
K_TUPLE = (64.0, 64.0, (W - 1) / 2.0, (H - 1) / 2.0)
N = W * H


def _render_pair(xi_rel, sharpness=1.0):
    scene = synthetic.PlaneScene(sharpness=sharpness)
    K = np.asarray(K_TUPLE)
    T_rel = se3_np.exp(xi_rel)
    i_ref, z_ref = scene.render(K, W, H, np.eye(4))
    i_cur, z_cur = scene.render(K, W, H, se3_np.inverse(T_rel))
    return (i_ref, z_ref), (i_cur, z_cur), T_rel


def _slab(intensity, depth):
    return pyramid.build_pyramid(
        jnp.asarray(intensity), jnp.asarray(depth), 1
    )[0]


def _ref_full_and_compact(ref_slab, cfg_base, frac, backend):
    Kd = camera.intrinsics(*K_TUPLE)
    cfg_full = dataclasses.replace(cfg_base, sampler_backend=backend)
    cfg_comp = dataclasses.replace(cfg_full, point_budget_fraction=frac)
    full = lin_ops.prepare_reference(ref_slab, Kd, cfg_full)
    comp = lin_ops.prepare_reference(ref_slab, Kd, cfg_comp)
    return full, comp, cfg_full, cfg_comp, Kd


# The rendered plane scene's gradient magnitudes peak ~6; 3.0 selects a
# proper subset (roughly half the grid).
CFG = TrackerConfig(num_levels=1, first_level=0, last_level=0,
                    intensity_grad_threshold=3.0, max_iterations=30)


# ---------------------------------------------------------------------------
# compact_budget / compact_reference unit semantics
# ---------------------------------------------------------------------------

def test_compact_budget_rounding():
    # Tile-rounded, at least one tile, never beyond tile-rounded n.
    assert lin_ops.compact_budget(76800, 0.25, 2048) == 20480
    assert lin_ops.compact_budget(76800, 0.25, 128) == 19200
    assert lin_ops.compact_budget(100, 0.01, 128) == 128
    assert lin_ops.compact_budget(768, 0.9, 2048) == 2048  # cap = up(n)
    assert lin_ops.compact_budget(4096, 1.0, 2048) == 4096


def test_compact_identity_when_under_budget():
    """selected <= budget: the compacted arrays hold EXACTLY the selected
    points, in row-major order, with the tail replicating the last point
    masked unselected."""
    (i_r, z_r), _, _ = _render_pair(np.zeros(6))
    slab = _slab(i_r, z_r)
    full, comp, _, cfg_comp, _ = _ref_full_and_compact(
        slab, CFG, 0.9, "gather"
    )
    sel_idx = np.flatnonzero(np.asarray(full.selected))
    count = len(sel_idx)
    budget = lin_ops.compact_budget(
        N, cfg_comp.point_budget_fraction, lin_ops._COMPACT_TILE_GATHER
    )
    assert 0 < count <= budget, (count, budget)  # threshold really selects
    assert count < N  # ... a proper subset (the test is vacuous otherwise)

    assert comp.px.shape == (budget,)
    np.testing.assert_array_equal(
        np.asarray(comp.selected), np.arange(budget) < count
    )
    for field in ("px", "py", "pz", "i1"):
        got = np.asarray(getattr(comp, field))
        want = np.asarray(getattr(full, field))[sel_idx]
        np.testing.assert_array_equal(got[:count], want)
        # Tail replicates the LAST selected point (window-origin anchor).
        np.testing.assert_array_equal(got[count:],
                                      np.full(budget - count, want[-1]))


def test_compact_decimation_uniform_monotone():
    """selected > budget: uniform row-major decimation — every slot real,
    monotone order, spatially even (never a top-of-image truncation)."""
    (i_r, z_r), _, _ = _render_pair(np.zeros(6))
    slab = _slab(i_r, z_r)
    cfg = dataclasses.replace(CFG, intensity_grad_threshold=0.0)  # all finite
    full, comp, _, cfg_comp, _ = _ref_full_and_compact(
        slab, cfg, 0.25, "gather"
    )
    count = int(np.asarray(full.selected).sum())
    budget = lin_ops.compact_budget(N, 0.25, lin_ops._COMPACT_TILE_GATHER)
    assert count > budget

    assert bool(np.asarray(comp.selected).all())  # every slot holds a point
    # Slot j holds the FIRST selected point whose uniform slot map
    # floor(rank*budget/count) lands on j, i.e. rank ceil(j*count/budget).
    sel_idx = np.flatnonzero(np.asarray(full.selected))
    j = np.arange(budget)
    expect = sel_idx[-(-j * count // budget)]
    np.testing.assert_array_equal(np.asarray(comp.i1),
                                  np.asarray(full.i1)[expect])
    np.testing.assert_array_equal(np.asarray(comp.px),
                                  np.asarray(full.px)[expect])
    # Spatially even: first/last decimated points near the selection ends.
    assert expect[0] == sel_idx[0]
    assert sel_idx[-1] - expect[-1] <= count // budget + 1


def test_compact_decimation_at_int32_overflow_scale():
    """Regression (round 5): at 320x240 with budget 0.5 the decimation map
    rank*budget reaches 2.5e9 > 2^31. The naive int32 product wrapped
    negative, the scatter dropped those writes, and ~90% of slots kept the
    zero fill — the tracker then ran on ~2k of 38k points (measured on
    v5e as valid_pixels collapsing from 19470 to 1950). _muldiv_floor's
    split arithmetic must reproduce the exact int64 oracle at this scale.
    This reproduces on CPU: the overflow is in the int32 math, not the
    TPU scatter lowering (whose false sorted/unique hints were the
    second, TPU-only half of the round-5 bug — hints are gone)."""
    n = 76800  # 320x240
    rng = np.random.default_rng(3)
    sel = rng.uniform(size=n) < 0.824  # thr-1.0 density measured on v5e
    count = int(sel.sum())
    budget = lin_ops.compact_budget(n, 0.5, lin_ops._COMPACT_TILE_PALLAS)
    assert count > budget  # decimation branch
    assert count * budget > 2**31  # the product that used to wrap

    vals = np.arange(1, n + 1, dtype=np.float32)  # distinct, nonzero
    ref = lin_ops.RefData(
        px=jnp.asarray(vals), py=jnp.asarray(vals), pz=jnp.asarray(vals),
        i1=jnp.asarray(vals), selected=jnp.asarray(sel),
    )
    comp = lin_ops.compact_reference(ref, budget)
    assert bool(np.asarray(comp.selected).all())
    got = np.asarray(comp.pz)
    assert (got > 0).all()  # no slot kept the zero fill
    sel_idx = np.flatnonzero(sel)
    j = np.arange(budget, dtype=np.int64)
    expect = vals[sel_idx[-(-j * count // budget)]]
    np.testing.assert_array_equal(got, expect)


def test_compact_zero_selected_all_masked():
    z_nan = np.full((H, W), np.nan, np.float32)
    (i_r, _), _, _ = _render_pair(np.zeros(6))
    slab = _slab(i_r, z_nan)
    _, comp, _, _, _ = _ref_full_and_compact(slab, CFG, 0.5, "gather")
    assert not bool(np.asarray(comp.selected).any())
    assert np.isfinite(np.asarray(comp.px)).all()  # no NaN smuggled in


def test_compact_carries_reference_gradients():
    """gradient_source="reference" planes must be compacted with the same
    permutation as the geometry."""
    (i_r, z_r), _, _ = _render_pair(np.zeros(6))
    slab = _slab(i_r, z_r)
    cfg = dataclasses.replace(CFG, gradient_source="reference")
    full, comp, _, _, _ = _ref_full_and_compact(slab, cfg, 0.9, "gather")
    sel_idx = np.flatnonzero(np.asarray(full.selected))
    count = len(sel_idx)
    for field in ("gix", "giy", "gzx", "gzy"):
        np.testing.assert_array_equal(
            np.asarray(getattr(comp, field))[:count],
            np.asarray(getattr(full, field))[sel_idx],
        )


# ---------------------------------------------------------------------------
# Linearization equivalence vs the full-grid mask (selected <= budget)
# ---------------------------------------------------------------------------

def _linearize_pair(backend, frac):
    xi = np.array([0.004, -0.003, 0.002, 0.001, -0.001, 0.002])
    ref, cur, _ = _render_pair(xi)
    ref_slab = _slab(*ref)
    cur_slab = _slab(*cur)
    full, comp, cfg_full, cfg_comp, Kd = _ref_full_and_compact(
        ref_slab, dataclasses.replace(CFG, pallas_precision="highest"),
        0.9, backend,
    )
    assert int(np.asarray(full.selected).sum()) <= comp.px.shape[0]
    T = jnp.eye(4)
    cm = (sampler.slab_to_cmajor(cur_slab) if backend == "pallas" else None)
    lin_full = lin_ops.linearize(full, cur_slab, Kd, T, cfg_full,
                                 cur_cmajor=cm)
    lin_comp = lin_ops.linearize(comp, cur_slab, Kd, T, cfg_comp,
                                 cur_cmajor=cm)
    return lin_full, lin_comp


@pytest.mark.parametrize("backend", ["gather", "pallas"])
def test_linearize_equivalence_under_budget(backend):
    """With every selected point kept (selected <= budget), the compacted
    linearization must match the full-grid mask: same valid count exactly,
    same normal equations up to f32 reduction reordering."""
    lin_full, lin_comp = _linearize_pair(backend, 0.9)
    assert int(lin_comp.n_raw) == int(lin_full.n_raw)
    np.testing.assert_allclose(np.asarray(lin_comp.sigma),
                               np.asarray(lin_full.sigma),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(lin_comp.err_mean),
                               float(lin_full.err_mean),
                               rtol=1e-4, atol=1e-5)
    scale_A = np.abs(np.asarray(lin_full.A)).max()
    np.testing.assert_allclose(np.asarray(lin_comp.A),
                               np.asarray(lin_full.A),
                               rtol=2e-4, atol=2e-4 * scale_A)
    scale_b = max(np.abs(np.asarray(lin_full.b)).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(lin_comp.b),
                               np.asarray(lin_full.b),
                               rtol=2e-4, atol=2e-4 * scale_b)


# ---------------------------------------------------------------------------
# End-to-end tracking with compaction
# ---------------------------------------------------------------------------

def test_track_with_compaction_recovers_pose_gather():
    """Full coarse-to-fine track with thresholds + compaction (gather
    backend): same pose as the full-grid mask, to IRLS-path tolerance —
    and under a decimating budget the pose is still recovered."""
    xi = np.array([0.006, -0.004, 0.003, 0.002, -0.001, 0.002])
    ref, cur, T_true = _render_pair(xi)
    cfg0 = dataclasses.replace(CFG, max_iterations=50)
    Kd = camera.intrinsics(*K_TUPLE)
    Ks = camera.pyramid_intrinsics(Kd, 1)
    rp = pyramid.build_pyramid(jnp.asarray(ref[0]), jnp.asarray(ref[1]), 1)
    cp = pyramid.build_pyramid(jnp.asarray(cur[0]), jnp.asarray(cur[1]), 1)

    def err(cfg):
        res = dense_tracker.track_jit(rp, cp, Ks, jnp.eye(4), cfg)
        T = np.asarray(res.transformation, np.float64)
        return np.linalg.norm(se3_np.log(se3_np.inverse(T) @ T_true)), res

    e_full, _ = err(cfg0)
    e_comp, r_comp = err(dataclasses.replace(cfg0, point_budget_fraction=0.9))
    e_deci, r_deci = err(dataclasses.replace(
        cfg0, intensity_grad_threshold=0.0, point_budget_fraction=0.25))
    assert e_full < 2e-3
    assert e_comp < 2e-3 and abs(e_comp - e_full) < 5e-4, (e_comp, e_full)
    assert e_deci < 2e-3, f"decimated-budget pose error {e_deci}"
    # Decimation really engaged: ~budget points, far fewer than the grid.
    assert float(r_deci.valid_pixels) <= lin_ops.compact_budget(
        N, 0.25, lin_ops._COMPACT_TILE_GATHER)
    assert float(r_deci.valid_pixels) < 0.3 * N


# ---------------------------------------------------------------------------
# Flat-tile pallas window under clustered / spread selection
# ---------------------------------------------------------------------------

def _spread_depth(z, keep_every=16):
    """Keep depth only on a sparse row grid: selection SPARSER than any
    budget fraction assumes, so compacted tiles span many rows."""
    z2 = np.full_like(z, np.nan)
    z2[::keep_every, :] = z[::keep_every, :]
    return z2


def test_flat_window_clustered_selection_no_misses():
    """CLUSTERED selection (all points in a narrow band) spans FEWER rows
    per tile than the density heuristic assumes — the window must cover it
    with zero misses and the linearization must match gather."""
    xi = np.array([0.003, -0.002, 0.001, 0.001, 0.0, 0.001])
    ref, cur, _ = _render_pair(xi)
    z_band = np.full_like(ref[1], np.nan)
    z_band[8:16, :] = ref[1][8:16, :]  # one 8-row band holds all selection
    ref_slab = _slab(ref[0], z_band)
    cur_slab = _slab(*cur)
    cfg = dataclasses.replace(
        CFG, intensity_grad_threshold=0.0, pallas_precision="highest",
        sampler_backend="pallas", point_budget_fraction=0.5,
    )
    Kd = camera.intrinsics(*K_TUPLE)
    comp = lin_ops.prepare_reference(ref_slab, Kd, cfg)
    cm = sampler.slab_to_cmajor(cur_slab)
    lin_p = lin_ops.linearize(comp, cur_slab, Kd, jnp.eye(4), cfg,
                              cur_cmajor=cm)
    assert float(lin_p.n_window_miss) == 0.0
    gcfg = dataclasses.replace(cfg, sampler_backend="gather")
    lin_g = lin_ops.linearize(comp, cur_slab, Kd, jnp.eye(4), gcfg)
    assert int(lin_p.n_raw) == int(lin_g.n_raw)
    scale_A = np.abs(np.asarray(lin_g.A)).max()
    np.testing.assert_allclose(np.asarray(lin_p.A), np.asarray(lin_g.A),
                               rtol=2e-4, atol=2e-4 * scale_A)


def test_flat_window_spread_selection_misses_surfaced_and_escalated():
    """SPREAD selection (sparser than the budget fraction assumes) makes
    one flat tile span more rows than the configured window: the kernel
    must surface the loss in window_miss (never silently mis-sample), and
    track_batched_escalating must rescue the frame with the gather
    backend."""
    xi = np.array([0.002, -0.001, 0.001, 0.0, 0.0, 0.001])
    ref, cur, _ = _render_pair(xi)
    z_sp = _spread_depth(ref[1], keep_every=8)  # rows 0,8,16,24 only
    cfg = dataclasses.replace(
        CFG, intensity_grad_threshold=0.0, sampler_backend="pallas",
        point_budget_fraction=0.5, pallas_compact_window_rows=2,
        pallas_margin=1, max_iterations=10,
    )
    Kd = camera.intrinsics(*K_TUPLE)
    Ks = camera.pyramid_intrinsics(Kd, 1)
    rp = pyramid.build_pyramid(jnp.asarray(ref[0]), jnp.asarray(z_sp), 1)
    cp = pyramid.build_pyramid(jnp.asarray(cur[0]), jnp.asarray(cur[1]), 1)

    cfg_noesc = dataclasses.replace(cfg, pallas_miss_escalate=0.0)
    res = dense_tracker.track_jit(rp, cp, Ks, jnp.eye(4), cfg_noesc)
    # The 2-row window (16 padded rows) cannot cover points spread over 32
    # rows: a large fraction must be REPORTED missing.
    assert float(res.window_miss_frac) > 0.2, float(res.window_miss_frac)

    cfg_esc = dataclasses.replace(cfg, pallas_miss_escalate=0.02)
    refs = tuple(jnp.stack([l]) for l in rp)
    esc = jax.jit(
        lambda r, c, T0: dense_tracker.track_batched_escalating(
            r, c, Ks, T0, cfg_esc),
        static_argnums=(),
    )(refs, cp, jnp.stack([jnp.eye(4)]))
    assert bool(np.asarray(esc.escalated).all())
    assert float(esc.window_miss_frac[0]) == 0.0  # gather path took over


def test_sampler_flat_mode_matches_bilinear_oracle():
    """sample_slab flat tiling (arbitrary point lists, window from the
    per-tile mean row) vs the golden bilinear oracle."""
    rng = np.random.default_rng(3)
    slab = jnp.asarray(rng.normal(size=(2, H, W)).astype(np.float32))
    # Points concentrated around row bands, shuffled order inside tiles
    # is NOT required by the contract (stable compaction keeps row-major),
    # so emulate compacted output: sorted rows with jitter.
    n = 512
    v = jnp.asarray(np.sort(rng.uniform(2.0, H - 3.0, n)).astype(np.float32))
    u = jnp.asarray(rng.uniform(0.0, W - 2.0, n).astype(np.float32))
    cm = sampler.slab_to_cmajor(slab)
    smp, valid, miss = sampler.sample_slab(
        cm, u, v, height=H, width=W, channels=2,
        flat_points_per_tile=128, window_rows=H,  # full-height window
        margin=1, precision=jax.lax.Precision.HIGHEST, interpret=True,
    )
    assert not bool(np.asarray(miss).any())
    ref_vals, ref_inb = interp.bilinear(
        jnp.transpose(slab, (1, 2, 0)), jnp.stack([u, v], axis=-1)
    )
    ok = np.asarray(valid) & np.asarray(ref_inb)
    assert ok.mean() > 0.95
    np.testing.assert_allclose(np.asarray(smp).T[ok],
                               np.asarray(ref_vals)[ok], atol=1e-5)
