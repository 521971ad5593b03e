"""Pallas TPU kernel: 2-D windowed bilinear slab sampling via MXU one-hot
matmuls.

This is the framework's equivalent of the reference's hand-written SSE
sampling core (dvo_core/src/core/interpolation.cpp +
dense_tracking_impl.cpp computeResidualsSse): the per-iteration bilinear
fetch of [I2, Z2, dI2, dZ2] at every warped reference pixel — the hot 60%+
of the IRLS iteration.

Why not gathers: XLA's row-gather costs ~9 cycles/point on v5e (~0.7 ms for
a 320x240 level); Mosaic only supports single-vreg dynamic gathers. Instead
each grid step processes one (rows_per_tile x cols_per_tile) TILE of
reference points, DMAs the corresponding 2-D window of the current frame
into VMEM, and evaluates the bilinear sample as a one-hot contraction over
window COLUMNS on the MXU followed by a one-hot row combine on the VPU:

    T1 = win @ Cw    win: (C*Hw, Wc) channel-blocked window rows,
                     Cw: (Wc, P) column one-hot with bilinear x-weights
                     ->  T1: (C*Hw, P)                         (MXU)
    out[c] = sum_k R[k, :] * T1[c*Hw + k, :]   row one-hot y-weights (VPU)

Column windows are the round-4 addition: with full-width rows (v3) the
contraction K was the padded image width (384 at 320x240) and — more
importantly — the (K, P) one-hot Cw had to be BUILT with VPU
compare/selects every iteration, which measured as the dominant ~75% of
the sampler (the MXU matmul itself is only ~25%). Tiling reference points
into (rows x cols) blocks bounds each tile's warped-u span so the one-hot
shrinks.

Lane alignment (the v4 -> v5 lesson): Mosaic requires dynamic lane (width)
offsets to be 128-aligned, but a useful column window can start anywhere.
v4 lane-ROTATED a wider aligned window so the tight Wc-column window
landed at lane 0 — measured, the dynamic rotate costs as much as the
one-hot it saves (it moves the full (C*Hw, W) window per tile, with a
bf16->f32 round-trip because Mosaic's rotate is 32-bit). v5 instead keeps
the window in the 128-ALIGNED frame: slice (C*Hw, WcD) at the aligned
floor ox (WcD = round128(Wc) + 128, so any un-aligned span fits), and
build the one-hot directly against WINDOW-LOCAL columns x0 - ox. No data
movement at all beyond the slice the matmul reads anyway; K = WcD (256 at
level 1, vs the full 384; 256 vs 768 at 640x480), and the one-hot build —
the real cost, O(K*N) VPU compare/selects — shrinks with it. Row
(sublane) offsets may be 8-aligned directly, so rows slice at their exact
8-aligned origin.

Every tensor keeps points on the LANE dimension (P lanes); the warp
coordinates arrive as (NT, 1, P) blocks (tile-permuted from row-major by
sample_slab) and the one-hot matrices broadcast a (1, P) value row against
a sublane iota — no relayouts. The warp itself (projecting reference points
by the pose candidate) runs in XLA outside the kernel where flat (N,)
lane-major math is already optimal.

Window semantics: points whose warped coordinate falls outside their tile's
row window [oy, oy + Hw) or aligned column window [ox, ox + WcD) are
reported invalid (margin `margin` rows around the tile; columns get >= 64
of guaranteed slack from the aligned window's 128-lane headroom; the
coarse pyramid levels fall back to whole-image windows, so large motions
are handled there — by the fine levels the residual motion is a few
pixels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output channel rows (channel-major (8, N)).
OUT_CHANNELS = 8  # [I, Z, Ix, Iy, Zx, Zy, finite_mask, window_ok]

# A bilinear sample of the 0/1 finiteness-mask channel equals 1.0 only when
# the full 2x2 footprint is finite; a NaN at any corner drops it by at
# least that corner's bilinear weight. The validity threshold is therefore
# per-point (1 - max(w_min/2, noise)): exact gather-path NaN parity
# whenever the smallest corner weight w_min exceeds the matmul rounding
# noise, and slip-throughs bounded by `noise` relative bias otherwise.
_MASK_NOISE_DEFAULT = 4e-3  # bf16 one-hot weights: ~2^-8 rounding
_MASK_NOISE_HIGHEST = 1e-5  # f32 passes

# Slabs at or below this stay VMEM-resident for the whole sampling call
# (one load, zero per-tile DMA); larger ones use the per-tile DMA kernel.
# 4 MB leaves ample VMEM (16 MB/core) for the (C*Hw, P) matmul
# intermediate, the coordinate blocks, and pallas's output double buffer
# — bf16 levels 1..3 and the f32 level-1 slab all fit.
_RESIDENT_SLAB_BYTES = 4 * 1024 * 1024


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def select_tiling(Hr, W, max_rows, max_cols, margin, Wp=None):
    """Pick (rows_per_tile, cols_per_tile) for sample_slab.

    rows_per_tile: the largest divisor of Hr <= max_rows whose full-width
    band stays lane-aligned ((d*W) % 128 == 0); whole-shard fallback
    otherwise (coarse levels — full-image windows).

    cols_per_tile: the largest divisor of W <= max_cols that (a) keeps the
    per-tile point count lane-aligned, (b) actually tiles (>= 2 column
    tiles), and (c) yields a window that actually shrinks the contraction:
    the kernel's aligned window is WcD = round128(Wc) + 128 lanes wide
    (any un-aligned Wc-column span fits inside it), so column windows only
    pay when WcD < Wp — at Wp <= 256 (the coarse levels) they are
    disabled (value 0).
    """
    Wp = Wp if Wp is not None else _round_up(W + 1, 128)
    cand = [d for d in range(1, min(max_rows, Hr) + 1)
            if Hr % d == 0 and (d * W) % 128 == 0]
    rpt = max(cand) if cand else Hr
    wt = 0
    if max_cols > 0:
        for d in range(min(max_cols, W), 0, -1):
            if W % d or W // d < 2 or (rpt * d) % 128:
                continue
            Wc = _round_up(d + 2 * margin + 2, 8)
            if _round_up(Wc, 128) + 128 >= Wp:
                continue
            wt = d
            break
    return rpt, wt


def _interp_and_store(x0_ref, fx_ref, y0_ref, fy_ref, out_ref, w2, *,
                      s, oy, Hw, Wc, C, precision, dtype):
    """Shared tail of both kernels: one-hot bilinear interpolation of the
    (C*Hw, Wc) window value w2 at this tile's points, written to out_ref."""
    P = x0_ref.shape[2]
    x0 = x0_ref[0] - s  # (1, P) window-local column
    fx = fx_ref[0]
    okx = (x0 >= 0) & (x0 <= Wc - 2)
    x0c = jnp.clip(x0, 0, Wc - 2)
    m = jax.lax.broadcasted_iota(jnp.int32, (Wc, P), 0)
    # Column one-hot in the slab's dtype (bf16 slabs: the MXU quantizes
    # DEFAULT-precision inputs to bf16 anyway, so this loses nothing).
    Cw = jnp.where(m == x0c, 1.0 - fx, jnp.where(m == x0c + 1, fx, 0.0)
                   ).astype(dtype)  # (Wc, P)

    y0l = y0_ref[0] - oy  # (1, P) int32, window-local
    oky = (y0l >= 0) & (y0l <= Hw - 2)
    y0c = jnp.clip(y0l, 0, Hw - 2)
    fy = fy_ref[0]  # (1, P)
    k = jax.lax.broadcasted_iota(jnp.int32, (Hw, P), 0)
    R = jnp.where(k == y0c, 1.0 - fy, jnp.where(k == y0c + 1, fy, 0.0))  # (Hw, P)

    # Column interpolation on the MXU: contract the window width.
    T1 = jax.lax.dot_general(
        w2, Cw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (C*Hw, P)

    # Row interpolation: per-channel one-hot weighted sublane reduction.
    for c in range(C):
        Tc = T1[c * Hw: (c + 1) * Hw, :]  # (Hw, P)
        out_ref[c, :] = jnp.sum(R * Tc, axis=0)
    ok = oky & okx
    out_ref[C, :] = ok[0, :].astype(jnp.float32)
    for c in range(C + 1, OUT_CHANNELS):
        out_ref[c, :] = jnp.zeros((P,), jnp.float32)


def _sample_kernel_resident(oy_ref, ox_ref, x0_ref, fx_ref, y0_ref, fy_ref,
                            slab_ref, out_ref, *, Hw, Hpad, WcD, Wp, C,
                            precision, col_window):
    """VMEM-resident slab variant: the whole slab is a pallas input block
    loaded ONCE per call (constant index map — no per-tile DMA at all; the
    per-band window DMA traffic was the v3 kernel's measured bottleneck,
    ~12 MB re-fetched per IRLS iteration at level 1). Each grid step reads
    its (row x aligned-column) window straight out of VMEM; the one-hot is
    built window-local, so no rotate and no data movement beyond the slice
    the matmul reads anyway."""
    i = pl.program_id(0)
    oy = pl.multiple_of(oy_ref[i], 8)
    if col_window:
        ox = pl.multiple_of(ox_ref[i], 128)
        w2 = jnp.concatenate(
            [slab_ref[pl.ds(c * Hpad + oy, Hw), pl.ds(ox, WcD)]
             for c in range(C)], axis=0
        )  # (C*Hw, WcD)
    else:
        ox = 0
        w2 = jnp.concatenate(
            [slab_ref[pl.ds(c * Hpad + oy, Hw), :] for c in range(C)],
            axis=0
        )  # (C*Hw, Wp)
    _interp_and_store(x0_ref, fx_ref, y0_ref, fy_ref, out_ref, w2,
                      s=ox, oy=oy, Hw=Hw, Wc=w2.shape[1], C=C,
                      precision=precision, dtype=slab_ref.dtype)


def _sample_kernel(oy_ref, ox_ref, x0_ref, fx_ref, y0_ref, fy_ref, slab_ref,
                   out_ref, win, sem, *, Hw, Hpad, WcD, C, precision,
                   col_window):
    """HBM slab variant (slabs too large for VMEM residency, e.g. the f32
    full-resolution level): per-tile async DMA of the (Hw, WcD) window at
    the 128-aligned origin ox; the one-hot is built window-local."""
    i = pl.program_id(0)
    oy = pl.multiple_of(oy_ref[i], 8)
    ox = pl.multiple_of(ox_ref[i], 128) if col_window else 0

    # One DMA per channel block: slab rows [c*Hpad + oy, +Hw), window
    # columns [ox, +WcD) -> win rows [c*Hw, +Hw). Started first; overlap
    # with coordinate prep.
    dmas = []
    for c in range(C):
        src = slab_ref.at[pl.ds(c * Hpad + oy, Hw), pl.ds(ox, WcD)]
        dst = win.at[pl.ds(c * Hw, Hw), :]
        dma = pltpu.make_async_copy(src, dst, sem.at[c])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()
    _interp_and_store(x0_ref, fx_ref, y0_ref, fy_ref, out_ref, win[:],
                      s=ox, oy=oy, Hw=Hw, Wc=WcD, C=C, precision=precision,
                      dtype=slab_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("height", "channels", "rows_per_tile", "margin",
                     "precision", "interpret", "width", "cols_per_tile",
                     "flat_points_per_tile", "window_rows"),
)
def sample_slab(slab_cmajor, u, v, height, channels=6, rows_per_tile=8,
                margin=16, precision=jax.lax.Precision.DEFAULT,
                interpret=False, width=None, cols_per_tile=0,
                flat_points_per_tile=0, window_rows=0):
    """Bilinearly sample all C channels at warped coords.

    Args:
      slab_cmajor: ((C+1)*Hpad, Wp) channel-blocked slab from
        slab_to_cmajor (per-channel row blocks padded to 8 rows, width
        padded to 128; block C is the finiteness mask, NaNs zeroed).
      u, v: (N,) warped pixel coordinates for the ref grid, row-major
        (N = Hr*W with W the unpadded image width and Hr the number of
        REFERENCE rows behind these points — Hr == H unless the reference
        grid is row-sharded across devices, in which case each shard
        passes its own N while the slab/height stay the full image).
      height: the unpadded CURRENT image height H (static; bounds checks
        and window clamping).
      width: the unpadded image width W (static). Default None infers
        N // height — correct only when Hr == H; sharded callers MUST
        pass it (a shard's N would silently imply a wrong width).
      channels: number of real (pre-mask) channels C in the slab (static).
      rows_per_tile: reference rows per tile (must divide Hr; with
        cols_per_tile == 0 additionally rows_per_tile*W must be a multiple
        of 128 — select_tiling picks it).
      cols_per_tile: reference columns per tile. 0 (default) = full-width
        bands (no column window). Otherwise must divide W with
        rows_per_tile*cols_per_tile a multiple of 128, and the feasibility
        conditions of select_tiling must hold — use select_tiling.
      margin: window margin in rows AND columns around each tile.
      precision: MXU precision of the one-hot matmul. DEFAULT is a single
        bf16 pass (~2^-9 relative sampling quantization — at the scale of
        Kinect depth noise, absorbed by the robust Sigma estimate);
        HIGHEST is exact to f32 at ~3x the sampling cost.
      flat_points_per_tile: > 0 switches to FLAT tiling for COMPACTED
        point lists (ops/linearize.compact_reference): the points carry
        no (Hr, W) grid structure, so each tile is simply the next
        `flat_points_per_tile` consecutive points (must divide N; a
        multiple of 128). Requires `width` and `window_rows`;
        rows_per_tile / cols_per_tile are ignored. Correctness never
        depended on grid order — the per-tile window origin comes from
        the MEAN warped coordinate either way — only the window SIZE
        did, which window_rows replaces.
      window_rows: flat mode only — the assumed warped-row span of one
        tile's points (stable compaction keeps row-major order, so ~
        points_per_tile / (selection_density * W) plus inter-frame
        motion). The window is round_up(window_rows + 2*margin + 2, 8)
        + 8 rows, clamped to the image; points outside are reported in
        window_miss exactly as in grid mode.

    Returns:
      samples: (C, N) sampled channels (garbage where invalid).
      valid:   (N,) bool — in-window AND full 2x2 footprint in-bounds AND
        every footprint pixel finite in every channel (the gather path's
        per-point NaN semantics, via the sampled mask channel).
      window_miss: (N,) bool — in-bounds points masked ONLY because their
        warped coordinate left the tile's window (indistinguishable from
        genuine invalidity in `valid`; callers surface/escalate on this
        count — the kernel's one silent-accuracy failure mode).
    """
    CHpad, Wp = slab_cmajor.shape
    C = channels + 1  # +1: finiteness-mask channel travels with the data
    assert C + 1 <= OUT_CHANNELS, channels
    Hpad = CHpad // C
    N = u.shape[0]
    H = height
    flat = flat_points_per_tile > 0
    if flat:
        assert width is not None, "flat tiling requires explicit width"
        assert window_rows > 0, "flat tiling requires window_rows"
        W = width
        P = flat_points_per_tile
        NT = N // P
        NTx = 1
        col_window = False
        assert NT * P == N and P % 128 == 0, (N, P)
        Hw = min(Hpad, _round_up(window_rows + 2 * margin + 2, 8) + 8)
    else:
        W = width if width is not None else N // H
        Hr = N // W  # reference rows behind the points (== H unless sharded)
        rpt = rows_per_tile
        wt = cols_per_tile if cols_per_tile else W
        col_window = bool(cols_per_tile) and wt < W
        NTy = Hr // rpt
        NTx = W // wt
        P = rpt * wt
        NT = NTy * NTx
        assert NT * P == N, (H, W, Hr, N, rpt, wt)
        Hw = min(Hpad, _round_up(rpt + 2 * margin + 2, 8) + 8)
    # Slabs that fit comfortably in VMEM stay RESIDENT across the whole
    # grid (loaded once per call): the v3 kernel's per-band window DMAs
    # re-fetched ~12 MB of slab per IRLS iteration at level 1 and were the
    # measured bottleneck. Larger slabs (f32 full-resolution) keep the
    # per-tile async-DMA path.
    resident = (slab_cmajor.size * slab_cmajor.dtype.itemsize
                <= _RESIDENT_SLAB_BYTES)
    if col_window:
        Wc = _round_up(wt + 2 * margin + 2, 8)
        WcD = _round_up(Wc, 128) + 128
        if WcD >= Wp:
            # The aligned window is as wide as the slab: no contraction
            # shrink to be had — full-width bands.
            col_window = False
            WcD = Wp
    else:
        WcD = Wp

    u0f = jnp.floor(u)
    v0f = jnp.floor(v)
    inb = (u0f >= 0) & (v0f >= 0) & (u0f <= W - 2) & (v0f <= H - 2)
    x0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(v0f.astype(jnp.int32), 0, H - 2)
    fx = (u - x0.astype(u.dtype)).astype(jnp.float32)
    fy = (v - y0.astype(v.dtype)).astype(jnp.float32)

    def tile(a):
        """(N,) row-major -> (NT, 1, P) tile blocks."""
        if NTx == 1:
            return a.reshape(NT, 1, P)
        return (a.reshape(NTy, rpt, NTx, wt)
                 .transpose(0, 2, 1, 3).reshape(NT, 1, P))

    def tile_mean(a):
        """(N,) row-major -> (NT,) per-tile mean."""
        if flat:
            return a.reshape(NT, P).mean(axis=1)
        return a.reshape(NTy, rpt, NTx, wt).mean(axis=(1, 3)).reshape(NT)

    # Per-tile window origins from the mean clipped warped coordinate.
    # Rows: clamped inside the (padded) image and 8-aligned (DMA sublane
    # alignment). The +4 bias centers the 8-row alignment floor's error
    # (otherwise the floor can eat up to 7 rows of the UPPER margin — at
    # margin 1 that masked points with zero motion whenever
    # band_row % 8 == 7). Points farther than the window from the tile
    # mean are masked, not mis-sampled.
    v_clip = jnp.clip(v, 0.0, H - 1.0)
    oy = jnp.clip(
        jnp.round(tile_mean(v_clip)).astype(jnp.int32) - Hw // 2 + 4,
        0, Hpad - Hw,
    )
    oy = (oy // 8) * 8
    # Columns: the window origin ox must be 128-aligned (Mosaic dynamic
    # lane offsets). WcD = round128(Wc) + 128 guarantees any Wc-column
    # span fits in an aligned window; the +64 bias centers the 128-floor's
    # error so each side keeps >= 64 columns of slack around the tile's
    # mean warped column (>= the Wc/2 span by construction).
    if col_window:
        u_clip = jnp.clip(u, 0.0, W - 1.0)
        ideal = jnp.round(tile_mean(u_clip)).astype(jnp.int32) - WcD // 2 + 64
        ox = jnp.clip((ideal // 128) * 128, 0, Wp - WcD)
    else:
        ox = jnp.zeros((NT,), jnp.int32)

    if resident:
        kernel = functools.partial(
            _sample_kernel_resident, Hw=Hw, Hpad=Hpad, WcD=WcD, Wp=Wp, C=C,
            precision=precision, col_window=col_window,
        )
        slab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
    else:
        kernel = functools.partial(
            _sample_kernel, Hw=Hw, Hpad=Hpad, WcD=WcD, C=C,
            precision=precision, col_window=col_window,
        )
        slab_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((C * Hw, WcD), slab_cmajor.dtype),
            pltpu.SemaphoreType.DMA((C,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # oy, ox: (NT,) int32
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, 1, P), lambda i, oy, ox: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, oy, ox: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, oy, ox: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, oy, ox: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            slab_spec,
        ],
        out_specs=pl.BlockSpec((OUT_CHANNELS, P), lambda i, oy, ox: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUT_CHANNELS, N), jnp.float32),
        interpret=interpret,
    )(
        oy,
        ox,
        tile(x0),
        tile(fx),
        tile(y0),
        tile(fy),
        slab_cmajor,
    )
    if NTx > 1:
        # Back to row-major point order.
        out = (out.reshape(OUT_CHANNELS, NTy, NTx, rpt, wt)
                  .transpose(0, 1, 3, 2, 4).reshape(OUT_CHANNELS, N))
    noise = (_MASK_NOISE_HIGHEST if precision == jax.lax.Precision.HIGHEST
             else _MASK_NOISE_DEFAULT)
    w_min = jnp.minimum(fx, 1.0 - fx) * jnp.minimum(fy, 1.0 - fy)
    thresh = 1.0 - jnp.maximum(0.5 * w_min, noise)
    in_window = out[C] > 0.5
    valid = inb & in_window & (out[channels] >= thresh)
    return out[:channels], valid, inb & ~in_window


def slab_to_cmajor(slab, dtype=None, mask_channels=None):
    """(C, H, W) -> ((C+1)*Hpad, Wp) channel-blocked kernel layout.

    dtype: optional storage dtype. bfloat16 halves the per-band window DMA
    traffic and is LOSSLESS relative to DEFAULT-precision sampling (the
    MXU quantizes its inputs to bf16 there regardless) — use it whenever
    pallas_precision == "default"; keep f32 for "highest".

    mask_channels: channel indices whose finiteness defines point validity
    (default: all). Photometric-only tracking (use_depth=False) passes the
    intensity channels so depth holes don't invalidate photometrically
    valid pixels — matching the gather path's validity semantics.

    Once per frame/level (a pad + reshape — the slab is already
    channel-major): channel c occupies rows [c*Hpad, c*Hpad + H) with
    Hpad = round_up(H, 8); width padded to a multiple of 128 (DMA
    alignment). Padding is zero-filled and never selected (y0/x0 are
    clipped to H-2/W-2 and out-of-image footprints are masked upstream).

    NaN handling (TUM depth is full of NaN-invalid pixels): a single NaN
    anywhere in a band's row window would poison the one-hot matmul for
    EVERY point in that band (NaN * 0 = NaN), so invalid pixels are zeroed
    here and an extra 0/1 all-channels-finite mask channel (block C) is
    appended; sample_slab samples it through the same kernel and requires
    ~1.0 for validity — reproducing the gather path's per-point NaN
    semantics without NaNs ever entering the MXU.
    """
    C, H, W = slab.shape
    mask_src = (slab if mask_channels is None
                else slab[jnp.asarray(mask_channels)])
    finite = jnp.isfinite(mask_src).all(axis=0).astype(slab.dtype)
    slab = jnp.concatenate(
        [jnp.where(jnp.isfinite(slab), slab, 0.0), finite[None]], axis=0
    )
    Hpad = _round_up(H, 8)
    # W+1: widths that are exact multiples of 128 get a full extra lane
    # tile of zero padding — without it the column-window DMA origin
    # (128-aligned, WcD wide) cannot reach the image's right edge and
    # select_tiling would have to disable column windows for those levels
    # (e.g. the 640-wide full-resolution level). Other widths unchanged.
    Wp = _round_up(W + 1, 128)
    chan = jnp.pad(slab, ((0, 0), (0, Hpad - H), (0, Wp - W)))
    out = chan.reshape((C + 1) * Hpad, Wp)
    return out.astype(dtype) if dtype is not None else out
