"""Pallas TPU kernel: windowed bilinear slab sampling via MXU one-hot matmuls.

This is the framework's equivalent of the reference's hand-written SSE
sampling core (dvo_core/src/core/interpolation.cpp +
dense_tracking_impl.cpp computeResidualsSse): the per-iteration bilinear
fetch of [I2, Z2, dI2, dZ2] at every warped reference pixel — the hot 60%+
of the IRLS iteration.

Why not gathers: XLA's row-gather costs ~9 cycles/point on v5e (~0.7 ms for
a 320x240 level); Mosaic only supports single-vreg dynamic gathers. Instead
each grid step processes one horizontal band of reference points, DMAs the
corresponding (8-aligned) row-windows of the current frame into VMEM, and
evaluates the bilinear sample as a one-hot contraction over COLUMNS on the
MXU followed by a one-hot row combine on the VPU:

    T1 = win @ Cw    win: (C*Hw, Wp) channel-blocked window rows,
                     Cw: (Wp, P) column one-hot with bilinear x-weights
                     ->  T1: (C*Hw, P)                         (MXU)
    out[c] = sum_k R[k, :] * T1[c*Hw + k, :]   row one-hot y-weights (VPU)

Column-first ordering matters: it contracts over the image width (K = Wp,
good MXU utilization) and the intermediate is (C*Hw, P) — ~6x smaller than
the row-first order's (C*W, P), which was VMEM-traffic-bound.

Every tensor keeps points on the LANE dimension (P lanes); the warp
coordinates arrive as (NT, 1, P) row blocks and the one-hot matrices
broadcast a (1, P) value row against a sublane iota — no relayouts. (An
earlier point-sublane-major formulation spent ~1.7 ms/iteration on thin
(N, 1) input DMAs and per-store relayouts; the row-first lane-major one
0.43 ms.)

The warp itself (projecting reference points by the pose candidate) runs in
XLA outside the kernel where flat (N,) lane-major math is already optimal.

Window semantics: points whose warped row falls outside the band's
[oy, oy + Hw) window are reported invalid (window margin `margin` rows; the
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


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _sample_kernel(oy_ref, x0_ref, fx_ref, y0_ref, fy_ref, slab_ref, out_ref,
                   win, sem, *, Hw, Hpad, W, Wp, C, precision):
    P = x0_ref.shape[2]
    oy = pl.multiple_of(oy_ref[pl.program_id(0)], 8)

    # One DMA per channel block: slab rows [c*Hpad + oy, +Hw) -> win rows
    # [c*Hw, +Hw). Started first; overlap with one-hot construction.
    dmas = []
    for c in range(C):
        src = slab_ref.at[pl.ds(c * Hpad + oy, Hw), :]
        dst = win.at[pl.ds(c * Hw, Hw), :]
        dma = pltpu.make_async_copy(src, dst, sem.at[c])
        dma.start()
        dmas.append(dma)

    x0 = x0_ref[0]  # (1, P)
    fx = fx_ref[0]
    m = jax.lax.broadcasted_iota(jnp.int32, (Wp, P), 0)
    # Column one-hot in the slab's dtype (bf16 slabs: the MXU quantizes
    # DEFAULT-precision inputs to bf16 anyway, so this loses nothing).
    Cw = jnp.where(m == x0, 1.0 - fx, jnp.where(m == x0 + 1, fx, 0.0)
                   ).astype(slab_ref.dtype)  # (Wp, P)

    y0l = y0_ref[0] - oy  # (1, P) int32, window-local
    ok = (y0l >= 0) & (y0l <= Hw - 2)
    y0c = jnp.clip(y0l, 0, Hw - 2)
    fy = fy_ref[0]  # (1, P)
    k = jax.lax.broadcasted_iota(jnp.int32, (Hw, P), 0)
    R = jnp.where(k == y0c, 1.0 - fy, jnp.where(k == y0c + 1, fy, 0.0))  # (Hw, P)

    for dma in dmas:
        dma.wait()
    # Column interpolation on the MXU: contract the width dimension.
    T1 = jax.lax.dot_general(
        win[:], Cw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (C*Hw, P)

    # Row interpolation: per-channel one-hot weighted sublane reduction.
    for c in range(C):
        Tc = T1[c * Hw : (c + 1) * Hw, :]  # (Hw, P)
        out_ref[c, :] = jnp.sum(R * Tc, axis=0)
    out_ref[C, :] = ok[0, :].astype(jnp.float32)
    for c in range(C + 1, OUT_CHANNELS):
        out_ref[c, :] = jnp.zeros((P,), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("height", "channels", "rows_per_tile", "margin",
                     "precision", "interpret", "width"),
)
def sample_slab(slab_cmajor, u, v, height, channels=6, rows_per_tile=8,
                margin=16, precision=jax.lax.Precision.DEFAULT,
                interpret=False, width=None):
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
      rows_per_tile: reference rows per grid step (must divide Hr with
        rows_per_tile*W a multiple of 128 — ops/linearize.py picks it).
      margin: window margin in rows above/below the band.
      precision: MXU precision of the one-hot matmul. DEFAULT is a single
        bf16 pass (~2^-9 relative sampling quantization — at the scale of
        Kinect depth noise, absorbed by the robust Sigma estimate);
        HIGHEST is exact to f32 at ~3x the sampling cost.

    Returns:
      samples: (C, N) sampled channels (garbage where invalid).
      valid:   (N,) bool — in-window AND full 2x2 footprint in-bounds AND
        every footprint pixel finite in every channel (the gather path's
        per-point NaN semantics, via the sampled mask channel).
      window_miss: (N,) bool — in-bounds points masked ONLY because their
        warped row left the band's window (indistinguishable from genuine
        invalidity in `valid`; callers surface/escalate on this count —
        the kernel's one silent-accuracy failure mode).
    """
    CHpad, Wp = slab_cmajor.shape
    C = channels + 1  # +1: finiteness-mask channel travels with the data
    assert C + 1 <= OUT_CHANNELS, channels
    Hpad = CHpad // C
    N = u.shape[0]
    H = height
    W = width if width is not None else N // H
    Hr = N // W  # reference rows behind the points (== H unless sharded)
    P = rows_per_tile * W
    NT = Hr // rows_per_tile
    assert NT * P == N, (H, W, Hr, N, rows_per_tile)
    Hw = min(Hpad, _round_up(rows_per_tile + 2 * margin + 2, 8) + 8)

    u0f = jnp.floor(u)
    v0f = jnp.floor(v)
    inb = (u0f >= 0) & (v0f >= 0) & (u0f <= W - 2) & (v0f <= H - 2)
    x0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(v0f.astype(jnp.int32), 0, H - 2)
    fx = (u - x0.astype(u.dtype)).astype(jnp.float32)
    fy = (v - y0.astype(v.dtype)).astype(jnp.float32)

    # Per-band window origin: mean clipped warped row, clamped inside the
    # (padded) image and 8-aligned (DMA alignment). Points farther than the
    # window from the band mean are masked, not mis-sampled. The +4 bias
    # centers the 8-row alignment floor's error (otherwise the floor can
    # eat up to 7 rows of the UPPER margin — at margin 1 that masked
    # points with zero motion whenever band_row % 8 == 7).
    v_clip = jnp.clip(v, 0.0, H - 1.0).reshape(NT, P)
    oy = jnp.clip(
        jnp.round(v_clip.mean(axis=1)).astype(jnp.int32) - Hw // 2 + 4,
        0, Hpad - Hw,
    )
    oy = (oy // 8) * 8

    kernel = functools.partial(
        _sample_kernel, Hw=Hw, Hpad=Hpad, W=W, Wp=Wp, C=C, precision=precision
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # oy (NT,) int32
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, 1, P), lambda i, oy: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, oy: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, oy: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, oy: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # slab: compiler-placed
        ],
        out_specs=pl.BlockSpec((OUT_CHANNELS, P), lambda i, oy: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C * Hw, Wp), slab_cmajor.dtype),
            pltpu.SemaphoreType.DMA((C,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUT_CHANNELS, N), jnp.float32),
        interpret=interpret,
    )(
        oy,
        x0.reshape(NT, 1, P),
        fx.reshape(NT, 1, P),
        y0.reshape(NT, 1, P),
        fy.reshape(NT, 1, P),
        slab_cmajor,
    )
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
    Wp = _round_up(W, 128)
    chan = jnp.pad(slab, ((0, 0), (0, Hpad - H), (0, Wp - W)))
    out = chan.reshape((C + 1) * Hpad, Wp)
    return out.astype(dtype) if dtype is not None else out
