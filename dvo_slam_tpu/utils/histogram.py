"""Histogram and entropy helpers.

TPU-native equivalent of the reference's dvo_core/include/dvo/util/
histogram.h (+ src/util/histogram.cpp): residual histograms and entropy
computations used for diagnostics. Implemented as jittable masked
fixed-bin histograms (bincount over quantized values — fixed shapes, no
data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp


def histogram(values, mask, low, high, bins):
    """Masked fixed-range histogram: (N,) values -> (bins,) counts.

    Out-of-range valid values are clamped into the edge bins (matching
    cv-style histogram behaviour the reference relies on for residual
    inspection).
    """
    scaled = (values - low) / (high - low) * bins
    idx = jnp.clip(scaled.astype(jnp.int32), 0, bins - 1)
    weights = mask.astype(jnp.float32)
    return jnp.bincount(idx, weights=weights, length=bins)


def entropy(hist):
    """Shannon entropy (bits) of a histogram (reference computeEntropy)."""
    total = jnp.maximum(hist.sum(), 1e-12)
    p = hist / total
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-12)), 0.0))


def median_from_histogram(hist, low, high):
    """Approximate median from a histogram (reference computeMedian)."""
    bins = hist.shape[0]
    cum = jnp.cumsum(hist)
    half = cum[-1] * 0.5
    idx = jnp.argmax(cum >= half)
    width = (high - low) / bins
    return low + (idx.astype(jnp.float32) + 0.5) * width
