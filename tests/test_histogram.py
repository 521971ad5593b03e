"""Histogram/entropy utility tests (reference dvo/util/histogram.h)."""

import jax.numpy as jnp
import numpy as np

from dvo_slam_tpu.utils import histogram as hg


def test_histogram_counts():
    vals = jnp.asarray([0.1, 0.1, 0.5, 0.9, 2.0, -1.0])
    mask = jnp.asarray([True, True, True, True, True, False])
    h = np.asarray(hg.histogram(vals, mask, 0.0, 1.0, 4))
    # 0.1,0.1 -> bin 0; 0.5 -> bin 2; 0.9 -> bin 3; 2.0 clamps to bin 3;
    # -1.0 masked out.
    np.testing.assert_allclose(h, [2, 0, 1, 2])


def test_entropy_extremes():
    flat = jnp.ones(16)
    peaked = jnp.zeros(16).at[3].set(100.0)
    assert abs(float(hg.entropy(flat)) - 4.0) < 1e-5
    assert float(hg.entropy(peaked)) < 1e-5


def test_median_from_histogram():
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(loc=2.0, scale=0.5, size=4096).astype(np.float32))
    mask = jnp.ones(4096, bool)
    h = hg.histogram(vals, mask, 0.0, 4.0, 64)
    med = float(hg.median_from_histogram(h, 0.0, 4.0))
    assert abs(med - 2.0) < 0.1
