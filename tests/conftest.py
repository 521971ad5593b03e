"""Test configuration: force CPU with 8 virtual devices.

Tests must be hermetic and runnable without TPU hardware; sharding tests use
the virtual 8-device CPU mesh (same mechanism the driver uses for the
multi-chip dry run).

Note: this machine may have a TPU attached through the experimental `axon`
PJRT plugin, whose sitecustomize unconditionally sets
jax_platforms="axon,cpu" at interpreter boot — env vars alone do NOT force
CPU here; the jax.config.update below must run before any backend use.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
