"""Test configuration: force CPU with 8 virtual devices.

Tests must be hermetic and runnable without TPU hardware; sharding tests use
the virtual 8-device CPU mesh (same mechanism the driver uses for the
multi-chip dry run). Env vars must be set before jax initializes.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
