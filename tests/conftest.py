"""Test harness config.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(shard_map + psum over a 1-D data mesh) execute without TPU hardware —
the TPU analog of a fake backend (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
