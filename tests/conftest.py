"""Test harness config.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(shard_map + psum over a 1-D data mesh) execute without TPU hardware —
the TPU analog of a fake backend (SURVEY.md §4).

Note: this environment's sitecustomize registers a remote TPU PJRT plugin at
interpreter startup and pins ``jax_platforms``; plain env vars in conftest
are too late, so we override via ``jax.config`` before any backend is used
(remote compiles through the TPU tunnel would make the suite minutes-slow).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# PNG chart rendering fires inside every stats_report call; keep the suite
# fast by disabling it globally — tests/test_report.py re-enables it for
# the dedicated chart test.
os.environ.setdefault("HPGQ_CHARTS", "off")

if os.environ.get("HPGQ_DEBUG_NANS"):
    # SURVEY §5 sanitizer row: run the kernel/oracle differential suite with
    # NaN trapping (HPGQ_DEBUG_NANS=1 python -m pytest tests/ -q)
    jax.config.update("jax_debug_nans", True)
