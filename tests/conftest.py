"""Test harness configuration.

Tests run on CPU with 8 virtual devices so mesh collectives are exercised
without TPU hardware (SURVEY.md §4 "multi-device tests ... via
--xla_force_host_platform_device_count").  Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
