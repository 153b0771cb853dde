"""Test harness configuration.

Tests run on CPU with 8 virtual devices so mesh collectives are exercised
without TPU hardware (SURVEY.md §4 "multi-device tests ... via
--xla_force_host_platform_device_count").  The host environment pins the
"axon" TPU platform via sitecustomize (which overrides JAX_PLATFORMS through
jax.config), so this both sets the env var AND forces the config back to cpu
before any test imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

from tdr.utils.jax_cache import enable as _enable_jax_cache

_enable_jax_cache()
