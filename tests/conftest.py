"""Test env: force CPU JAX with 8 virtual devices (sharding tests), expose the
mounted PyTorch reference as the numerical oracle (SURVEY.md §4)."""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The env var JAX_PLATFORMS is overridden by the axon TPU plugin; the config
# knob is authoritative. Must run before any JAX backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_PATH = os.environ.get("REFERENCE_PATH", "/root/reference")
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
