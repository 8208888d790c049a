"""Test configuration.

- Forces JAX onto CPU with 8 virtual devices so multi-chip sharding semantics
  are testable without a pod (SURVEY.md §4: mocked-mesh distributed tests).
- Enables x64: the reference stack (GPflow 1.x) is float64 end-to-end, and
  the oracle tests check parity at float64.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize force-selects jax_platforms="axon,cpu" at interpreter
# start (overriding the JAX_PLATFORMS env var), so the CPU pin must go through
# jax.config after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache cuts repeat test-suite wall-clock.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
