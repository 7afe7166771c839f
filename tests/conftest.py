"""Test configuration: force a virtual 8-device CPU mesh before JAX import.

The TPU build is validated for multi-chip semantics on a host-platform mesh
(`--xla_force_host_platform_device_count=8`), the TPU-world equivalent of a
fake backend (SURVEY.md §4). Real-chip benchmarks run via bench.py instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU platform via
# jax.config.update("jax_platforms", "axon,cpu"), which overrides the env
# var — override it back before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Keep compilation deterministic and fast on CPU.
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compile cache — this box has 2 CPUs; recompiles dominate
# test wall time without it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
