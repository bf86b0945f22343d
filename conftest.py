"""Pytest root conftest: force the CPU backend with 8 virtual devices so
sharding/mesh tests run without TPU hardware (SURVEY.md §4).

Must run before jax is imported anywhere.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compile cache for the CPU test tier: the first run of each
# heavy program (packed engines, interpret-mode Pallas kernels, samplers)
# costs tens of seconds of XLA compile; cached executables keep the warm
# fast tier under the 2-minute budget.  Set as an ENV var so subprocess
# tests (tests/test_multihost.py) inherit it too.
_cache_dir = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache_cpu"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.25")

# The container pins JAX_PLATFORMS=axon (TPU) via sitecustomize; the config
# update below overrides it reliably as long as no backend is live yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
