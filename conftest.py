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

# The container pins JAX_PLATFORMS=axon (TPU) via sitecustomize; the config
# update below overrides it reliably as long as no backend is live yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
