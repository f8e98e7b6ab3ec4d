"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run against a virtual CPU mesh (SURVEY.md §4),
so the suite never needs real TPU hardware. The environment may pre-register
a TPU PJRT plugin with JAX_PLATFORMS pinned, so we override through
jax.config (which wins even after plugin registration).
"""

import os

# Must run before jax creates any backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles several large fused
# steps; caching makes repeat runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mmseg_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
