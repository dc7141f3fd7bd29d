"""Test harness: run all tests on a virtual 8-device CPU mesh.

The standard JAX trick for testing pjit/sharding logic without TPU pods
(SURVEY.md §4c): force the host platform and fake 8 devices. Note: this image
force-prepends the experimental 'axon' TPU platform to JAX_PLATFORMS, so the
env var alone is not enough — we must override jax.config before backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-heavy (e2e train tests),
# repeat runs reuse compiled executables instead of re-tracing XLA.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
