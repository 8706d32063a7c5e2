"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The driver benches on one real TPU chip; tests validate numerics and the
multi-chip sharding path on host CPU devices (SURVEY.md §4 "Implication").

Note: this image's sitecustomize imports jax at interpreter startup (axon TPU
tunnel), so env vars set here are already captured — override through
jax.config instead. XLA_FLAGS still works because backends have not been
initialised yet at conftest time.
"""
import os

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache across test runs (the suite is compile-bound:
# ~85% of its wall-clock is jit compiles of the same tiny programs).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
