"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
(data-parallel training over a Mesh) can be exercised without TPU hardware,
mirroring the reference's CPU-only CI (reference: .github/workflows/tests.yml).
"""

import os

# Must be set before jax is imported anywhere.
# hard-set: the container's sitecustomize registers the axon TPU backend in
# every python process and forces jax_platforms="axon,cpu" via config.update,
# so the env var alone is NOT enough - update the config after import too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compilation cache: compiles dominate test wall-clock on CPU
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache_dir))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the cache env vars above are read at jax IMPORT time, which the container's
# sitecustomize already triggered before this file ran - so they were silent
# no-ops and every pytest run recompiled from scratch. config.update after
# import is the mechanism that works (found by review; same class of bug as
# the CLI --device flag).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ["JAX_COMPILATION_CACHE_DIR"],
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
