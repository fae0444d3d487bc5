"""Root pytest conftest: force the CPU backend with 8 virtual devices.

This environment ships an `axon` PJRT sitecustomize hook that claims the
single tunneled TPU at interpreter start; running the unit-test suite against
it would serialize every tiny op over the tunnel. Tests therefore always run
on a virtual 8-device CPU mesh. The override happens here, before any JAX
backend is initialized (the sitecustomize only *registers* the plugin).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache — the TPU-native analogue of the
# reference's CppAD generated-code cache (SURVEY.md §3.4). First run of the
# solver tests compiles (~minutes); subsequent runs load from cache.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
