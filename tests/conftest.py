"""Test harness: force an 8-virtual-device CPU platform so sharding logic is
exercised without TPUs (SURVEY.md §4 implication) and compiles stay fast.

Note: this machine's sitecustomize pins JAX_PLATFORMS=axon (a remote-TPU
tunnel); the env var alone is not enough — jax.config.update after import is
what actually wins, so do both, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# persistent compilation cache: shaves repeated-suite compile time
import os as _os

_cache = "/root/.cache/jax_compilation_cache"
_os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
