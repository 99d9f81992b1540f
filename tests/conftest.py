"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is covered by bench.py and __graft_entry__.py; unit tests
use the CPU backend for speed/determinism, with 8 virtual devices so
sharding/`shard_map` paths are exercised without a TPU slice (SURVEY.md §4).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the shell env pins JAX_PLATFORMS=axon (TPU) and the plugin ignores env-var
# overrides — config.update is authoritative
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: the suite is compile-dominated on this
# single-core host; warm re-runs (the `-m "not slow"` dev loop) skip XLA
# recompiles entirely. Keyed by platform, so it coexists with bench's TPU
# entries in the same directory.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), os.pardir,
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

assert jax.devices()[0].platform == "cpu"
