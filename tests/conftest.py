import os

# Force the CPU platform for tests.  The ambient environment routes jax to a
# remote TPU ("axon") whose registration hook calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
# overriding JAX_PLATFORMS — so we must update the config back after import.
# Tests run on a virtual 8-device CPU mesh; only the jitted bench path
# (bench.py) targets the real TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the jit-runner/sharding tests compile
# large gadget graphs (1-2 min each on CPU); caching makes re-runs of an
# unchanged graph near-instant.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (crypto/compile heavy)")
