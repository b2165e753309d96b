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
