import os

# Tests always run on the CPU backend with 8 virtual devices so multi-chip
# sharding paths can be exercised without TPU hardware. The sandbox pins
# jax_platforms to the axon TPU plugin programmatically, so setting the env
# var alone is not enough — override the config after import too.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
