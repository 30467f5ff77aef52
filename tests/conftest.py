import os

# Force a virtual 8-device CPU platform BEFORE jax backends initialize, so
# sharding tests run without TPU hardware. The environment's sitecustomize
# (axon) force-sets jax_platforms at interpreter start, so the env var alone
# is not enough — override the config value too.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
