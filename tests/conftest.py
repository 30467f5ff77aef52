import os

# Force a virtual 8-device CPU platform BEFORE jax backends initialize, so
# sharding tests run without TPU hardware. The environment's sitecustomize
# (axon) force-sets jax_platforms at interpreter start, so the env var alone
# is not enough — override the config value too.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The launch environment may export JAX_PLATFORMS=axon (the TPU relay);
# tests always run on the virtual CPU mesh, and __graft_entry__'s
# _honor_platform_env re-asserts the env var over any config update — so
# the env var itself must say cpu.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
