import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding is exercised
# without TPU hardware, and so numerics match the torch-cpu oracles exactly.
# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); override it and also
# force via jax.config since the axon site customization re-reads the env.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
