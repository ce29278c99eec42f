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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tests compile many distinct block shapes; skipping XLA's optimization passes cuts
# suite compile time ~4x without changing semantics.
jax.config.update("jax_disable_most_optimizations", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
