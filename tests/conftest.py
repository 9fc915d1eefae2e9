import os

# Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
# without TPU hardware, like the reference's `mpirun -np N` on one box).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)
