import os

# Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
# without TPU hardware, like the reference's `mpirun -np N` on one box).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# force CPU: correctness tests are f64 and must not ride the TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# the axon sitecustomize re-registers the TPU plugin and resets
# jax_platforms; override after import as well
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
