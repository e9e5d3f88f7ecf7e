import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. Must be set before jax initialises its backends.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Golden tests compare against fp32 torch oracles; the environment's default
# matmul precision is bf16-class even on CPU, so pin it for tests only.
import jax

jax.config.update("jax_default_matmul_precision", "highest")
