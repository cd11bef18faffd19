import os
import sys

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
# is exercised without TPU hardware (bench runs on the real chip instead).
# XLA_FLAGS must be set before the CPU backend initializes; the platform
# choice must be applied via jax.config because the environment's TPU plugin
# (axon sitecustomize) force-updates jax_platforms at interpreter start.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
