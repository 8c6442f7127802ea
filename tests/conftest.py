"""Test config: run JAX on a virtual 8-device CPU mesh so distributed (DP)
semantics are testable without TPU hardware, and keep compilation fast.

Note: the environment may pre-import jax via sitecustomize with
JAX_PLATFORMS=axon; backends are initialized lazily, so overriding the config
here (before any device use) still lands us on CPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
