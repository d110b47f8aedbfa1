"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's plan: JAX-on-CPU is the deterministic oracle (the
same code the TPU runs), and ``xla_force_host_platform_device_count=8``
lets multi-chip sharding tests execute without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon TPU plugin registers itself regardless of JAX_PLATFORMS; the
# config update is what actually pins the test suite to the CPU oracle
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
