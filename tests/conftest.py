"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's plan: JAX-on-CPU is the deterministic oracle (the
same code the TPU runs), and ``xla_force_host_platform_device_count=8``
lets multi-chip sharding tests execute without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Cap CPU codegen at AVX2: this VM migrates between physical hosts, and
# persistent-cache AOT executables specialized to a previous host's ISA
# SIGILL on the next one (see diffrl_tpu/__init__.py).
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=avx2").strip()
os.environ["XLA_FLAGS"] = flags

import jax

# the axon TPU plugin registers itself regardless of JAX_PLATFORMS; the
# config update is what actually pins the test suite to the CPU oracle
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
