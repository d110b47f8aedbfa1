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

# Pin the suite's envs to the "remat" reverse pass: the production default
# ("auto" -> the link-batched "lb" engine) is covered head-to-head by
# tests/test_articulation_lb.py (forward + VJP equality on every joint-type
# family, incl. whole windows), while the rest of the matrix stays on the
# cheap-to-compile path the CPU oracle has always used. Without this pin
# every env-building test recompiles the lb window graphs, which multiplies
# suite wall-clock on the 1-core VM.
import diffrl_tpu.config as _dconfig

_dconfig.default_sim_backward = "remat"
