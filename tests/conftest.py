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

# Disable the persistent compilation cache in the suite PROCESS: two full
# suite runs segfaulted inside XLA:CPU 0.9.0's executable serialize /
# deserialize (put_executable_and_time and get_executable_and_time) ~45+
# minutes into the run, while fresh processes handle the same entries fine
# (tests/_lb_window_check.py docstring). The cache barely helps here
# anyway: suite wall-clock is TRACING-dominated (XLA compiles measure
# ~2-5 s each, cache entries <= 3.4 MB), so skipping the crashy
# serialize/deserialize path costs almost nothing. Subprocess-isolated
# checks (fresh processes) keep the cache enabled.
jax.config.update("jax_enable_compilation_cache", False)

# Pin the suite's envs to the "remat" reverse pass: the production default
# ("auto" -> the link-batched "lb" engine) is covered head-to-head by
# tests/test_articulation_lb.py (forward + VJP equality on every joint-type
# family, incl. whole windows), while the rest of the matrix stays on the
# cheap-to-compile path the CPU oracle has always used. Without this pin
# every env-building test recompiles the lb window graphs, which multiplies
# suite wall-clock on the 1-core VM.
import diffrl_tpu.config as _dconfig

_dconfig.default_sim_backward = "remat"
