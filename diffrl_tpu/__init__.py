"""diffrl_tpu — a TPU-native differentiable-simulation RL framework.

From-scratch JAX/XLA re-design of the capabilities of NVlabs/DiffRL (SHAC):
a differentiable articulated rigid-body engine (generalized coordinates,
penalty contacts, MTU muscles) that steps thousands of environments in
lockstep under jit/vmap with analytic gradients through lax.scan rollouts,
plus the SHAC/BPTT/PPO/SAC training algorithms and multi-chip scaling over
jax.sharding meshes.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# The reference engine is float32-end-to-end (adjoint.py:1985-1986 rejects
# f64/f16). TPU matmuls default to bf16 passes, which perturbs the dense
# mass-matrix pipeline (H = J^T M J einsums) enough to destabilize long
# BPTT rollouts — force full f32 MXU passes (SURVEY.md §7 risks). The
# network matmuls this also touches are tiny relative to sim cost.
_jax.config.update("jax_default_matmul_precision", "highest")

# Deep-articulation training steps compile for minutes; cache executables
# across processes (the analog of the reference's dflex/kernels/adjoint.gen
# build cache, adjoint.py:1813-1836). Disable with DIFFRL_COMPILATION_CACHE=0.
#
# CPU runs (tests pin JAX_PLATFORMS=cpu) additionally cap XLA:CPU codegen at
# AVX2 and use a separate cache namespace: this VM migrates between physical
# hosts across sessions, and cached CPU AOT executables specialized to the
# previous host's ISA (AMX/AVX-512 variants) SIGILL/segfault when loaded on
# the next one (observed: crash in compilation_cache.get_executable_and_time
# plus cpu_aot_loader machine-feature-mismatch errors). TPU executables are
# unaffected — the TPU behind the tunnel is stable.
_is_cpu_run = "cpu" in _os.environ.get("JAX_PLATFORMS", "").lower()
if _is_cpu_run:
    _flags = _os.environ.get("XLA_FLAGS", "")
    if "--xla_cpu_max_isa" not in _flags:
        _os.environ["XLA_FLAGS"] = (_flags + " --xla_cpu_max_isa=avx2").strip()
if _os.environ.get("DIFFRL_COMPILATION_CACHE", "1") != "0":
    _default_cache = "~/.cache/diffrl_tpu_xla" + ("_cpuavx2" if _is_cpu_run else "")
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "DIFFRL_COMPILATION_CACHE_DIR",
            _os.path.expanduser(_default_cache),
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from . import ops
