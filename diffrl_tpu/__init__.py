"""diffrl_tpu — a TPU-native differentiable-simulation RL framework.

From-scratch JAX/XLA re-design of the capabilities of NVlabs/DiffRL (SHAC):
a differentiable articulated rigid-body engine (generalized coordinates,
penalty contacts, MTU muscles) that steps thousands of environments in
lockstep under jit/vmap with analytic gradients through lax.scan rollouts,
plus the SHAC/BPTT/PPO/SAC training algorithms and multi-chip scaling over
jax.sharding meshes.
"""

__version__ = "0.1.0"

import jax as _jax

# The reference engine is float32-end-to-end (adjoint.py:1985-1986 rejects
# f64/f16). TPU matmuls default to bf16 passes, which perturbs the dense
# mass-matrix pipeline (H = J^T M J einsums) enough to destabilize long
# BPTT rollouts — force full f32 MXU passes (SURVEY.md §7 risks). The
# network matmuls this also touches are tiny relative to sim cost.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import ops
